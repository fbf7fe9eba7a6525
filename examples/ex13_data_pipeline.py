"""Input pipeline: deterministic shuffling, weighted sampling, device
prefetch — feeding a training step built on the laser kernels.

Run:  python examples/ex13_data_pipeline.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import laser_tpu as lt
from laser_tpu.data import ArrayDataset, DataLoader
from laser_tpu.models.mlp import init_mlp, loss_fn


def main():
    rng = np.random.RandomState(0)
    # toy classification set
    X = rng.randn(4096, 64).astype(np.float32)
    Y = (X[:, 0] > 0).astype(np.int32)
    ds = ArrayDataset(X, Y)

    params = init_mlp(jax.random.PRNGKey(0), [64, 128, 2])
    m, v = lt.adamw_init(params)

    @jax.jit
    def step(params, m, v, n, x, y):
        loss, g = jax.value_and_grad(loss_fn)(params, x, y)
        params, m, v = lt.adamw_step(params, g, m, v, n, lr=1e-3)
        return params, m, v, loss

    # prefetch=2: batch k+1 uploads while batch k trains
    loader = DataLoader(ds, batch_size=256, seed=0, prefetch=2)
    n = 0
    for epoch in range(3):
        losses = []
        for x, y in loader.epoch_iter(epoch):
            n += 1
            params, m, v, loss = step(params, m, v, jnp.int32(n), x, y)
            losses.append(float(loss))
        print(f"epoch {epoch}: mean loss {np.mean(losses):.4f}")

    # weighted sampling through the native C++ F+tree (rare-class boost)
    w = np.where(Y == 1, 4.0, 1.0).astype(np.float32)
    wl = DataLoader(ds, 256, weights=w, seed=1, prefetch=2)
    x, y = next(iter(wl.epoch_iter(0)))
    print(f"weighted batch positive fraction: {float(jnp.mean(y * 1.0)):.2f} "
          f"(dataset base rate ~0.5, boosted toward 0.8)")


if __name__ == "__main__":
    main()
