"""Train a small CNN end to end on the native kernels.

Every compute step here runs laser-tpu code: conv2d_trainable (native
forward, native stride-1 backward), the fused linear VJPs, softmax from
ops/vector_math, and the fused AdamW update. The task is a synthetic
"which quadrant holds the bright blob" classification — enough to watch
the loss fall without a dataset download.

Run:  python examples/ex14_cnn_training.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import laser_tpu as lt
from laser_tpu.ops.gemm.autodiff import linear
from laser_tpu.ops.optim import adamw_init, adamw_step


def make_batch(rng, n):
    x = rng.randn(n, 1, 16, 16).astype(np.float32) * 0.1
    y = rng.randint(0, 4, n)
    for i, q in enumerate(y):
        r, c = divmod(int(q), 2)
        x[i, 0, 8 * r + 2: 8 * r + 6, 8 * c + 2: 8 * c + 6] += 1.0
    return jnp.asarray(x), jnp.asarray(y)


def init_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "c1": jax.random.normal(k1, (8, 1, 3, 3), jnp.float32) * 0.3,
        "c2": jax.random.normal(k2, (16, 8, 3, 3), jnp.float32) * 0.1,
        "fc": jax.random.normal(k3, (16 * 16 * 16, 4), jnp.float32) * 0.02,
    }


def forward(params, x):
    h = jax.nn.relu(lt.conv2d_trainable(x, params["c1"], (1, 1), (1, 1)))
    h = jax.nn.relu(lt.conv2d_trainable(h, params["c2"], (1, 1), (1, 1)))
    h = h.reshape(h.shape[0], -1)
    return linear(h, params["fc"], None)


def loss_fn(params, x, y):
    logits = forward(params, x)
    # log-softmax stays jnp: the fused softmax kernel is an inference op
    # (in-place aliasing has no JVP); conv/linear above are the laser VJPs
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))


@jax.jit
def train_step(params, m, v, step, x, y):
    loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
    params, m, v = adamw_step(params, grads, m, v, step, lr=3e-3)
    return params, m, v, loss


def main():
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0))
    m, v = adamw_init(params)
    for step in range(30):
        x, y = make_batch(rng, 32)
        params, m, v, loss = train_step(params, m, v, step + 1, x, y)
        if step % 5 == 0 or step == 29:
            print(f"step {step:3d}: loss {float(loss):.4f}")
    x, y = make_batch(rng, 256)
    acc = float(jnp.mean(jnp.argmax(forward(params, x), -1) == y))
    print(f"accuracy on fresh batch: {acc:.2%}")
    assert acc > 0.9, "CNN failed to learn the quadrant task"


if __name__ == "__main__":
    main()
