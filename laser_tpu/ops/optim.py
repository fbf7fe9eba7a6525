"""Fused optimizer update kernels: AdamW and SGD-momentum.

A production-training component the reference never needed (it is a
primitives library), but every consumer of a kernel framework does: the
optimizer update is the most bandwidth-bound step of training (AdamW reads
p, g, m, v and writes p, m, v — 7 array streams that XLA's default
per-leaf lowering leaves unfused and out-of-place).

Design:
  * Default backend is the fused XLA expression: measured 653 GB/s over the
    7 update streams on v5e — XLA's multi-array elementwise fusion is the
    fastest path (the same honest dispatch verdict as gemm()'s plain-matmul
    case; our Pallas kernel reaches 575 GB/s = 0.88x).
  * backend="pallas": ONE Pallas kernel per leaf — moment decay, bias
    correction, epsilon, weight decay in VMEM, p/m/v donated
    (input_output_aliases), native-2D layouts (no relayout reshapes), and
    hyperparameters in SMEM so LR schedules never retrace. Kept as the
    fusion substrate for custom update rules XLA cannot fuse (quantized
    optimizer states, stochastic rounding) and as the benchable component.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..registry import build_cache
from ..utils import cdiv, round_step_up
from .foreach import ROW_ALIGN, _flat_width, _native_2d


@build_cache
def _build_adamw(rows: int, width: int, br: int, dtype: str, wd: bool,
                 interpret: bool):
    dt = jnp.dtype(dtype)

    def kernel(lr_ref, b1_ref, b2_ref, omb1_ref, omb2_ref, eps_ref, wd_ref,
               bc1_ref, bc2_ref, p_ref, g_ref, m_ref, v_ref, po_ref, mo_ref,
               vo_ref):
        lr, b1, b2 = lr_ref[0], b1_ref[0], b2_ref[0]
        omb1, omb2 = omb1_ref[0], omb2_ref[0]  # 1-b at f64 precision
        eps, wdc = eps_ref[0], wd_ref[0]
        bc1, bc2 = bc1_ref[0], bc2_ref[0]
        g = g_ref[:].astype(jnp.float32)
        m = m_ref[:].astype(jnp.float32) * b1 + omb1 * g
        v = v_ref[:].astype(jnp.float32) * b2 + omb2 * (g * g)
        mhat = m * bc1
        vhat = v * bc2
        p = p_ref[:].astype(jnp.float32)
        upd = mhat / (jnp.sqrt(vhat) + eps)
        if wd:
            upd = upd + wdc * p
        po_ref[:] = (p - lr * upd).astype(dt)
        mo_ref[:] = m.astype(dt)
        vo_ref[:] = v.astype(dt)

    scal = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 9
    blk = pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(cdiv(rows, br),),
        in_specs=scal + [blk] * 4,
        out_specs=[blk] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows, width), dt)] * 3,
        # donate p (arg 9), m (arg 11), v (arg 12) into the three outputs
        input_output_aliases={9: 0, 11: 1, 12: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )


@build_cache
def _build_sgdm(rows: int, width: int, br: int, dtype: str, nesterov: bool,
                interpret: bool):
    dt = jnp.dtype(dtype)

    def kernel(lr_ref, mu_ref, p_ref, g_ref, m_ref, po_ref, mo_ref):
        lr, mu = lr_ref[0], mu_ref[0]
        g = g_ref[:].astype(jnp.float32)
        m = m_ref[:].astype(jnp.float32) * mu + g
        upd = g + mu * m if nesterov else m
        po_ref[:] = (p_ref[:].astype(jnp.float32) - lr * upd).astype(dt)
        mo_ref[:] = m.astype(dt)

    scal = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    blk = pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(cdiv(rows, br),),
        in_specs=scal + [blk] * 3,
        out_specs=[blk] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, width), dt)] * 2,
        input_output_aliases={2: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )


def _mat_plan(shape, size):
    """(rows, width, native) matrix layout for a leaf: keep the native 2-D
    view when the minor dims allow it (a reshape that changes the
    second-minor dim is a full HBM relayout — docs/PERF_NOTES.md), else
    flatten+pad (padded lanes carry zero grads and stay zero)."""
    nat = _native_2d(shape, size)
    if nat is not None:
        return nat[0], nat[1], True
    width = _flat_width(size)
    rows = round_step_up(max(cdiv(size, width), 1), ROW_ALIGN)
    return rows, width, False


def _as_mat(x, rows, width, native):
    if native:
        return x.reshape(rows, width)
    flat = x.reshape(-1)
    if rows * width != flat.size:
        flat = jnp.pad(flat, (0, rows * width - flat.size))
    return flat.reshape(rows, width)


def _restore(mat, shape, size):
    if mat.size == size:
        return mat.reshape(shape)
    return mat.reshape(-1)[:size].reshape(shape)


def adamw_step(params, grads, m, v, step, *, lr, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               weight_decay: float = 0.0, backend: Optional[str] = None,
               interpret: Optional[bool] = None):
    """One fused AdamW update over a parameter pytree.

    Returns (new_params, new_m, new_v). ``step`` is the 1-based step count
    (traced ok); ``lr`` may be a traced scalar (schedules don't retrace).
    With backend="pallas", p/m/v buffers are donated per leaf — do not
    reuse them afterwards.
    """
    if backend in (None, "xla"):
        step_f = jnp.asarray(step, jnp.float32)
        bc1 = 1.0 / (1.0 - jnp.asarray(b1, jnp.float32) ** step_f)
        bc2 = 1.0 / (1.0 - jnp.asarray(b2, jnp.float32) ** step_f)

        def upd(p, g, mm, vv):
            g32 = g.astype(jnp.float32)
            m2 = b1 * mm.astype(jnp.float32) + (1.0 - b1) * g32
            v2 = b2 * vv.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
            u = (m2 * bc1) / (jnp.sqrt(v2 * bc2) + eps)
            if weight_decay:
                u = u + weight_decay * p.astype(jnp.float32)
            return ((p.astype(jnp.float32) - lr * u).astype(p.dtype),
                    m2.astype(mm.dtype), v2.astype(vv.dtype))

        trip = jax.tree_util.tree_map(upd, params, grads, m, v)
        leaves, tdef = jax.tree_util.tree_flatten(trip,
                                                  is_leaf=lambda x:
                                                  isinstance(x, tuple))
        return (tdef.unflatten([l[0] for l in leaves]),
                tdef.unflatten([l[1] for l in leaves]),
                tdef.unflatten([l[2] for l in leaves]))

    interp = should_interpret() if interpret is None else interpret
    step_f = jnp.asarray(step, jnp.float32)
    bc1 = 1.0 / (1.0 - jnp.asarray(b1, jnp.float32) ** step_f)
    bc2 = 1.0 / (1.0 - jnp.asarray(b2, jnp.float32) ** step_f)
    scalars = [jnp.asarray(x, jnp.float32).reshape(1)
               for x in (lr, b1, b2, float(1.0 - b1), float(1.0 - b2),
                         eps, weight_decay, bc1, bc2)]
    wd = not (isinstance(weight_decay, float) and weight_decay == 0.0)

    leaves_p, tdef = jax.tree_util.tree_flatten(params)
    leaves_g = tdef.flatten_up_to(grads)
    leaves_m = tdef.flatten_up_to(m)
    leaves_v = tdef.flatten_up_to(v)
    new_p, new_m, new_v = [], [], []
    for p, g, mm, vv in zip(leaves_p, leaves_g, leaves_m, leaves_v):
        shape, size = p.shape, p.size
        rows, width, native = _mat_plan(shape, size)
        pm = _as_mat(p, rows, width, native)
        gm = _as_mat(g.astype(p.dtype), rows, width, native)
        mm2 = _as_mat(mm, rows, width, native)
        vv2 = _as_mat(vv, rows, width, native)
        br = max(ROW_ALIGN, min(rows, (2 * 1024 * 1024 // 4) // width))
        br = (br // ROW_ALIGN) * ROW_ALIGN
        fn = _build_adamw(rows, width, br, jnp.dtype(p.dtype).name, wd,
                          interp)
        po, mo, vo = fn(*scalars, pm, gm, mm2, vv2)
        new_p.append(_restore(po, shape, size))
        new_m.append(_restore(mo, shape, size))
        new_v.append(_restore(vo, shape, size))
    return (tdef.unflatten(new_p), tdef.unflatten(new_m),
            tdef.unflatten(new_v))


def adamw_init(params):
    """Zero first/second-moment trees matching ``params``."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return zeros, jax.tree_util.tree_map(jnp.zeros_like, params)


def global_norm(tree) -> jax.Array:
    """L2 norm over every leaf of a pytree, accumulated in f32."""
    sq = [jnp.sum(jnp.square(l.astype(jnp.float32)))
          for l in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(sq)))


def clip_by_global_norm(grads, max_norm: float):
    """Scale ``grads`` so their global L2 norm is at most ``max_norm``.

    Returns (clipped_grads, pre_clip_norm). Identity when the norm is
    already within bound (scale == 1 exactly, no drift on the common
    path). Leaf dtypes are preserved; the norm and scale are f32.
    """
    norm = global_norm(grads)
    scale = jnp.asarray(max_norm, jnp.float32) / jnp.maximum(norm, max_norm)
    return jax.tree_util.tree_map(
        lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads), norm


def warmup_cosine_lr(step, *, peak_lr: float, warmup_steps: int,
                     total_steps: int, end_lr: float = 0.0) -> jax.Array:
    """Linear warmup to ``peak_lr`` over ``warmup_steps``, then cosine decay
    to ``end_lr`` at ``total_steps``. Pure jittable function of the (1-based,
    traced ok) step — feed it to ``adamw_step(lr=...)``; hyperparameters ride
    in SMEM so schedules never retrace."""
    s = jnp.asarray(step, jnp.float32)
    w = float(max(warmup_steps, 1))
    warm = peak_lr * s / w
    t = jnp.clip((s - w) / float(max(total_steps - w, 1.0)), 0.0, 1.0)
    decay = end_lr + 0.5 * (peak_lr - end_lr) * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.where(s < w, warm, decay)


def inverse_sqrt_lr(step, *, peak_lr: float, warmup_steps: int) -> jax.Array:
    """The classic transformer schedule: linear warmup to ``peak_lr`` then
    1/sqrt(step) decay (continuous at the warmup boundary)."""
    s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
    w = float(max(warmup_steps, 1))
    return peak_lr * jnp.minimum(s / w, jnp.sqrt(w) / jnp.sqrt(s))


def accumulated_value_and_grad(loss_fn, accum: int):
    """``jax.value_and_grad`` with microbatch gradient accumulation.

    Returns ``vg(params, *batch)`` where every array in ``batch`` has a
    leading batch dim divisible by ``accum``. The batch is split into
    ``accum`` microbatches scanned sequentially; only ONE microbatch's
    activations are ever live (the memory point of accumulation), while
    gradients accumulate in f32. For a mean-reduced ``loss_fn`` and equal
    microbatch sizes this is arithmetically the full-batch
    value_and_grad, up to f32 summation order.
    """
    if accum <= 1:
        return jax.value_and_grad(loss_fn)

    def vg(params, *batch):
        def split(a):
            if a.shape[0] % accum:
                raise ValueError(
                    f"batch dim {a.shape[0]} not divisible by accum={accum}")
            return a.reshape((accum, a.shape[0] // accum) + a.shape[1:])

        micro = jax.tree_util.tree_map(split, batch)
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)

        def body(carry, xs):
            acc_l, acc_g = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, *xs)
            acc_g = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), acc_g, grads)
            return (acc_l + loss, acc_g), None

        (loss, gsum), _ = jax.lax.scan(body, (jnp.float32(0.0), zeros), micro)
        inv = 1.0 / accum
        grads = jax.tree_util.tree_map(
            lambda g, p: (g * inv).astype(p.dtype), gsum, params)
        return loss * inv, grads

    return vg


def sgd_momentum_step(params, grads, momentum, *, lr, mu: float = 0.9,
                      nesterov: bool = False, backend: Optional[str] = None,
                      interpret: Optional[bool] = None):
    """One fused SGD-with-momentum update. Returns (new_params, new_momentum)."""
    if backend in (None, "xla"):
        def upd(p, g, mm):
            g32 = g.astype(jnp.float32)
            m2 = mu * mm.astype(jnp.float32) + g32
            u = g32 + mu * m2 if nesterov else m2
            return ((p.astype(jnp.float32) - lr * u).astype(p.dtype),
                    m2.astype(mm.dtype))

        pair = jax.tree_util.tree_map(upd, params, grads, momentum)
        leaves, tdef = jax.tree_util.tree_flatten(pair,
                                                  is_leaf=lambda x:
                                                  isinstance(x, tuple))
        return (tdef.unflatten([l[0] for l in leaves]),
                tdef.unflatten([l[1] for l in leaves]))

    interp = should_interpret() if interpret is None else interpret
    scalars = [jnp.asarray(x, jnp.float32).reshape(1) for x in (lr, mu)]
    leaves_p, tdef = jax.tree_util.tree_flatten(params)
    leaves_g = tdef.flatten_up_to(grads)
    leaves_m = tdef.flatten_up_to(momentum)
    new_p, new_m = [], []
    for p, g, mm in zip(leaves_p, leaves_g, leaves_m):
        shape, size = p.shape, p.size
        rows, width, native = _mat_plan(shape, size)
        pm = _as_mat(p, rows, width, native)
        gm = _as_mat(g.astype(p.dtype), rows, width, native)
        mm2 = _as_mat(mm, rows, width, native)
        br = max(ROW_ALIGN, min(rows, (2 * 1024 * 1024 // 4) // width))
        br = (br // ROW_ALIGN) * ROW_ALIGN
        fn = _build_sgdm(rows, width, br, jnp.dtype(p.dtype).name,
                         nesterov, interp)
        po, mo = fn(*scalars, pm, gm, mm2)
        new_p.append(_restore(po, shape, size))
        new_m.append(_restore(mo, shape, size))
    return tdef.unflatten(new_p), tdef.unflatten(new_m)
