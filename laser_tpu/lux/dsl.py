"""Lux: a tiny tensor-expression layer that lowers onto the kernel builders.

Rebuild of the reference's experimental Lux DSL compiler
(laser/lux_compiler/ — 2.3 kLoC of compile-time Nim: symbolic execution of
the generator proc into an Fn graph, loop-nest inference, SIMD codegen).
SURVEY §2 C25 scopes the TPU version deliberately smaller: JAX is already
the tracing compiler, so Lux here is the *fusion planner* — capture the
expression tree (the "algorithm", lux_frontend.nim:23-97 analog), then pick
kernel templates and fusion boundaries (the "schedule"):

  * maximal elementwise subtree           -> ONE for_each Pallas kernel
    (the forEach fusion the reference's codegen emits, lux_codegen.nim)
  * full reduction over an elementwise    -> ONE map_reduce kernel (map
    subtree                                  fused into the reduction)
  * matmul                                -> the flagship Pallas GEMM; the
    act(A@B + bias) / act(A@B) patterns      epilogue fuses into the GEMM
                                             (the reference's roadmap item)

Usage:
    @lux.generate
    def foobar(a, b, c):
        return a + b - lux_sin(c)
    out = foobar(x, y, z)        # one fused kernel
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

_BINOPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "pow": lambda a, b: a ** b,
    "max": jnp.maximum,
    "min": jnp.minimum,
}

_UNOPS = {
    "neg": lambda a: -a,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "abs": jnp.abs,
    "relu": lambda a: jnp.maximum(a, 0),
    "tanh": None,     # routed to the laser kernels below
    "sigmoid": None,
    "exp": None,
    "log": None,
}

# unops that exist as fused GEMM epilogues
_EPILOGUE_ACTS = {"relu", "tanh", "sigmoid", "gelu"}


@dataclasses.dataclass(frozen=True)
class LuxNode:
    """Expression node (core/lux_types.nim LuxNode analog)."""

    kind: str  # input | const | binop | unop | matmul | reduce
    op: Optional[str] = None
    args: Tuple["LuxNode", ...] = ()
    value: Any = None  # input index or const value
    axis: Optional[int] = None  # for reduce

    # -- operator sugar (dsl/primitives.nim:75-127 analog) -------------------

    def _bin(self, op, other, rev=False):
        o = other if isinstance(other, LuxNode) else LuxNode("const", value=other)
        return (LuxNode("binop", op, (o, self)) if rev
                else LuxNode("binop", op, (self, o)))

    def __add__(self, o):
        return self._bin("add", o)

    def __radd__(self, o):
        return self._bin("add", o, rev=True)

    def __sub__(self, o):
        return self._bin("sub", o)

    def __rsub__(self, o):
        return self._bin("sub", o, rev=True)

    def __mul__(self, o):
        return self._bin("mul", o)

    def __rmul__(self, o):
        return self._bin("mul", o, rev=True)

    def __truediv__(self, o):
        return self._bin("div", o)

    def __rtruediv__(self, o):
        return self._bin("div", o, rev=True)

    def __pow__(self, o):
        return self._bin("pow", o)

    def __neg__(self):
        return LuxNode("unop", "neg", (self,))

    def __matmul__(self, o):
        if not isinstance(o, LuxNode):
            raise TypeError("matmul operand must be a LuxNode")
        return LuxNode("matmul", None, (self, o))

    # -- analysis -------------------------------------------------------------

    def is_elementwise_tree(self) -> bool:
        if self.kind in ("input", "const"):
            return True
        if self.kind in ("matmul", "reduce"):
            return False
        return all(a.is_elementwise_tree() for a in self.args)

    def leaves(self, acc: Optional[List[int]] = None) -> List[int]:
        """Distinct input indices in first-use order."""
        acc = [] if acc is None else acc
        if self.kind == "input":
            if self.value not in acc:
                acc.append(self.value)
        for a in self.args:
            a.leaves(acc)
        return acc


def _unop(name):
    def f(x):
        if not isinstance(x, LuxNode):
            raise TypeError(f"lux_{name} takes a LuxNode")
        return LuxNode("unop", name, (x,))
    f.__name__ = f"lux_{name}"
    return f


lux_sin = _unop("sin")
lux_exp = _unop("exp")
lux_log = _unop("log")
lux_tanh = _unop("tanh")
lux_sigmoid = _unop("sigmoid")
lux_abs = _unop("abs")


def lux_sum(x: LuxNode, axis: Optional[int] = None) -> LuxNode:
    """Reduction, fused with its elementwise operand. ``axis=None`` reduces
    to a scalar (map_reduce kernel); ``axis=-1`` reduces rows in ONE fused
    row_reduce kernel (pass_build_loops' per-axis iteration domains,
    pass_build_loops.nim:28-186 analog)."""
    return LuxNode("reduce", "sum", (x,), axis=axis)


def lux_max(x: LuxNode, axis: Optional[int] = None) -> LuxNode:
    return LuxNode("reduce", "max", (x,), axis=axis)


# ---------------------------------------------------------------------------
# Schedule hints (the reference's ScheduleKind, lux_types.nim:100-154 —
# declared there as ScParallel/ScVectorize/ScUnroll/... but never
# implemented by its compiler passes; here each hint maps to a MEASURED
# TPU mechanism)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Per-expression schedule hints for the lowering.

    TPU re-interpretation of the reference's schedule enum: "vectorize" is
    implicit (everything runs on the VPU/MXU), so the levers that actually
    move measured performance here are:

      donate            alias the first operand's buffer as the output —
                        the in-place HBM stream runs ~2x the out-of-place
                        rate (PERF_NOTES "HBM streaming"); the ScStoreLoc
                        analog. The caller must not reuse the donated input.
      grain             min elements per elementwise grid step (the OpenMP
                        grain-size / ScParallel granularity analog)
      reduction_grain   same for reduction partial blocks
      gemm_tiles        (bm, bn, bk) VMEM block shape for matmul nodes —
                        the partitionMNK override
      gemm_backend      "pallas" | "xla" matmul dispatch override
      precision         f32 in-kernel dot precision: "default" (1-pass
                        bf16) | "high" (3-pass) | "highest" (6-pass)
      algorithm         vector-math tier for exp/log/tanh/sigmoid nodes:
                        "fast" (hw approx) | "accurate" (<=1e-6)
    """

    donate: bool = False
    grain: Optional[int] = None
    reduction_grain: Optional[int] = None
    gemm_tiles: Optional[Tuple[int, int, int]] = None
    gemm_backend: Optional[str] = None
    precision: Optional[str] = None
    algorithm: Optional[str] = None

    def _config_overrides(self) -> Dict[str, Any]:
        o: Dict[str, Any] = {}
        if self.grain is not None:
            o["elementwise_grain"] = self.grain
        if self.reduction_grain is not None:
            o["reduction_grain"] = self.reduction_grain
        if self.precision is not None:
            o["matmul_precision"] = self.precision
        if self.algorithm is not None:
            o["vector_math_algorithm"] = self.algorithm
        return o

    def _gemm_kwargs(self) -> Dict[str, Any]:
        kw: Dict[str, Any] = {}
        if self.gemm_tiles is not None:
            from ..ops.gemm.tiling import GemmTiles

            bm, bn, bk = self.gemm_tiles
            kw["tiles"] = GemmTiles(bm, bn, bk, 128 * 1024 * 1024)
        if self.gemm_backend is not None:
            kw["backend"] = self.gemm_backend
        return kw


_DEFAULT_SCHEDULE = Schedule()


# ---------------------------------------------------------------------------
# Lowering (the pass_build_loops + codegen analog, pass_build_loops.nim:28-186)
# ---------------------------------------------------------------------------


def _eval_elementwise(node: LuxNode, env: Dict[int, Any]):
    """Build the fused jnp expression over block values in ``env``."""
    if node.kind == "input":
        return env[node.value]
    if node.kind == "const":
        return node.value
    if node.kind == "binop":
        a = _eval_elementwise(node.args[0], env)
        b = _eval_elementwise(node.args[1], env)
        return _BINOPS[node.op](a, b)
    if node.kind == "unop":
        v = _eval_elementwise(node.args[0], env)
        if node.op in ("tanh", "sigmoid", "exp", "log"):
            from ..ops import vector_math as vm

            # honors Schedule(algorithm=...)/config: the accurate
            # polynomial core or the hardware approximation, in-kernel
            return vm._pick(node.op, None)(v)
        return _UNOPS[node.op](v)
    raise AssertionError(f"not elementwise: {node.kind}")


def _match_gemm_epilogue(node: LuxNode):
    """Recognize act(A@B [+ bias]) / A@B [+ bias] for the fused GEMM path.

    Returns (lhs, rhs, bias_node_or_None, act_or_None) or None.
    """
    act = None
    n = node
    if n.kind == "unop" and n.op in _EPILOGUE_ACTS:
        act = n.op
        n = n.args[0]
    bias = None
    if n.kind == "binop" and n.op == "add":
        a, b = n.args
        if a.kind == "matmul":
            n, bias = a, b
        elif b.kind == "matmul":
            n, bias = b, a
    if n.kind != "matmul":
        return None
    lhs, rhs = n.args
    return lhs, rhs, bias, act


def _broadcast_operands(ops):
    """Broadcast mixed-shape operands to a common shape (numpy rules) so the
    fused kernel sees same-shaped blocks. Rank-1-vs-2D bias broadcasts pay
    one materialization; same-shaped operands pass through untouched."""
    shapes = {tuple(o.shape) for o in ops}
    if len(shapes) == 1:
        return ops
    target = jnp.broadcast_shapes(*[o.shape for o in ops])
    return [o if tuple(o.shape) == tuple(target)
            else jnp.broadcast_to(o, target) for o in ops]


def _lower(node: LuxNode, sch: Schedule = _DEFAULT_SCHEDULE) -> Callable:
    """Return run(arrays: dict idx->array) -> jax array."""
    from ..ops.foreach import for_each, map_reduce
    from ..ops.gemm import gemm

    if node.is_elementwise_tree():
        idxs = node.leaves()

        def run(arrays):
            ops = _broadcast_operands([jnp.asarray(arrays[i]) for i in idxs])
            fn = lambda *blocks: _eval_elementwise(
                node, dict(zip(idxs, blocks)))
            return for_each(fn, *ops, donate=sch.donate)

        return run

    if node.kind == "reduce":
        operand = node.args[0]
        red = {"sum": jnp.sum, "max": jnp.max}[node.op]
        ident = {"sum": 0.0, "max": -jnp.inf}[node.op]
        if not operand.is_elementwise_tree():
            inner = _lower(operand, sch)

            def run(arrays):
                v = inner(arrays)
                return red(v, axis=node.axis) if node.axis is not None \
                    else red(v)

            return run
        idxs = operand.leaves()

        def run(arrays):
            ops = [jnp.asarray(arrays[i]) for i in idxs]
            ops = _broadcast_operands(ops)
            fn = lambda *blocks: _eval_elementwise(
                operand, dict(zip(idxs, blocks)))
            if node.axis is None:
                return map_reduce(fn, *ops, reduce_fn=red, identity=ident)
            ax = node.axis if node.axis >= 0 else ops[0].ndim + node.axis
            if ax == ops[0].ndim - 1 and ops[0].ndim == 2:
                from ..ops.foreach import row_reduce

                out = row_reduce(fn, *ops, reduce_fn=red, identity=ident)
                if out is not None:
                    return out
            # other axes / VMEM-overflow rows: fused elementwise kernel
            # then an XLA reduction
            from ..ops.foreach import for_each

            return red(for_each(fn, *ops), axis=node.axis)

        return run

    m = _match_gemm_epilogue(node)
    if m is not None:
        lhs, rhs, bias, act = m
        run_l, run_r = _lower(lhs, sch), _lower(rhs, sch)
        run_bias = _lower(bias, sch) if bias is not None else None
        gemm_kw = sch._gemm_kwargs()

        def run(arrays):
            a = run_l(arrays)
            b = run_r(arrays)
            bb = run_bias(arrays) if run_bias is not None else None
            if bb is not None and bb.ndim != 1:
                # General C = act(A@B + X): the addend cannot ride the GEMM
                # bias slot, so run a plain GEMM and fuse add+activation into
                # one elementwise kernel — the activation must see A@B + X,
                # not be applied before the add.
                from ..ops.foreach import for_each as fe

                r = gemm(a, b, **gemm_kw)
                if act is None:
                    return fe(lambda u, v: u + v, r, bb)
                from ..ops import vector_math as vm

                actf = {"relu": lambda x: jnp.maximum(x, 0.0),
                        "tanh": vm._tanh_expr,
                        "sigmoid": vm._sigmoid_expr,
                        "gelu": jax.nn.gelu}[act]
                return fe(lambda u, v: actf(u + v), r, bb)
            return gemm(a, b, bias=bb, epilogue=act, **gemm_kw)

        return run

    # generic fallback: lower children, apply op via jnp (keeps any tree legal)
    runs = [_lower(a, sch) for a in node.args]
    if node.kind == "binop":
        def run(arrays):
            return _BINOPS[node.op](runs[0](arrays), runs[1](arrays))
        return run
    if node.kind == "unop":
        def run(arrays):
            v = runs[0](arrays)
            if node.op in ("tanh", "sigmoid", "exp", "log"):
                from .. import ops
                from ..ops import vector_math as vm

                return {"tanh": vm.tanh, "sigmoid": vm.sigmoid,
                        "exp": vm.exp, "log": vm.log}[node.op](v)
            return _UNOPS[node.op](v)
        return run
    raise NotImplementedError(f"cannot lower node kind {node.kind}")


def generate(f: Optional[Callable] = None, *,
             schedule: Optional[Schedule] = None) -> Callable:
    """Symbolically execute ``f`` over LuxNode placeholders and return a
    compiled callable (frontend/lux_frontend.nim:23-97 'generate' analog).

    ``schedule``: optional :class:`Schedule` hints applied during lowering
    (donation, grain sizes, GEMM tiles/backend, f32 precision, vector-math
    tier) — usable bare (``@lux.generate``) or parameterized
    (``@lux.generate(schedule=lux.Schedule(donate=True))``).
    """
    if f is None:
        return functools.partial(generate, schedule=schedule)
    import inspect

    sch = schedule if schedule is not None else _DEFAULT_SCHEDULE
    overrides = sch._config_overrides()

    def _with_overrides(run):
        if not overrides:
            return run
        from ..config import config_override

        def wrapped(arrays):
            with config_override(**overrides):
                return run(arrays)

        return wrapped

    nparams = len(inspect.signature(f).parameters)
    graph = f(*[LuxNode("input", value=i) for i in range(nparams)])

    if isinstance(graph, tuple):
        # Multi-output: when every output is an elementwise tree, fuse them
        # all into ONE kernel pass over the shared operands (the reference's
        # forEach writes several tensors in one loop body).
        if not all(isinstance(g, LuxNode) for g in graph):
            raise TypeError("lux function must return LuxNode expression(s)")
        if all(g.is_elementwise_tree() for g in graph):
            all_idxs: List[int] = []
            for g in graph:
                g.leaves(all_idxs)

            def run_multi(arrays):
                from ..ops.foreach import for_each_multi

                ops = _broadcast_operands(
                    [jnp.asarray(arrays[i]) for i in all_idxs])
                env_of = dict(zip(all_idxs, range(len(all_idxs))))

                def fn(*blocks):
                    env = {i: blocks[env_of[i]] for i in all_idxs}
                    return tuple(_eval_elementwise(g, env) for g in graph)

                return for_each_multi(fn, *ops)
        else:
            runs = [_lower(g, sch) for g in graph]

            def run_multi(arrays):
                return tuple(r(arrays) for r in runs)

        run_multi = _with_overrides(run_multi)

        @functools.wraps(f)
        def compiled_multi(*arrays):
            if len(arrays) != nparams:
                raise TypeError(f"{f.__name__} expects {nparams} arrays")
            return run_multi(dict(enumerate(arrays)))

        compiled_multi.lux_graph = graph
        compiled_multi.lux_schedule = sch
        return compiled_multi

    if not isinstance(graph, LuxNode):
        raise TypeError("lux function must return a LuxNode expression")
    run = _with_overrides(_lower(graph, sch))

    @functools.wraps(f)
    def compiled(*arrays):
        if len(arrays) != nparams:
            raise TypeError(f"{f.__name__} expects {nparams} arrays")
        return run(dict(enumerate(arrays)))

    compiled.lux_graph = graph
    compiled.lux_schedule = sch
    return compiled
