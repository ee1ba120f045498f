"""Fused Adam: one pass over (p, m, v, g) per step instead of optax's chain.

Motivation (round-5 train roofline, BENCH_NOTES): at the b131072
headline config the Adam-vs-SGD delta is ~8 ms/step — ~50x the
moment-traffic floor (~0.16 ms for 7 arrays x 18 MB at HBM speed) —
because XLA executes the optax chain (update_moment, per-elem-norm
moment, two bias corrections, the update quotient, lr scale,
apply_updates add) as separate passes over the full dense tables.
This module computes the whole update in ONE pass per leaf, two ways:

- ``jnp`` backend: a single fused arithmetic expression per leaf.
  XLA fuses it into one elementwise kernel because nothing forces
  intermediate materialization.
- ``pallas`` backend: the same expression as an explicit Pallas TPU
  kernel with input/output aliasing, guaranteeing exactly one
  read+write of p/m/v and one read of g per step regardless of what
  the fusion heuristics decide.

Semantics match ``optax.adam`` (torch.optim.Adam defaults, reference
code/utils.py:51): b1=0.9, b2=0.999, eps=1e-8, bias-corrected, moments
stored in the leaf dtype. Equivalence is tested against optax in
tests/test_fused_adam.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedAdamState:
    count: jax.Array  # int32 scalar, steps taken
    mu: Any  # first-moment tree, leaf dtypes match params
    nu: Any  # second-moment tree


def _adam_math(p, m, v, g, lr, c1, c2, b1, b2, eps):
    """The bias-corrected Adam update as one fp32 expression.

    c1 = 1/(1-b1^t), c2 = 1/(1-b2^t) precomputed per step."""
    g32 = g.astype(jnp.float32)
    m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
    v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
    upd = (m32 * c1) / (jnp.sqrt(v32 * c2) + eps)
    return (
        (p.astype(jnp.float32) - lr * upd).astype(p.dtype),
        m32.astype(m.dtype),
        v32.astype(v.dtype),
    )


# --------------------------------------------------------------- pallas kernel
def _fused_adam_kernel(s_ref, p_ref, m_ref, v_ref, g_ref, po_ref, mo_ref, vo_ref,
                       *, b1, b2, eps):
    lr, c1, c2 = s_ref[0], s_ref[1], s_ref[2]
    po, mo, vo = _adam_math(
        p_ref[:], m_ref[:], v_ref[:], g_ref[:], lr, c1, c2, b1, b2, eps
    )
    po_ref[:] = po
    mo_ref[:] = mo
    vo_ref[:] = vo


@functools.partial(
    jax.jit, static_argnames=("b1", "b2", "eps", "block_rows", "interpret")
)
def _fused_adam_leaf_pallas(
    p: jax.Array,
    m: jax.Array,
    v: jax.Array,
    g: jax.Array,
    scalars: jax.Array,  # (3,) float32: lr, c1, c2
    b1: float,
    b2: float,
    eps: float,
    block_rows: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-pass Adam on a single leaf; any shape (flattened to 2D lanes).

    The leaf is viewed as (rows, 128) lanes (padded), gridded over row
    blocks; scalars ride SMEM. p/m/v alias their outputs so the tables
    update in place."""
    shape, dtype = p.shape, p.dtype
    n = p.size
    lanes = 128
    rows = -(-n // lanes)
    rows_pad = -(-rows // block_rows) * block_rows

    def as2d(x):
        flat = jnp.ravel(x)
        flat = jnp.pad(flat, (0, rows_pad * lanes - n))
        return flat.reshape(rows_pad, lanes)

    p2, m2, v2, g2 = as2d(p), as2d(m), as2d(v), as2d(g)
    grid = (rows_pad // block_rows,)
    spec = pl.BlockSpec((block_rows, lanes), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_fused_adam_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, lanes), dtype),
            jax.ShapeDtypeStruct((rows_pad, lanes), m.dtype),
            jax.ShapeDtypeStruct((rows_pad, lanes), v.dtype),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(scalars, p2, m2, v2, g2)
    po, mo, vo = (jnp.ravel(x)[:n].reshape(shape) for x in out)
    return po, mo, vo


# ------------------------------------------------------------------- optimizer
@dataclasses.dataclass
class FusedAdam:
    """Adam with a fused one-pass update. Not an optax transformation:
    ``step`` consumes grads and returns updated params directly (the
    whole point is skipping the separate apply_updates pass). The
    trainer branches on this type."""

    schedule: Callable[[jax.Array], jax.Array]
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    backend: str = "jnp"  # "jnp" | "pallas"
    # pallas interpreter mode; None = auto (compiled on TPU, interpreted
    # elsewhere so CPU tests exercise the same code path)
    interpret: object = None

    def __post_init__(self):
        if self.interpret is None:
            self.interpret = jax.default_backend() != "tpu"

    def init(self, params) -> FusedAdamState:
        zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32), mu=zeros(params), nu=zeros(params)
        )

    def step(self, params, grads, state: FusedAdamState):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = jnp.asarray(self.schedule(state.count), jnp.float32)
        c1 = 1.0 / (1.0 - jnp.power(self.b1, t))
        c2 = 1.0 / (1.0 - jnp.power(self.b2, t))
        if self.backend == "pallas":
            scalars = jnp.stack([lr, c1, c2])
            leaf = lambda p, m, v, g: _fused_adam_leaf_pallas(
                p, m, v, g, scalars, self.b1, self.b2, self.eps,
                interpret=self.interpret,
            )
        else:
            leaf = lambda p, m, v, g: _adam_math(
                p, m, v, g, lr, c1, c2, self.b1, self.b2, self.eps
            )
        out = jax.tree.map(
            leaf, params, state.mu, state.nu, grads,
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        # out is a tree of (p, m, v) tuples; transpose into three trees.
        treedef = jax.tree.structure(params)
        flat = jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, tuple))
        new_p = jax.tree.unflatten(treedef, [x[0] for x in flat])
        new_m = jax.tree.unflatten(treedef, [x[1] for x in flat])
        new_v = jax.tree.unflatten(treedef, [x[2] for x in flat])
        return new_p, FusedAdamState(count=count, mu=new_m, nu=new_v)
