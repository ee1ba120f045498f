"""Pallas TPU kernels.

Status and rationale (round 3):

- `masked_scores_pallas`: fused eval-scoring kernel — computes the
  (B, m) user×item score tile on the MXU and applies the train-positive
  bitset mask inline (bit unpack + select on the VPU), so the full score
  matrix is written exactly once instead of matmul-out + masked-copy.
  Correctness-tested in interpreter mode. Compiled multi-block mode is
  BLOCKED by a Mosaic limitation: the word→32-column bit-unpack needs a
  (bt, wpb, 32)→(bt, wpb*32) reshape that Mosaic cannot lower
  ("unsupported shape cast", vector<256x128x32xi32> →
  vector<256x4096xi32> — results/bench_eval.log, round 2). Do NOT set
  use_pallas_scoring on real catalogs with this variant.

- `masked_scores_bitplane_pallas`: the compiled-mode workaround — bits
  are unpacked by CONCATENATING the 32 shifted word-planes along the
  lane axis (no 3D reshape), which Mosaic can lower. The kernel's score
  columns come out bit-plane-permuted within each block; callers
  pre-permute `item_emb` with `bitplane_permutation` so output column c
  of tile j is item `perm[j*block_m + c]`, and map top-k indices back
  through the same array.

- SpMM gather kernels: attempted and NOT shippable with this toolchain —
  Mosaic exposes no vectorized VMEM gather (`jnp.take`,
  `take_along_axis`, and per-row `fori` copies all fail to lower), which
  is the one primitive that would beat XLA's issue-rate-bound gather
  (~300 M rows/s) for the ELL SpMM. Revisit when a dynamic-gather
  primitive lands; the XLA ELL path (`gsrs_tpu.ops.ell`) remains the
  production SpMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _masked_scores_kernel(u_ref, it_ref, bits_ref, out_ref):
    scores = jnp.dot(
        u_ref[:], it_ref[:].T, preferred_element_type=jnp.float32
    )  # (BT, MT)
    words = bits_ref[:]  # (BT, MT // 32) uint32
    bt, mt = scores.shape
    # bit j of the tile column lives in word j>>5 at bit j&31: expand each
    # word to 32 consecutive columns (broadcast + reshape keeps word-major
    # order; pltpu.repeat is tile-repeat, NOT element-repeat)
    expanded = jnp.broadcast_to(
        words[:, :, None], (bt, mt // 32, 32)
    ).reshape(bt, mt)
    shifts = (
        jax.lax.broadcasted_iota(jnp.uint32, (bt, mt), dimension=1) % 32
    )
    mask = ((expanded >> shifts) & 1).astype(jnp.bool_)
    out_ref[:] = jnp.where(mask, NEG_INF, scores)


@functools.partial(jax.jit, static_argnames=("block_b", "block_m", "interpret"))
def masked_scores_pallas(
    user_emb: jax.Array,  # (B, d) float32
    item_emb: jax.Array,  # (m, d) float32
    bitset_rows: jax.Array,  # (B, ceil(m/32)) uint32 (m must be padded to 32·k
    #                           for the kernel; caller slices the output)
    block_b: int = 256,
    block_m: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Fused U @ I^T with train-positive masking. Both axes pad internally:
    the user batch up to a block_b multiple (pad rows computed then sliced
    off) and the catalog up to 32·W then a block_m multiple (pad columns
    mask to NEG_INF and are sliced off); callers get exactly (B, m).
    Compiled-mode constraint: the bitset block's last dimension is
    block_m//32 words, and Mosaic requires last-dim blocks divisible by
    128 or covering the whole array — so block_m must be a multiple of
    4096 (= 128 words) unless one block spans the entire padded catalog
    (small-shape/interpret cases). Validated below after padding."""
    B, d = user_emb.shape
    m = item_emb.shape[0]
    W = bitset_rows.shape[1]
    # pad the batch so block_b divides it — a floor-divided grid would
    # return uninitialized output rows for any ragged tail
    B_pad = -(-B // block_b) * block_b
    if B_pad != B:
        user_emb = jnp.pad(user_emb, ((0, B_pad - B), (0, 0)))
        bitset_rows = jnp.pad(bitset_rows, ((0, B_pad - B), (0, 0)))
    # pad the word dimension so block_m divides the padded catalog; pad
    # words are all-ones → their columns mask to NEG_INF (and are sliced
    # off anyway)
    wpb = block_m // 32
    W_pad = -(-W // wpb) * wpb
    if wpb % 128 and wpb != W_pad:
        raise ValueError(
            f"block_m={block_m} gives a {wpb}-word bitset block; Mosaic "
            "needs last-dim blocks divisible by 128 words (block_m "
            "multiple of 4096) or a single block spanning the catalog"
        )
    if W_pad != W:
        import numpy as np

        bitset_rows = jnp.pad(
            bitset_rows,
            ((0, 0), (0, W_pad - W)),
            constant_values=np.uint32(0xFFFFFFFF),
        )
    m_pad = W_pad * 32
    if m_pad != m:
        item_emb = jnp.pad(item_emb, ((0, m_pad - m), (0, 0)))
    grid = (B_pad // block_b, m_pad // block_m)
    out = pl.pallas_call(
        _masked_scores_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, block_m // 32),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_m), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(user_emb, item_emb, bitset_rows)
    return out[:B, :m]


# ---------------------------------------------------------------------------
# Bit-plane variant: compiled-mode workaround for the Mosaic shape-cast wall.
# ---------------------------------------------------------------------------


def resolve_bitplane_scoring(
    mode, m_items: int, variant: str = "bitplane", min_items: int = 65536
) -> bool:
    """Shared auto-select rule for the fused bitplane scoring kernel
    (VERDICT r3 item 4). ``mode``: bool | "auto" | "on" | "off". Both the
    Evaluator (train.evaluator.resolve_pallas_scoring) and the serving
    Retriever route through this single predicate so the threshold and
    the off-switch behave identically at eval and serve time (ADVICE r4:
    serving used to hardcode its own copy with no off switch)."""
    if mode is True or mode == "on":
        return True
    if mode is False or mode == "off":
        return False
    # "auto": only the bitplane variant compiles under Mosaic, and only
    # on a real TPU backend; below the threshold XLA-exact already wins.
    return (
        variant == "bitplane"
        and m_items >= min_items
        and jax.default_backend() == "tpu"
    )


def _masked_scores_bitplane_kernel(u_ref, it_ref, bits_ref, out_ref):
    scores = jnp.dot(
        u_ref[:], it_ref[:].T, preferred_element_type=jnp.float32
    )  # (BT, MT) — columns already in bit-plane order (items pre-permuted)
    words = bits_ref[:]  # (BT, MT // 32) uint32, natural word layout
    # plane k = bit k of every word → column c = k*wpb + w holds the mask
    # bit of item w*32 + k within the tile. Lane-axis concat of 2D planes
    # lowers in Mosaic (no 3D→2D shape cast, unlike the broadcast+reshape
    # unpack above).
    planes = [((words >> jnp.uint32(k)) & jnp.uint32(1)) for k in range(32)]
    mask = jnp.concatenate(planes, axis=1).astype(jnp.bool_)
    out_ref[:] = jnp.where(mask, NEG_INF, scores)


def bitplane_permutation(m_pad: int, block_m: int):
    """perm such that kernel output column c (global, over padded catalog)
    scores item `perm[c]`. Within tile j: c = k*wpb + w ↔ item
    j*block_m + w*32 + k (word w, bit k)."""
    import numpy as np

    wpb = block_m // 32
    c = np.arange(m_pad, dtype=np.int64)
    j, cc = c // block_m, c % block_m
    return j * block_m + (cc % wpb) * 32 + (cc // wpb)


@functools.partial(jax.jit, static_argnames=("block_b", "block_m", "interpret"))
def masked_scores_bitplane_pallas(
    user_emb: jax.Array,  # (B, d) float32
    item_emb_perm: jax.Array,  # (m_pad, d) float32, rows ALREADY permuted by
    #                            bitplane_permutation(m_pad, block_m)
    bitset_rows: jax.Array,  # (B, m_pad // 32) uint32, natural word layout,
    #                          pad words 0xFFFFFFFF
    block_b: int = 256,
    block_m: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Fused masked scoring with bit-plane-permuted output columns.

    Returns (B_pad, m_pad) scores where column c is item
    `bitplane_permutation(m_pad, block_m)[c]`; callers run top-k on this
    and map indices back through the permutation (pad items score
    NEG_INF so they never surface). The caller owns catalog padding —
    m_pad must be a multiple of block_m and block_m a multiple of 4096
    (128-word lane tiles), keeping every concat plane lane-aligned."""
    B, d = user_emb.shape
    m_pad = item_emb_perm.shape[0]
    if m_pad % block_m or block_m % 4096:
        raise ValueError(
            f"m_pad={m_pad} must be a multiple of block_m={block_m}, "
            "and block_m a multiple of 4096"
        )
    if bitset_rows.shape[1] != m_pad // 32:
        raise ValueError("bitset width must be m_pad/32 words")
    B_pad = -(-B // block_b) * block_b
    if B_pad != B:
        user_emb = jnp.pad(user_emb, ((0, B_pad - B), (0, 0)))
        bitset_rows = jnp.pad(bitset_rows, ((0, B_pad - B), (0, 0)))
    grid = (B_pad // block_b, m_pad // block_m)
    out = pl.pallas_call(
        _masked_scores_bitplane_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, block_m // 32),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_m), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(user_emb, item_emb_perm, bitset_rows)
    return out[:B]
