"""Shared pre-LN transformer encoder for the sequential family.

SASRec (causal, ReLU FFN) and BERT4Rec (bidirectional, GELU FFN) differ
only in the attention mask, the FFN activation, and the vocab row count
(PAD vs PAD+MASK); everything else — glorot init layout, LayerNorm,
MXU-friendly static-shape attention, the dropout key-folding discipline —
is this one implementation, so a numerics fix lands in both models at
once.

RNG layout note: `init_encoder_params` splits the key exactly as the
original per-model init did (4 + 8·blocks subkeys, consuming 2 + 6·blocks)
so seeded parameter draws are unchanged by the refactor.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


def layer_norm(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def init_encoder_params(
    key: jax.Array,
    *,
    vocab_rows: int,
    max_len: int,
    d: int,
    num_blocks: int,
    ffn_hidden: int,
) -> Params:
    """Embedding tables (N(0, 0.1²)), positional rows, final LayerNorm,
    and per-block attention/FFN/LN parameters under ``b{i}_*`` keys."""
    ks = iter(jax.random.split(key, 4 + 8 * num_blocks))
    params: Params = {
        # row 0 is PAD and stays ~0 through masking
        "item_emb": 0.1 * jax.random.normal(next(ks), (vocab_rows, d)),
        "pos_emb": 0.1 * jax.random.normal(next(ks), (max_len, d)),
        "ln_f_scale": jnp.ones((d,)),
        "ln_f_bias": jnp.zeros((d,)),
    }
    for b in range(num_blocks):
        glorot = lambda k, i, o: jax.random.normal(k, (i, o)) * np.sqrt(2.0 / (i + o))
        params[f"b{b}_wq"] = glorot(next(ks), d, d)
        params[f"b{b}_wk"] = glorot(next(ks), d, d)
        params[f"b{b}_wv"] = glorot(next(ks), d, d)
        params[f"b{b}_wo"] = glorot(next(ks), d, d)
        params[f"b{b}_ffn1"] = glorot(next(ks), d, ffn_hidden)
        params[f"b{b}_ffn1_b"] = jnp.zeros((ffn_hidden,))
        params[f"b{b}_ffn2"] = glorot(next(ks), ffn_hidden, d)
        params[f"b{b}_ffn2_b"] = jnp.zeros((d,))
        for ln in ("ln1", "ln2"):
            params[f"b{b}_{ln}_scale"] = jnp.ones((d,))
            params[f"b{b}_{ln}_bias"] = jnp.zeros((d,))
    return params


def encode_transformer(
    params: Params,
    seqs: jax.Array,  # (B, L) int32, PAD=0
    attn_mask: jax.Array,  # bool, broadcastable to (B, 1|H, L, L) after [:, None]
    *,
    max_len: int,
    num_blocks: int,
    num_heads: int,
    dropout_rate: float,
    bf16_compute: bool,
    activation: Callable[[jax.Array], jax.Array],
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """→ (B, L, d) hidden states. ``attn_mask`` encodes the model's
    attention pattern: (B, L, L) causal∧valid for SASRec, (B, 1, L)
    key-validity for BERT4Rec. dropout_key=None disables dropout."""
    d = params["pos_emb"].shape[-1]
    compute_dtype = jnp.bfloat16 if bf16_compute else jnp.float32

    pad_mask = (seqs != 0)[:, :, None]  # (B, L, 1)
    x = params["item_emb"][seqs] * np.sqrt(d) + params["pos_emb"][None, :, :]
    x = jnp.where(pad_mask, x, 0.0).astype(compute_dtype)

    drop_i = 0

    def dropout(t):
        nonlocal drop_i
        if dropout_key is None or dropout_rate == 0.0:
            return t
        drop_i += 1
        keep = jax.random.bernoulli(
            jax.random.fold_in(dropout_key, drop_i), 1.0 - dropout_rate, t.shape
        )
        return jnp.where(keep, t / (1.0 - dropout_rate), 0.0).astype(t.dtype)

    x = dropout(x)
    H = num_heads
    hd = d // H
    for b in range(num_blocks):
        h = layer_norm(
            x, params[f"b{b}_ln1_scale"], params[f"b{b}_ln1_bias"]
        ).astype(compute_dtype)
        q = (h @ params[f"b{b}_wq"].astype(compute_dtype)).reshape(-1, max_len, H, hd)
        k = (h @ params[f"b{b}_wk"].astype(compute_dtype)).reshape(-1, max_len, H, hd)
        v = (h @ params[f"b{b}_wv"].astype(compute_dtype)).reshape(-1, max_len, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(hd)
        logits = jnp.where(attn_mask[:, None, ...], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        attn = attn.reshape(-1, max_len, d).astype(compute_dtype)
        x = x + dropout(attn @ params[f"b{b}_wo"].astype(compute_dtype))

        h = layer_norm(
            x, params[f"b{b}_ln2_scale"], params[f"b{b}_ln2_bias"]
        ).astype(compute_dtype)
        ffn = activation(
            h @ params[f"b{b}_ffn1"].astype(compute_dtype)
            + params[f"b{b}_ffn1_b"].astype(compute_dtype)
        )
        ffn = ffn @ params[f"b{b}_ffn2"].astype(compute_dtype) + params[
            f"b{b}_ffn2_b"
        ].astype(compute_dtype)
        x = x + dropout(ffn)
        x = jnp.where(pad_mask, x, 0.0)

    return layer_norm(
        x.astype(jnp.float32), params["ln_f_scale"], params["ln_f_bias"]
    )
