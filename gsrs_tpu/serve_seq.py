"""Session-based serving for the sequential family (SASRec/GRU4Rec/BERT4Rec).

The reference has no serving story and no sequential code at all
(SURVEY.md §0/§1); `gsrs_tpu.serve` covers the graph family, this module
covers sessions: given an arbitrary item-id history (not a known training
user — any session), encode it and return top-k next items with the
session's own items excluded.

Unlike graph serving, sequential serving cannot precompute per-user rows —
the query IS the session — so the artifact holds the model parameters and
hyperparameters, and each request runs the jitted encoder + full-catalog
matmul + packed-bitset masked top-k in one compiled program with static
(batch, max_len) shapes.

CLI:
  python -m gsrs_tpu.serve_seq export --checkpoint_dir ckpts --model sasrec \
      --m_items 40981 --out seq.npz
  python -m gsrs_tpu.serve_seq query --artifact seq.npz --session 3 17 42 --k 10

Sessions are REAL 0-based item ids (the same id space as the dataset
files); padding-shift (+1, PAD=0) is internal, matching
`gsrs_tpu.data.sequences`.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsrs_tpu.models.registry import SEQ_MODELS, build_seq_model
from gsrs_tpu.ops.bitset import build_bitset
from gsrs_tpu.ops.topk import mask_train_positives, topk_scores


@dataclasses.dataclass
class SeqRetriever:
    """Serves next-item top-k from a trained sequential model."""

    model: object  # SASRec | GRU4Rec | BERT4Rec (shared score_catalog API)
    params: dict
    batch_size: int = 64

    def __post_init__(self):
        model = self.model
        m = self.m_items

        def _score(params, seqs, seen_rows, k):
            scores = model.score_catalog(params, seqs)  # (B, m) 0-based
            masked = mask_train_positives(scores, seen_rows, m)
            # top-k fused into the same program: one device dispatch per
            # request chunk instead of two (score, then host-side top-k
            # launch) — each extra dispatch costs a full round-trip
            # through a remote-device tunnel
            return topk_scores(masked, k)

        self._score = jax.jit(_score, static_argnames=("k",))

    @property
    def m_items(self) -> int:
        return int(self.model.cfg.m_items)

    @property
    def max_len(self) -> int:
        return int(self.model.cfg.max_len)

    def _encode_sessions(
        self, sessions: Sequence[Sequence[int]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (seqs (N, max_len) shifted/left-padded, seen bitset (N, W))."""
        L, m = self.max_len, self.m_items
        n = len(sessions)
        seqs = np.zeros((n, L), np.int32)
        id_arrays = []
        for r, sess in enumerate(sessions):
            ids = np.asarray(list(sess), dtype=np.int64)
            if ids.size == 0:
                raise ValueError(f"session {r} is empty")
            if ids.min() < 0 or ids.max() >= m:
                bad = ids[(ids < 0) | (ids >= m)]
                raise ValueError(
                    f"session {r}: item ids out of range [0, {m}): "
                    f"{bad[:5].tolist()}"
                )
            tail = ids[-L:]
            seqs[r, L - tail.size :] = tail.astype(np.int32) + 1  # shift, PAD=0
            id_arrays.append(ids)
        rows = np.repeat(
            np.arange(n, dtype=np.int64), [a.size for a in id_arrays]
        )
        seen = build_bitset(
            rows,
            np.concatenate(id_arrays) if id_arrays else np.zeros(0, np.int64),
            n,
            m,
        )
        return seqs, seen

    def recommend(
        self, sessions: Sequence[Sequence[int]], k: int = 20
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (items, scores), each (len(sessions), k), 0-based real ids;
        items already in a session are excluded. Requests pad to
        ``batch_size`` so every call reuses one compiled program."""
        seqs, seen = self._encode_sessions(sessions)
        n = seqs.shape[0]
        B = self.batch_size
        out_items = np.empty((n, k), np.int32)
        out_scores = np.empty((n, k), np.float32)
        for s in range(0, n, B):
            cs, cb = seqs[s : s + B], seen[s : s + B]
            pad = B - cs.shape[0]
            if pad:
                cs = np.pad(cs, ((0, pad), (0, 0)))
                cb = np.pad(cb, ((0, pad), (0, 0)))
            top_s, top_i = self._score(
                self.params, jnp.asarray(cs), jnp.asarray(cb), k=k
            )
            out_items[s : s + B] = np.asarray(top_i)[: B - pad]
            out_scores[s : s + B] = np.asarray(top_s)[: B - pad]
        return out_items, out_scores


def export_seq_model(
    params: dict,
    kind: str,
    m_items: int,
    path: str,
    max_len: int = 50,
    dim: int = 64,
    hidden: int = 64,
    blocks: int = 2,
    heads: int = 1,
) -> None:
    """Persist a self-contained serving artifact: hyperparameters (JSON
    meta) + the parameter pytree, one npz. Serving needs no checkpoint
    manager and no training data — only this module."""
    if kind not in SEQ_MODELS:
        raise ValueError(f"unknown sequential model '{kind}'")
    meta = {
        "kind": kind,
        "m_items": int(m_items),
        "max_len": int(max_len),
        "dim": int(dim),
        "hidden": int(hidden),
        "blocks": int(blocks),
        "heads": int(heads),
    }
    arrays = {f"param/{k}": np.asarray(v) for k, v in params.items()}
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_seq_retriever(path: str, batch_size: int = 64) -> SeqRetriever:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        params = {
            k[len("param/") :]: jnp.asarray(z[k])
            for k in z.files
            if k.startswith("param/")
        }
    model = build_seq_model(
        meta["kind"],
        m_items=meta["m_items"],
        max_len=meta["max_len"],
        dim=meta["dim"],
        hidden=meta["hidden"],
        blocks=meta["blocks"],
        heads=meta["heads"],
        dropout=0.0,  # inference
    )
    return SeqRetriever(model, params, batch_size=batch_size)


# --------------------------------------------------------------------- CLI


def main(argv: Optional[list] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(prog="gsrs_tpu.serve_seq")
    sub = ap.add_subparsers(dest="cmd", required=True)

    exp = sub.add_parser("export", help="seq checkpoint → serving artifact")
    exp.add_argument("--checkpoint_dir", required=True)
    exp.add_argument("--out", required=True)
    exp.add_argument("--model", choices=list(SEQ_MODELS), default="sasrec")
    # must match the training config (same caveat as gsrs_tpu.serve export)
    exp.add_argument("--m_items", type=int, default=None)
    exp.add_argument("--dataset_dir", default=None, help="infer m_items from data")
    exp.add_argument("--max_len", type=int, default=50)
    exp.add_argument("--dim", type=int, default=64)
    exp.add_argument("--hidden", type=int, default=64)
    exp.add_argument("--blocks", type=int, default=2)
    exp.add_argument("--heads", type=int, default=1)

    qry = sub.add_parser("query", help="artifact + session → next items")
    qry.add_argument("--artifact", required=True)
    qry.add_argument(
        "--session", type=int, nargs="+", required=True,
        help="item ids, oldest first (0-based real ids)",
    )
    qry.add_argument("--k", type=int, default=20)

    args = ap.parse_args(argv)
    if args.cmd == "export":
        # prefer the hyperparameters the trainer persisted next to the
        # checkpoint — CLI flags are a fallback for artifacts without one
        # (some fields, e.g. --heads, don't affect parameter shapes, so a
        # wrong flag would corrupt serving silently)
        import os as _os

        meta_path = _os.path.join(args.checkpoint_dir, "model_meta.json")
        if _os.path.exists(meta_path):
            with open(meta_path) as f:
                tm = json.load(f)
            kind, m_items = tm["kind"], tm["m_items"]
            max_len, dim = tm["max_len"], tm["dim"]
            hidden, blocks, heads = tm["hidden"], tm["blocks"], tm["heads"]
            print(f"[serve_seq] using {meta_path}: {tm}")
        else:
            kind = args.model
            m_items = args.m_items
            if m_items is None:
                if args.dataset_dir is None:
                    raise SystemExit("pass --m_items or --dataset_dir")
                from gsrs_tpu.data.dataset import load_dataset

                m_items = load_dataset(args.dataset_dir).m_items
            max_len, dim = args.max_len, args.dim
            hidden, blocks, heads = args.hidden, args.blocks, args.heads
        model = build_seq_model(
            kind,
            m_items=m_items,
            max_len=max_len,
            dim=dim,
            hidden=hidden,
            blocks=blocks,
            heads=heads,
        )
        from gsrs_tpu.train.checkpoint import CheckpointManager

        template = model.init_params(jax.random.key(0))
        ckpt = CheckpointManager(args.checkpoint_dir)
        path = ckpt.resolve_resume_path(None)
        if path is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
        # seq checkpoints hold {params, opt_state, epoch}; restore params only
        import optax

        opt = optax.adam(1e-3)
        restored = ckpt.restore(
            path,
            {
                "params": template,
                "opt_state": opt.init(template),
                "epoch": np.asarray(0, np.int64),
            },
        )
        export_seq_model(
            restored["params"],
            kind,
            m_items,
            args.out,
            max_len=max_len,
            dim=dim,
            hidden=hidden,
            blocks=blocks,
            heads=heads,
        )
        print(f"[serve_seq] exported {args.out}: {kind}, {m_items} items")
    else:
        # one-shot query: batch of exactly 1 — no padding waste
        r = load_seq_retriever(args.artifact, batch_size=1)
        items, scores = r.recommend([args.session], k=args.k)
        pairs = " ".join(f"{i}:{s:.3f}" for i, s in zip(items[0], scores[0]))
        print(f"session {args.session}: {pairs}")


if __name__ == "__main__":
    main()
