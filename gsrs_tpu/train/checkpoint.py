"""Orbax checkpointing with the reference's three save streams.

Reference policy (code/main.py:56-87,151-166,201-212,238-242):
- per-epoch ``last`` checkpoint,
- ``best-epoch<N>`` on NDCG improvement, with optional keep-top-K pruning,
- periodic legacy-named saves every --save_every epochs,
- resume chain: explicit --resume_path → last → legacy file,

all written atomically. Here each stream is an Orbax PyTree checkpoint
directory holding {params, opt_state, epoch, best_metric}; Orbax already
writes atomically (tmp dir + rename), matching the reference's
tmp+os.replace discipline. `legacy_name` reproduces the reference's
``lgn-<dataset>-<layers>-<dim>`` naming (code/utils.py:123-132)."""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def legacy_name(model: str, dataset: str, num_layers: int, dim: int) -> str:
    return f"{model}-{dataset}-{num_layers}-{dim}"


class CheckpointManager:
    def __init__(self, checkpoint_dir: str):
        self.dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ----------------------------------------------------------------- save
    def _save(self, path: str, state: Dict[str, Any]) -> None:
        # Keep the previous checkpoint intact until the replacement is
        # fully written (the reference's tmp+os.replace discipline,
        # code/main.py:56-67): write to .tmp, swap via two renames. A
        # crash mid-save leaves the old checkpoint (plus a stale .tmp/.old
        # that the next save clears) — never a window with neither.
        #
        # Multi-process: Orbax's save of cross-process sharded arrays is
        # COLLECTIVE (every process writes its addressable shards), but
        # the directory swap must happen exactly once — the primary does
        # the renames, with barriers so no process races ahead into a
        # half-swapped directory (exercised by tests/test_multiprocess.py).
        import jax

        multi = jax.process_count() > 1
        primary = jax.process_index() == 0
        if multi:
            from jax.experimental.multihost_utils import sync_global_devices
        tmp, old = path + ".tmp", path + ".old"
        if primary:
            for stale in (tmp, old):
                if os.path.exists(stale):
                    shutil.rmtree(stale)
        if multi:
            sync_global_devices("gsrs_ckpt_pre_save")
        self._ckptr.save(tmp, state)
        self._ckptr.wait_until_finished()
        if multi:
            sync_global_devices("gsrs_ckpt_post_save")
        if primary:
            if os.path.exists(path):
                os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        if multi:
            sync_global_devices("gsrs_ckpt_post_swap")
            # Shared filesystem (the normal multi-host layout — GCS/NFS,
            # what tests/test_multiprocess.py exercises): the primary's
            # swap is visible everywhere and this is a no-op. HOST-LOCAL
            # checkpoint_dir: each process only has its own shards under
            # .tmp, the primary's rename never reaches this host, so swap
            # locally too — otherwise non-primary shards would sit under
            # .tmp forever and restore would fail (ADVICE r4).
            if not primary and not os.path.exists(path) and os.path.exists(tmp):
                if os.path.exists(old):
                    shutil.rmtree(old, ignore_errors=True)
                os.rename(tmp, path)

    def save_last(self, state: Dict[str, Any]) -> None:
        self._save(os.path.join(self.dir, "last"), state)

    def save_best(self, state: Dict[str, Any], epoch: int, keep_topk: int = 0) -> None:
        self._save(os.path.join(self.dir, f"best-epoch{epoch}"), state)
        if keep_topk > 0:
            bests = sorted(
                glob.glob(os.path.join(self.dir, "best-epoch*")),
                key=lambda p: int(re.search(r"best-epoch(\d+)", p).group(1)),
            )
            for stale in bests[:-keep_topk]:
                shutil.rmtree(stale, ignore_errors=True)

    def save_periodic(self, state: Dict[str, Any], name: str) -> None:
        self._save(os.path.join(self.dir, name), state)

    # -------------------------------------------------------------- restore
    def restore(self, path: str, template: Dict[str, Any]) -> Dict[str, Any]:
        return self._ckptr.restore(os.path.abspath(path), template)

    def resolve_resume_path(
        self, resume_path: Optional[str], legacy: Optional[str] = None
    ) -> Optional[str]:
        """Reference resume chain (code/main.py:151-166): explicit path,
        then <dir>/last, then the legacy-named checkpoint. An explicitly
        requested path that does not exist is an ERROR, not a silent
        fallthrough — resuming from a different checkpoint than the one
        the user named would be easy to miss in logs (for
        resume-if-exists automation, pass --resume without --resume_path).
        A checkpoint stranded mid-swap by a crash (only .tmp/.old present)
        is recovered here before the existence check."""
        if resume_path:
            if os.path.isdir(self._recover(resume_path)):
                return resume_path
            raise FileNotFoundError(
                f"--resume_path {resume_path!r} does not exist (refusing to "
                f"silently fall back to {os.path.join(self.dir, 'last')}; "
                f"use --resume without --resume_path for resume-if-exists)"
            )
        candidates = [os.path.join(self.dir, "last")]
        if legacy:
            candidates.append(os.path.join(self.dir, legacy))
        for c in candidates:
            if os.path.isdir(self._recover(c)):
                return c
        return None

    @staticmethod
    def _recover(path: str) -> str:
        """Promote a complete .tmp (newest) or .old sibling left by a
        crash between _save's two renames, so the swap discipline truly
        never loses a checkpoint. Returns ``path`` (recovered or not)."""
        if not os.path.isdir(path):
            for sib in (path + ".tmp", path + ".old"):
                if os.path.isdir(sib):
                    os.rename(sib, path)
                    print(f"[checkpoint] recovered {path} from {sib}")
                    break
        return path
