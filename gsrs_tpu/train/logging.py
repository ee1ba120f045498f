"""CSV + TensorBoard observability.

Writes the same two CSV schemas as the reference driver
(reference code/main.py:98-133):

- train_epoch_metrics.csv: epoch,time_sec,train_loss,lr
- valid_epoch_metrics.csv: epoch,time_sec,lr,precision@k…,recall@k…,ndcg@k…

without the reference's schema collision where Procedure.Test appends
4-column rows into the same valid CSV (reference code/Procedure.py:194-203,
SURVEY.md §5.5). TensorBoard scalars use the same tag shapes as the
reference's historical runs (``Test/Recall@[20]/20`` style) so existing
dashboards keep working; the writer is optional and failure-tolerant."""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional, Sequence


class CsvLogger:
    def __init__(self, path: str, header: Sequence[str]):
        self.path = path
        self.header = list(header)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(self.header)

    def append(self, row: Dict[str, object]) -> None:
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow([row.get(col, "") for col in self.header])


def make_train_csv(checkpoint_dir: str) -> CsvLogger:
    return CsvLogger(
        os.path.join(checkpoint_dir, "train_epoch_metrics.csv"),
        ["epoch", "time_sec", "train_loss", "lr"],
    )


def make_valid_csv(checkpoint_dir: str, topks: Sequence[int]) -> CsvLogger:
    header = ["epoch", "time_sec", "lr"]
    for k in topks:
        header += [f"precision@{k}", f"recall@{k}", f"ndcg@{k}"]
    return CsvLogger(
        os.path.join(checkpoint_dir, "valid_epoch_metrics.csv"), header
    )


class TensorboardWriter:
    """Thin optional wrapper; no-ops if tensorboardX is unavailable."""

    def __init__(self, log_dir: Optional[str], comment: str = ""):
        self._w = None
        if log_dir is None:
            return
        try:
            from tensorboardX import SummaryWriter

            run_name = time.strftime("%m-%d-%Hh%Mm%Ss") + (
                f"--{comment}" if comment else ""
            )
            self._w = SummaryWriter(os.path.join(log_dir, run_name))
        except Exception:
            self._w = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, value, step)

    def eval_metrics(self, metrics: Dict[str, float], topks, epoch: int) -> None:
        if self._w is None:
            return
        ks = list(topks)
        for k in ks:
            self._w.add_scalar(f"Test/Recall@{ks}/{k}", metrics[f"recall@{k}"], epoch)
            self._w.add_scalar(f"Test/Precision@{ks}/{k}", metrics[f"precision@{k}"], epoch)
            self._w.add_scalar(f"Test/NDCG@{ks}/{k}", metrics[f"ndcg@{k}"], epoch)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
