"""Interaction datasets: the `BasicDataset` contract as a value object.

Replaces the reference's abstract `BasicDataset(torch.utils.data.Dataset)`
+ concrete `Loader` (reference code/dataloader.py:26-255) with a plain
dataclass exposing the same surface — ``n_users`` / ``m_items`` /
``train_size`` / ``test_dict`` / ``positives_of`` / ``all_positives`` —
and pure loader functions with the reference's exact txt semantics:

- one line per user: ``uid iid iid …`` (reference code/dataloader.py:82-115)
- blank lines and lines with a uid but no items are skipped
  (reference code/dataloader.py:85-91,105-109)
- ``item:timestamp`` tokens are tolerated (the deprecated cache_graph.py
  format, reference code/cache_graph.py:60-73)
- node counts are inferred as max id + 1 over BOTH train and test files
  (reference code/dataloader.py:92-93,117-119)

Plus a loader for the lastfm tab-separated format the reference ships
data for but deleted the loader of (SURVEY.md C21), and node padding for
mesh-divisible sharding (no reference counterpart).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class InteractionData:
    """A bipartite user-item interaction dataset.

    ``train_users[k]`` interacted with ``train_items[k]``; the pair order
    is preserved from the source file (per-user temporal order for
    converters that emit it, e.g. `gsrs_tpu.data.instacart`), which the
    sequential family relies on (`gsrs_tpu.data.sequences`).

    ``test_dict`` maps user id → int array of held-out ground-truth items
    (reference code/dataloader.py:146,165-171).
    """

    name: str
    n_users: int
    m_items: int
    train_users: np.ndarray  # (N,) int64
    train_items: np.ndarray  # (N,) int64
    test_dict: Dict[int, np.ndarray]
    # real node counts when n_users/m_items were padded for mesh
    # divisibility (`pad_nodes_to_multiple`); None = no padding. Consumers
    # building membership bitsets pass real_m_items to build_bitset so
    # phantom ids are rejected as negatives and masked out of top-k;
    # serving slices exports back to the real sizes.
    real_m_items: Optional[int] = None
    real_n_users: Optional[int] = None

    # ------------------------------------------------------------ derived
    @property
    def train_size(self) -> int:
        """Number of train interactions (reference `trainDataSize`)."""
        return int(self.train_users.size)

    @property
    def user_degrees(self) -> np.ndarray:
        """(n_users,) int64 interaction counts (reference users_D,
        code/dataloader.py:139-142, without the zero→1 fix — zero-degree
        handling lives in the normalization, `gsrs_tpu.data.adjacency`)."""
        if not hasattr(self, "_user_degrees"):
            self._user_degrees = np.bincount(
                self.train_users, minlength=self.n_users
            )
        return self._user_degrees

    @property
    def item_degrees(self) -> np.ndarray:
        if not hasattr(self, "_item_degrees"):
            self._item_degrees = np.bincount(
                self.train_items, minlength=self.m_items
            )
        return self._item_degrees

    @property
    def user_item_net(self) -> sp.csr_matrix:
        """Binary CSR interaction matrix R (users × items), the reference
        `UserItemNet` (code/dataloader.py:133-136)."""
        if not hasattr(self, "_net"):
            net = sp.csr_matrix(
                (
                    np.ones(self.train_size, dtype=np.float32),
                    (self.train_users, self.train_items),
                ),
                shape=(self.n_users, self.m_items),
            )
            net.sum_duplicates()
            net.data[:] = 1.0
            net.sort_indices()
            self._net = net
        return self._net

    def positives_of(self, user: int) -> np.ndarray:
        """Sorted item ids the user interacted with in train (reference
        getUserPosItems via CSR row indices, code/dataloader.py:178-180)."""
        net = self.user_item_net
        return net.indices[net.indptr[user] : net.indptr[user + 1]].astype(
            np.int64
        )

    def all_positives(self) -> List[np.ndarray]:
        """Per-user positive lists (reference allPos,
        code/dataloader.py:145)."""
        return [self.positives_of(u) for u in range(self.n_users)]

    def feedback_of(self, users: np.ndarray, items: np.ndarray) -> np.ndarray:
        """Binary train feedback for (user, item) pairs (reference
        getUserItemFeedback, code/dataloader.py:173-176): 1 where the
        pair is a train interaction, else 0. uint8, same length as
        ``users``."""
        net = self.user_item_net
        return np.asarray(
            net[np.asarray(users), np.asarray(items)], dtype=np.uint8
        ).ravel()

    def test_users(self) -> np.ndarray:
        """Sorted array of users that have ground-truth test items."""
        return np.sort(np.fromiter(self.test_dict.keys(), dtype=np.int64))


# -------------------------------------------------------------- txt format


def parse_interaction_file(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse the LightGCN txt format: ``uid iid iid …`` per line.

    Skips blank lines and lines with no items; tolerates ``item:ts``
    tokens (reference code/dataloader.py:82-115, code/cache_graph.py:60-73).
    Returns (users, items) int64 arrays in file order.
    """
    users: List[int] = []
    items: List[int] = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) < 2:
                continue
            uid = int(toks[0])
            for tok in toks[1:]:
                items.append(int(tok.split(":", 1)[0]))
                users.append(uid)
    return (
        np.asarray(users, dtype=np.int64),
        np.asarray(items, dtype=np.int64),
    )


def write_interaction_file(
    path: str,
    users: np.ndarray,
    items: np.ndarray,
    preserve_order: bool = False,
) -> None:
    """Write (users, items) pairs in the txt format.

    ``preserve_order=True`` keeps each user's items in input order (and
    users in first-appearance order) — required for temporally ordered
    converters feeding the sequential family; the default sorts users and
    items ascending (canonical form for graph datasets).
    """
    lines: Dict[int, List[int]] = {}
    order: List[int] = []
    for u, i in zip(users.tolist(), items.tolist()):
        if u not in lines:
            lines[u] = []
            order.append(u)
        lines[u].append(i)
    if not preserve_order:
        order = sorted(order)
    with open(path, "w") as f:
        for u in order:
            its = lines[u] if preserve_order else sorted(lines[u])
            f.write(f"{u} " + " ".join(str(i) for i in its) + "\n")


def write_dataset_dir(out_dir, train_rows, test_rows):
    """Emit a dataset directory from per-user (org_user_id, [org_item_id…])
    rows: train.txt/test.txt with dense remapped ids (item order within a
    row preserved — the sequential family relies on temporal order) plus
    the reference's user_list.txt/item_list.txt 'org_id remap_id' mapping
    files (reference data/*/user_list.txt). → (n_users, m_items).

    Shared by the MovieLens and Instacart converters so the artifact
    contract lives in one place."""
    import os

    user_ids = sorted(u for u, _ in train_rows)
    item_ids = sorted(
        {i for _, its in train_rows for i in its}
        | {i for _, its in test_rows for i in its}
    )
    u_map = {org: k for k, org in enumerate(user_ids)}
    i_map = {org: k for k, org in enumerate(item_ids)}

    os.makedirs(out_dir, exist_ok=True)
    for name, rows in (("train.txt", train_rows), ("test.txt", test_rows)):
        with open(os.path.join(out_dir, name), "w") as f:
            for org_u, its in rows:
                f.write(
                    f"{u_map[org_u]} "
                    + " ".join(str(i_map[i]) for i in its)
                    + "\n"
                )
    for name, mapping in (("user_list.txt", u_map), ("item_list.txt", i_map)):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("org_id remap_id\n")
            for org, k in mapping.items():
                f.write(f"{org} {k}\n")
    return len(user_ids), len(item_ids)


# ------------------------------------------------------------------ loaders


def load_dataset(dataset_dir: str, name: Optional[str] = None) -> InteractionData:
    """Load a train.txt/test.txt dataset directory (reference Loader,
    code/dataloader.py:62-146). Node counts are max id + 1 over both
    files; interaction order is preserved from the file."""
    tr_u, tr_i = parse_interaction_file(os.path.join(dataset_dir, "train.txt"))
    test_path = os.path.join(dataset_dir, "test.txt")
    if os.path.exists(test_path):
        te_u, te_i = parse_interaction_file(test_path)
    else:
        te_u = te_i = np.zeros(0, dtype=np.int64)

    def _max(*arrays: np.ndarray) -> int:
        vals = [int(a.max()) for a in arrays if a.size]
        return max(vals) if vals else -1

    n_users = _max(tr_u, te_u) + 1
    m_items = _max(tr_i, te_i) + 1
    test_dict = _build_test_dict(te_u, te_i)
    return InteractionData(
        name=name or (os.path.basename(os.path.normpath(dataset_dir)) or "dataset"),
        n_users=n_users,
        m_items=m_items,
        train_users=tr_u,
        train_items=tr_i,
        test_dict=test_dict,
    )


def load_lastfm(dataset_dir: str) -> InteractionData:
    """Loader for the lastfm format the reference ships but cannot read
    (data1.txt / test1.txt, tab-separated ``user item weight`` triples,
    1-based ids — the upstream LastFM dataset class was deleted in this
    fork, SURVEY.md C21). Ids shift to 0-based; duplicate pairs dedupe
    (first occurrence kept)."""

    def _parse(path: str) -> Tuple[np.ndarray, np.ndarray]:
        us: List[int] = []
        its: List[int] = []
        seen = set()
        if not os.path.exists(path):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        with open(path) as f:
            for line in f:
                toks = line.split()
                if len(toks) < 2:
                    continue
                u, i = int(toks[0]) - 1, int(toks[1]) - 1
                if (u, i) in seen:
                    continue
                seen.add((u, i))
                us.append(u)
                its.append(i)
        return np.asarray(us, np.int64), np.asarray(its, np.int64)

    tr_u, tr_i = _parse(os.path.join(dataset_dir, "data1.txt"))
    te_u, te_i = _parse(os.path.join(dataset_dir, "test1.txt"))
    vals_u = [int(a.max()) for a in (tr_u, te_u) if a.size]
    vals_i = [int(a.max()) for a in (tr_i, te_i) if a.size]
    return InteractionData(
        name="lastfm",
        n_users=(max(vals_u) + 1) if vals_u else 0,
        m_items=(max(vals_i) + 1) if vals_i else 0,
        train_users=tr_u,
        train_items=tr_i,
        test_dict=_build_test_dict(te_u, te_i),
    )


def _build_test_dict(users: np.ndarray, items: np.ndarray) -> Dict[int, np.ndarray]:
    test_dict: Dict[int, List[int]] = {}
    for u, i in zip(users.tolist(), items.tolist()):
        test_dict.setdefault(u, []).append(i)
    return {u: np.asarray(v, dtype=np.int64) for u, v in test_dict.items()}


# ------------------------------------------------------------------ padding


def pad_nodes_to_multiple(data: InteractionData, multiple: int) -> InteractionData:
    """Round n_users / m_items up to a multiple so row-sharded embedding
    tables divide evenly across the mesh's model axis. Phantom nodes have
    zero degree and no edges, so they receive no propagation mass; the
    recorded ``real_m_items`` makes bitset consumers reject phantom item
    ids as negatives and mask them out of eval/serving top-k. No
    reference counterpart (the reference is single-device)."""
    if multiple <= 1:
        return data
    n = -(-data.n_users // multiple) * multiple
    m = -(-data.m_items // multiple) * multiple
    if n == data.n_users and m == data.m_items:
        return data
    return InteractionData(
        name=data.name,
        n_users=n,
        m_items=m,
        train_users=data.train_users,
        train_items=data.train_items,
        test_dict=data.test_dict,
        real_m_items=data.real_m_items or data.m_items,
        real_n_users=data.real_n_users or data.n_users,
    )
