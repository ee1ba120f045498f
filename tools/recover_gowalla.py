"""Rebuild data/gowalla/train.txt from the reference's surviving adjacency.

The reference repo stripped train.txt as a large blob, but ships the raw
symmetric bipartite adjacency (data/gowalla/s_adj_mat.npz: 70,839² with
1,620,256 nnz = 2 × 810,128 train interactions — verified against
SURVEY.md §6 graph-scale facts). The upper-right R block is exactly the
binarized user-item train matrix, so train.txt is recoverable bit-for-bit
up to within-line item ordering.

Also copies test.txt / user_list.txt / item_list.txt into the repo data
dir. Usage: python tools/recover_gowalla.py [--out data/gowalla]
"""

import argparse
import os
import shutil
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsrs_tpu.data.dataset import write_interaction_file

REF_DIR = "/root/reference/LightGCN_work/data/gowalla"
N_USERS = 29858  # from user_list.txt line count (SURVEY.md §6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_dir", default=REF_DIR)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "gowalla",
        ),
    )
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    adj = sp.load_npz(os.path.join(args.ref_dir, "s_adj_mat.npz")).tocsr()
    assert adj.shape[0] == adj.shape[1]
    R = adj[:N_USERS, N_USERS:].tocoo()
    print(f"recovered R: {R.shape[0]} users x {R.shape[1]} items, {R.nnz} interactions")
    write_interaction_file(
        os.path.join(args.out, "train.txt"),
        R.row.astype(np.int64),
        R.col.astype(np.int64),
    )
    for name in ("test.txt", "user_list.txt", "item_list.txt"):
        src = os.path.join(args.ref_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, name))
    print(f"wrote {args.out}/train.txt (+ test/user/item lists)")


if __name__ == "__main__":
    main()
