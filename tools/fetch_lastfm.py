"""Copy the lastfm dataset out of the reference snapshot into data/.

The reference ships lastfm artifacts (data1.txt / test1.txt /
trustnetwork.txt, tab-separated 1-based triples) but deleted the loader
that could read them (SURVEY.md C21); this framework restores the loader
(`gsrs_tpu.data.dataset.load_lastfm`) and this tool stages the files.

Usage: python tools/fetch_lastfm.py [--out data/lastfm]
"""

import argparse
import os
import shutil

REF_DIR = "/root/reference/LightGCN_work/data/lastfm"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_dir", default=REF_DIR)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "lastfm",
        ),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    missing = []
    for name in ("data1.txt", "test1.txt", "trustnetwork.txt"):
        src = os.path.join(args.ref_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, name))
            print(f"copied {name}")
        else:
            missing.append(src)
    if missing:
        raise SystemExit(f"missing source files: {missing}")
    print(f"staged lastfm at {args.out}")


if __name__ == "__main__":
    main()
