"""train_searcher CLI — builds the retrieval index from CLIP embedding npz
pools. Rebuild of ``scripts/train_searcher.py``; exact top-k search needs no
partition/AH tuning (SURVEY.md §2.9 plan A), so "training" = pooling +
normalizing the database."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--database", type=str, required=True,
                   help="directory of *.npz embedding parts (or one file)")
    p.add_argument("-t", "--target_path", type=str, required=True,
                   help="output index npz path")
    opt = p.parse_args()

    from sd_tpu.pipelines.retrieval import build_index

    if os.path.isdir(opt.database):
        files = sorted(glob.glob(os.path.join(opt.database, "*.npz")))
    else:
        files = [opt.database]
    assert files, f"no npz files under {opt.database}"
    build_index(files, opt.target_path)


if __name__ == "__main__":
    main()
