"""Summarize per-split metrics from predict.json files.

Usage: python scripts/summarize_results.py <run_dir> [--out results.json]
"""

import argparse
import glob
import json
import os

import numpy as np


def summarize(run_dir: str):
    rows = []
    for path in sorted(glob.glob(os.path.join(run_dir, "*_predict.json"))):
        with open(path) as f:
            records = json.load(f)
        split = os.path.basename(path).replace("_predict.json", "")
        rows.append({
            "split": split,
            "n": len(records),
            "accuracy": float(np.mean([r["accuracy"] for r in records])),
            "exact_match": 100 * float(np.mean([r["exact_match"]
                                                for r in records])),
            "position_accuracy": float(np.mean([r["position_accuracy"]
                                                for r in records])),
        })
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_dir")
    parser.add_argument("--out", default="")
    args = parser.parse_args()
    rows = summarize(args.run_dir)
    print(f"{'split':18s} {'n':>6s} {'acc':>7s} {'EM %':>7s}")
    for row in rows:
        print(f"{row['split']:18s} {row['n']:6d} {row['accuracy']:7.2f} "
              f"{row['exact_match']:7.2f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
