"""Aggregate per-split results JSONs into a seeds mean±std table.

Usage:
  python scripts/seed_matrix.py documentation/results_r2_adverb_seed66_400k.json \
      documentation/results_r2_adverb_seed49_200k.json [...]

Prints a markdown table (rows = splits, columns = each run's EM plus
mean±std), mirroring the reference protocol of reporting 3 seeds per
experiment (reference all_experiments.sh:5-12).
"""

import json
import os
import sys

import numpy as np


def main(paths):
    runs = []
    for path in paths:
        with open(path) as f:
            rows = json.load(f)
        name = (os.path.basename(path)
                .replace("results_", "").replace(".json", ""))
        runs.append((name, {r["split"]: r["exact_match"] for r in rows}))

    splits = sorted({s for _, by_split in runs for s in by_split},
                    key=lambda s: (s != "dev", s != "test", s))
    header = ["split"] + [name for name, _ in runs] + ["mean ± std"]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    for split in splits:
        values = [by_split.get(split) for _, by_split in runs]
        present = np.array([v for v in values if v is not None])
        cells = [split]
        cells += ["{:.2f}".format(v) if v is not None else "—"
                  for v in values]
        cells.append("{:.2f} ± {:.2f}".format(present.mean(),
                                              present.std(ddof=0)))
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1:])
