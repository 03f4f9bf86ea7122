"""Aggregate every documentation/results_*.json into one markdown table.

Produces documentation/RESULTS.md: per-run exact-match across all tested
splits, grouped by experiment family, so the full campaign record (30+
runs across rounds 2-4) is readable in one place.  The per-run JSONs are
written by scripts/summarize_results.py at the end of every session
script's test phase (reference analogue: the per-run result tables the
reference keeps as documentation/training_logs/*_test.txt tails).

Usage: python scripts/aggregate_results.py [--out documentation/RESULTS.md]
"""

import argparse
import glob
import json
import os
import re

SPLIT_ORDER = ["dev", "test", "visual", "visual_easier", "situational_1",
               "situational_2", "contextual", "adverb_1", "adverb_2"]

# (family title, regex over the results_*.json basename stem, reference bar)
FAMILIES = [
    ("Compositional splits (200k, batch 200)",
     r"^(adverb_(r10_)?seed|r2_adverb_seed|r3_adverb_seed|r4_full|r4_strat|"
     r"r4b_|r5_ms_seed|r5_strat_ms_seed|ctrl)",
     "reference dev EM 98.15 (adverb_run_1.txt)"),
    ("Adverb k-shot",
     r"^(r2_adverb_k|r3_adverb_k|adverb_k)",
     "reference dev EM: k=5 98.75, k=50 98.55"),
    ("GECA", r"^(r2_geca|r3_geca)", "reference dev EM 92.05 (geca_run_1.txt)"),
    ("Target lengths (cnn_kernel_size 13)",
     r"^(r2_target_lengths|target_lengths)",
     "reference dev EM 95.72 (target_lengths_run_1.txt)"),
]


def load_rows(doc_dir):
    rows = {}
    for path in sorted(glob.glob(os.path.join(doc_dir, "results_*.json"))):
        stem = os.path.basename(path)[len("results_"):-len(".json")]
        stem = re.sub(r"_[0-9]+00k$", "", stem)
        with open(path) as f:
            recs = json.load(f)
        rows[stem] = {r["split"]: r["exact_match"] for r in recs}
    return rows


def render(rows):
    lines = ["# Campaign results — exact match % per split",
             "",
             "One row per tested run (best checkpoint, 2000-example split "
             "subsets, `max_decoding_steps=120`).  Source JSONs: "
             "`documentation/results_*.json`; training logs: "
             "`documentation/training_logs/`.  Regenerate with "
             "`python scripts/aggregate_results.py`.", ""]
    seen = set()
    for title, pat, bar in FAMILIES:
        members = [k for k in rows if re.match(pat, k) and k not in seen]
        if not members:
            continue
        seen.update(members)
        splits = [s for s in SPLIT_ORDER
                  if any(s in rows[m] for m in members)]
        lines += [f"## {title}", "", f"_{bar}_", ""]
        lines.append("| run | " + " | ".join(splits) + " |")
        lines.append("|---|" + "---|" * len(splits))
        for m in sorted(members):
            cells = [f"{rows[m][s]:.2f}" if s in rows[m] else "—"
                     for s in splits]
            lines.append(f"| {m} | " + " | ".join(cells) + " |")
        lines.append("")
    leftovers = sorted(set(rows) - seen)
    if leftovers:
        lines += ["## Other runs", ""]
        for m in leftovers:
            cells = ", ".join(f"{s} {v:.2f}" for s, v in
                              sorted(rows[m].items()))
            lines.append(f"- {m}: {cells}")
        lines.append("")
    return "\n".join(lines) + "\n"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc_dir", default="documentation")
    parser.add_argument("--out", default="documentation/RESULTS.md")
    args = parser.parse_args()
    rows = load_rows(args.doc_dir)
    text = render(rows)
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {args.out} ({len(rows)} runs)")


if __name__ == "__main__":
    main()
