#!/usr/bin/env python
"""Streaming train-hygiene audit for gSCAN dataset.txt files.

Generalization-split datasets must keep train (and the i.i.d. dev/test
splits) free of the 7 held-out conditions (reference
GroundedScan/dataset_test.py:696-754 asserts this invariant at generation
time).  GECA-style augmentation can silently violate it by recombining
fragments into held-out conditions — the failure mode measured in
documentation/results_r2_geca_seed66_unfiltered.json (situational_1
0 -> 71.7 EM from leaked training data).  This script is the standing
guard: it re-derives each condition from the serialized example fields and
counts, per split, how many examples satisfy each condition.

It streams the pretty-printed dataset.txt line by line (the files are
multi-GB; a json.load would need tens of GB of RAM and minutes of parse
time), relying only on the save_dataset wire format
(multimodal_seq2seq_gscan_tpu/gscan/dataset.py:864-887, one key per line,
4-space indents), which is pinned by reference-parity tests.

Exit status is non-zero if any clean split (default: train,dev,test)
contains a held-out-condition example.  Conditions follow
assign_splits (gscan/dataset.py:814-845); the audit assumes the default
sample_vocabulary (surface form == meaning), which every shipped dataset
uses.

Usage:
  python scripts/audit_hygiene.py data/geca_splits/dataset.txt \
      [--clean-splits train,dev,test] [--json out.json]
"""
import argparse
import json
import re
import sys

CONDITIONS = ["visual", "situational_1", "situational_2", "contextual",
              "adverb_1", "adverb_2", "visual_easier"]

_SPLIT_HEADER = re.compile(r'^        "([a-z_0-9]+)": \[')
_FIELD = re.compile(r'^\s*"([a-z_]+)": (?:"([^"]*)"|(\d+|null))')


def conditions_satisfied(ex):
    """Re-derive the 7 held-out predicates from serialized example fields."""
    shape, color = ex.get("shape"), ex.get("color")
    size = int(ex["size"]) if ex.get("size") else None
    referred = (ex.get("referred_target") or "").split()
    verb, manner = ex.get("verb_in_command"), ex.get("manner")
    hits = []
    if color == "red" and shape == "square":
        hits.append("visual")
    if ex.get("direction_to_target") == "sw":
        hits.append("situational_1")
    if "small" in referred and shape == "circle" and size == 2:
        hits.append("situational_2")
    if verb == "push" and shape == "square" and size == 3:
        hits.append("contextual")
    if manner == "cautiously":
        hits.append("adverb_1")
    if verb == "pull" and manner == "while spinning":
        hits.append("adverb_2")
    if "yellow" in referred and color == "yellow" and shape == "square":
        hits.append("visual_easier")
    return hits


def audit(path):
    """Stream the file; yield (split, example_dict) per example.

    Field extraction state machine: within an example, the target object's
    shape/color/size are the fields inside the `"target_object"` block's
    `"object"` sub-block (placed_objects repeat the same keys later, so
    capture only until the three target fields are seen).
    `"referred_target"` is the final key of every example
    (dataset.py save order) and triggers emission.
    """
    split = None
    counts = {}      # split -> [per-condition counts]
    totals = {}      # split -> example count
    offenders = {}   # split -> first few offending example summaries
    ex = {}
    in_target = 0    # >0 while target fields still expected
    with open(path, "r", buffering=1 << 20) as fh:
        for line in fh:
            m = _SPLIT_HEADER.match(line)
            if m:
                split = m.group(1)
                counts.setdefault(split, [0] * len(CONDITIONS))
                totals.setdefault(split, 0)
                ex, in_target = {}, 0
                continue
            if split is None:
                continue
            m = _FIELD.match(line)
            if not m:
                if '"target_object"' in line:
                    in_target = 3
                continue
            key, sval = m.group(1), m.group(2)
            if in_target and key in ("shape", "color", "size"):
                ex[key] = sval
                in_target -= 1
            elif key in ("direction_to_target", "verb_in_command", "manner",
                         "referred_target"):
                ex[key] = sval
                if key == "referred_target":
                    totals[split] += 1
                    for hit in conditions_satisfied(ex):
                        counts[split][CONDITIONS.index(hit)] += 1
                        offenders.setdefault(split, [])
                        if len(offenders[split]) < 3:
                            offenders[split].append(
                                {k: ex.get(k) for k in
                                 ("shape", "color", "size", "manner",
                                  "verb_in_command", "referred_target",
                                  "direction_to_target")} | {"condition": hit})
                    ex, in_target = {}, 0
    return counts, totals, offenders


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("dataset", help="path to dataset.txt")
    parser.add_argument("--clean-splits", default="train,dev,test",
                        help="comma list of splits that must be condition-free")
    parser.add_argument("--json", default=None,
                        help="also write the result matrix to this path")
    args = parser.parse_args(argv)

    counts, totals, offenders = audit(args.dataset)
    clean = [s for s in args.clean_splits.split(",") if s]
    result = {
        "dataset": args.dataset,
        "conditions": CONDITIONS,
        "totals": totals,
        "condition_counts": counts,
        "violations": {s: dict(zip(CONDITIONS, counts[s]))
                       for s in clean if s in counts and any(counts[s])},
        "offender_samples": {s: offenders.get(s, []) for s in clean
                             if any(counts.get(s, []))},
    }
    result["ok"] = not result["violations"]
    out = json.dumps(result, indent=2)
    print(out)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(out + "\n")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
