#!/usr/bin/env python
"""Streaming train-mix audit: exposure statistics relevant to the
`visual_easier` held-out split (yellow squares referred to with 'yellow').

In a generalization split the train set never contains (a) red squares as
targets (the `visual` condition) or (b) yellow squares referred to with the
word 'yellow' (the `visual_easier` condition).  What the model CAN see —
yellow squares referred without a color word, and 'yellow' applied to other
shapes — is the transfer evidence it must combine at test time.  This audit
counts that evidence per split so datasets with different generation settings
(num_resampling etc.) can be compared when diagnosing visual_easier variance
(round-2 VERDICT, weak #2).

Same streaming reader approach as scripts/audit_hygiene.py (multi-GB files).
"""
import argparse
import json
import re
import sys

_SPLIT_HEADER = re.compile(r'^        "([a-z_0-9]+)": \[')
_FIELD = re.compile(r'^\s*"([a-z_]+)": (?:"([^"]*)"|(\d+|null))')


def audit(path):
    split = None
    stats = {}
    ex = {}
    in_target = 0
    with open(path, "r", buffering=1 << 20) as fh:
        for line in fh:
            m = _SPLIT_HEADER.match(line)
            if m:
                split = m.group(1)
                stats.setdefault(split, {
                    "total": 0, "square_target": 0, "yellow_square_target": 0,
                    "yellow_word_on_nonsquare": 0, "square_with_color_word": 0,
                    "yellow_word_total": 0})
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
            elif key == "referred_target":
                referred = (sval or "").split()
                s = stats[split]
                s["total"] += 1
                shape, color = ex.get("shape"), ex.get("color")
                has_yellow = "yellow" in referred
                has_color_word = any(c in referred for c in
                                     ("red", "green", "yellow", "blue"))
                if shape == "square":
                    s["square_target"] += 1
                    if color == "yellow":
                        s["yellow_square_target"] += 1
                    if has_color_word:
                        s["square_with_color_word"] += 1
                if has_yellow:
                    s["yellow_word_total"] += 1
                    if shape != "square":
                        s["yellow_word_on_nonsquare"] += 1
                ex, in_target = {}, 0
    return stats


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("dataset")
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)
    stats = audit(args.dataset)
    result = {"dataset": args.dataset, "splits": stats}
    train = stats.get("train", {})
    if train.get("total"):
        result["train_ratios"] = {
            k: round(v / train["total"], 5) for k, v in train.items()
            if k != "total"}
    out = json.dumps(result, indent=2)
    print(out)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
