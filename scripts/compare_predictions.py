"""Compare two predict.json files field-by-field.

Used to prove two decode configurations emit IDENTICAL predictions through
the real test-mode CLI (e.g. --decode_dtype=float32 vs bfloat16_mixed) on
thousands of real examples — the evidence bar for changing any decode
default (reference contract: seq2seq/predict.py's output is the product).

Prints one line per pair: n, #prediction mismatches, #exact_match-flag
mismatches. Exit code 1 if any prediction differs.

Usage: python scripts/compare_predictions.py a.json b.json [a2.json b2.json ...]
"""

import json
import sys


def compare(path_a: str, path_b: str) -> int:
    with open(path_a) as f:
        recs_a = json.load(f)
    with open(path_b) as f:
        recs_b = json.load(f)
    if len(recs_a) != len(recs_b):
        print(f"{path_a} vs {path_b}: LENGTH MISMATCH "
              f"{len(recs_a)} vs {len(recs_b)}")
        return 1
    # Both files come from the same deterministic split iteration, so
    # compare positionally.  (input, derivation) is NOT a unique key — the
    # same command recurs across situations.  Guard that the example order
    # really is aligned before trusting the positional diff.
    pred_diff = em_diff = 0
    for i, (ra, rb) in enumerate(zip(recs_a, recs_b)):
        if ra["input"] != rb["input"] or ra["derivation"] != rb["derivation"]:
            print(f"{path_a} vs {path_b}: EXAMPLE ORDER DIVERGES at row {i}")
            return 1
        if ra["prediction"] != rb["prediction"]:
            pred_diff += 1
        if ra["exact_match"] != rb["exact_match"]:
            em_diff += 1
    print(f"{path_a} vs {path_b}: n={len(recs_a)} "
          f"prediction_mismatches={pred_diff} exact_match_flag_diffs={em_diff}")
    return 1 if pred_diff else 0


def main():
    paths = sys.argv[1:]
    if len(paths) < 2 or len(paths) % 2:
        print(__doc__)
        sys.exit(2)
    rc = 0
    for a, b in zip(paths[::2], paths[1::2]):
        rc |= compare(a, b)
    sys.exit(rc)


if __name__ == "__main__":
    main()
