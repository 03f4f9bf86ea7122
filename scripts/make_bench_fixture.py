"""Build data/bench_fixture: a committed, self-contained bench workload.

Extracts a subset of train/dev examples from a full dataset.txt (streaming
byte scan — the source can be many GB), together with the dataset header and
vocabulary fields, and pairs it with the training vocab files and the trained
checkpoint bench.py decodes with.

Usage:
  python scripts/make_bench_fixture.py \
      --source data/compositional_splits_r10 \
      --checkpoint runs/r2_adverb_seed66/model_best.msgpack \
      --out data/bench_fixture --dev 4096 --train 512
"""

import argparse
import json
import mmap
import os
import shutil


def _scan_objects(view, start, count):
    """Yield `count` raw JSON object byte-slices from an array at `start`
    (index of the char right after '['), via string-aware brace counting."""
    objects = []
    i = start
    n = len(view)
    while len(objects) < count and i < n:
        while i < n and view[i] not in b"{]":
            i += 1
        if i >= n or view[i] == ord("]"):
            break
        depth = 0
        begin = i
        in_string = False
        escaped = False
        while i < n:
            c = view[i]
            if in_string:
                if escaped:
                    escaped = False
                elif c == ord("\\"):
                    escaped = True
                elif c == ord('"'):
                    in_string = False
            else:
                if c == ord('"'):
                    in_string = True
                elif c == ord("{"):
                    depth += 1
                elif c == ord("}"):
                    depth -= 1
                    if depth == 0:
                        i += 1
                        objects.append(view[begin:i])
                        break
            i += 1
    return objects, i


def extract_subset(dataset_path, num_train, num_dev):
    with open(dataset_path, "rb") as f:
        view = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        examples_at = view.find(b'"examples"')
        assert examples_at > 0, "no examples key"
        header = view[:examples_at].decode()
        header_fields = json.loads(header + '"examples": {}}')
        header_fields.pop("examples")

        train_at = view.find(b'"train": [', examples_at)
        assert train_at > 0, "no train split"
        train_objs, after_train = _scan_objects(
            view, train_at + len(b'"train": ['), num_train)
        dev_at = view.find(b'"dev": [', after_train)
        assert dev_at > 0, "no dev split"
        dev_objs, _ = _scan_objects(view, dev_at + len(b'"dev": ['), num_dev)

        tail = view[-1048576:].decode()
        vocab_at = tail.rfind('"intransitive_verbs"')
        assert vocab_at > 0, "no vocabulary fields in tail"
        vocab_fields = json.loads("{" + tail[vocab_at:])
        view.close()

    out = dict(header_fields)
    out["examples"] = {
        "train": [json.loads(o) for o in train_objs],
        "dev": [json.loads(o) for o in dev_objs],
    }
    out.update(vocab_fields)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", required=True,
                        help="directory with dataset.txt + training vocabs")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default="data/bench_fixture")
    parser.add_argument("--dev", type=int, default=4096)
    parser.add_argument("--train", type=int, default=512)
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    subset = extract_subset(os.path.join(args.source, "dataset.txt"),
                            args.train, args.dev)
    with open(os.path.join(args.out, "dataset.txt"), "w") as f:
        json.dump(subset, f, indent=2)
    for vocab in ("training_input_vocab.txt", "training_target_vocab.txt"):
        shutil.copy(os.path.join(args.source, vocab),
                    os.path.join(args.out, vocab))
    shutil.copy(args.checkpoint, os.path.join(args.out, "model_best.msgpack"))
    meta = args.checkpoint + ".json"
    if os.path.exists(meta):
        shutil.copy(meta, os.path.join(args.out, "model_best.msgpack.json"))
    print("fixture written to", args.out,
          "({} train / {} dev examples)".format(
              len(subset["examples"]["train"]),
              len(subset["examples"]["dev"])))


if __name__ == "__main__":
    main()
