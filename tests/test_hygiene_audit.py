"""The streaming hygiene audit (scripts/audit_hygiene.py) re-derives the 7
held-out conditions correctly from the dataset.txt wire format: clean on a
freshly generated generalization split, and each held-out split's own
condition accounts for 100% of its examples."""

import random
import sys

import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.gscan import GroundedScan

sys.path.insert(0, "scripts")
from audit_hygiene import CONDITIONS, audit, main  # noqa: E402


@pytest.fixture(scope="module")
def saved_generalization_dataset(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("audit_ds"))
    random.seed(9)
    np.random.seed(9)
    dataset = GroundedScan(
        intransitive_verbs=["walk"], transitive_verbs=["push", "pull"],
        adverbs=["cautiously", "while spinning"],
        nouns=["circle", "square"], color_adjectives=["red", "yellow"],
        size_adjectives=["big", "small"], percentage_train=0.8,
        min_object_size=1, max_object_size=4, sample_vocabulary="default",
        save_directory=directory, grid_size=6, type_grammar="adverb")
    dataset.get_data_pairs(max_examples=600, num_resampling=1,
                           split_type="generalization", make_dev_set=True)
    return dataset, dataset.save_dataset("dataset.txt")


def test_clean_splits_have_zero_condition_hits(saved_generalization_dataset):
    _, path = saved_generalization_dataset
    counts, totals, _ = audit(path)
    for split in ("train", "dev", "test"):
        if totals.get(split):
            assert counts[split] == [0] * len(CONDITIONS), split


def test_heldout_splits_are_fully_explained(saved_generalization_dataset):
    dataset, path = saved_generalization_dataset
    counts, totals, _ = audit(path)
    # Every audited example count matches the in-memory dataset.
    for split, n in totals.items():
        assert n == dataset.num_examples(split), split
    for split in CONDITIONS:
        if totals.get(split):
            # assign_splits routes an example to EVERY condition it satisfies,
            # so each held-out split is 100% its own condition.
            assert counts[split][CONDITIONS.index(split)] == totals[split]


def test_cli_exit_status_flags_violations(saved_generalization_dataset,
                                          capsys):
    _, path = saved_generalization_dataset
    assert main([path]) == 0
    capsys.readouterr()
    # Treating a held-out split as clean must fail.
    present = [s for s, c in audit(path)[0].items()
               if s in CONDITIONS and any(c)]
    if present:
        assert main([path, "--clean-splits", present[0]]) == 1
