"""Data pipeline unit tests: bucketing, padding, length-homogenized shuffle."""

import numpy as np

from multimodal_seq2seq_gscan_tpu.core.vocabulary import Vocabulary


def _fake_dataset(num=500, seed=0):
    """A GroundedScanDataset-shaped object without touching the engine."""
    from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset
    ds = GroundedScanDataset.__new__(GroundedScanDataset)
    rng = np.random.RandomState(seed)
    ds.length_bucket_size = 8
    ds.image_dimensions = 4
    ds.image_channels = 3
    ds._input_ids = [np.arange(1, rng.randint(3, 10), dtype=np.int32)
                     for _ in range(num)]
    ds._target_ids = [np.arange(1, rng.randint(3, 40), dtype=np.int32)
                      for _ in range(num)]
    ds._situations = [np.zeros((4, 4, 3), np.uint8) for _ in range(num)]
    ds._input_lengths = np.array([len(a) for a in ds._input_ids], np.int32)
    ds._target_lengths = np.array([len(a) for a in ds._target_ids], np.int32)
    ds._agent_positions = np.zeros(num, np.int32)
    ds._target_positions = np.zeros(num, np.int32)
    ds._situation_representations = [{} for _ in range(num)]
    ds._derivation_representations = ["" for _ in range(num)]
    ds._order = np.arange(num)
    ds.input_vocabulary = Vocabulary()
    ds.target_vocabulary = Vocabulary()
    return ds


def test_batches_are_bucketed_and_padded():
    ds = _fake_dataset()
    for batch, idx, _, _ in ds.get_data_iterator(batch_size=64,
                                                 pad_to_full_batch=True):
        assert batch.input_ids.shape[0] == 64
        assert batch.input_ids.shape[1] % 8 == 0
        assert batch.target_ids.shape[1] % 8 == 0
        assert batch.target_ids.shape[1] >= ds._target_lengths[idx].max()
        # Padded rows are all-zero.
        for row in range(len(idx), 64):
            assert batch.input_lengths[row] == 0
            assert not batch.input_ids[row].any()


def test_bucketed_shuffle_preserves_examples_and_homogenizes():
    ds = _fake_dataset()
    rng = np.random.default_rng(0)
    ds.shuffle_data(rng, bucket_by_length_with_batch_size=64)
    assert sorted(ds._order.tolist()) == list(range(500))

    # Bucketed batches should have a much smaller mean padded length than
    # random batches.
    def mean_padded_length(order):
        total = 0
        count = 0
        for start in range(0, len(order), 64):
            idx = order[start:start + 64]
            total += ds._target_lengths[idx].max()
            count += 1
        return total / count

    bucketed = mean_padded_length(ds._order)
    random_order = np.random.default_rng(1).permutation(500)
    unbucketed = mean_padded_length(random_order)
    assert bucketed < unbucketed - 3


def test_shuffle_without_bucketing_is_permutation():
    ds = _fake_dataset()
    ds.shuffle_data(np.random.default_rng(2))
    assert sorted(ds._order.tolist()) == list(range(500))


def test_prefetch_to_device_preserves_order_and_values():
    import jax

    from multimodal_seq2seq_gscan_tpu.data.prefetch import prefetch_to_device

    items = [(np.full((4,), i, np.int32), i) for i in range(20)]
    out = list(prefetch_to_device(iter(items), depth=3))
    assert len(out) == 20
    for i, (arr, tag) in enumerate(out):
        assert tag == i
        assert isinstance(arr, jax.Array)
        np.testing.assert_array_equal(np.asarray(arr), items[i][0])


def test_prefetch_propagates_exceptions():
    from multimodal_seq2seq_gscan_tpu.data.prefetch import prefetch_to_device

    def source():
        yield (np.zeros((2,), np.float32),)
        raise ValueError("boom")

    stream = prefetch_to_device(source(), depth=2)
    next(stream)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="boom"):
        next(stream)


def test_prefetch_early_close_stops_producer():
    import threading

    from multimodal_seq2seq_gscan_tpu.data.prefetch import prefetch_to_device

    produced = []

    def source():
        for i in range(10_000):
            produced.append(i)
            yield (np.zeros((1,), np.float32), i)

    stream = prefetch_to_device(source(), depth=2)
    next(stream)
    stream.close()
    # The producer thread must wind down, not spin through the whole source.
    for _ in range(50):
        if threading.active_count() == 1:
            break
        import time
        time.sleep(0.1)
    assert len(produced) < 100

