"""Device-resident scanned training (train/resident.py): the K-step
lax.scan chunk must match K individual train steps bit-for-bit-in-float,
the permutation stream must preserve exact once-per-epoch example frequency,
and the mesh-sharded chunk must agree with the single-device one.
"""

import jax
import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.core.batch import Batch
from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.parallel import make_mesh
from multimodal_seq2seq_gscan_tpu.train.resident import (
    ResidentData, build_resident_data, gather_batch, index_block_stream,
    make_train_chunk, resolve_chunk_size)
from multimodal_seq2seq_gscan_tpu.train.state import (
    create_train_state, make_optimizer)
from multimodal_seq2seq_gscan_tpu.train.step import make_train_step


def test_resolve_chunk_size_divides_boundaries():
    assert resolve_chunk_size(50, 500, 4000) == 50
    assert resolve_chunk_size(64, 500, 4000) == 50
    assert resolve_chunk_size(50, 10, 20) == 10
    assert resolve_chunk_size(7, 500, 4000) == 5
    assert resolve_chunk_size(1, 500, 4000) == 1
    assert resolve_chunk_size(1000, 500, 4000) == 500


def test_index_block_stream_exact_epochs():
    n, batch, k = 10, 3, 4
    stream = index_block_stream(n, batch, k, np.random.default_rng(0))
    flat = np.concatenate([next(stream).ravel() for _ in range(5)])
    # 60 indices = 6 full epochs: every window of n is a permutation of 0..n-1
    for epoch in range(6):
        window = np.sort(flat[epoch * n:(epoch + 1) * n])
        np.testing.assert_array_equal(window, np.arange(n))
    blocks = index_block_stream(n, batch, k, np.random.default_rng(1))
    assert next(blocks).shape == (k, batch)
    assert next(blocks).dtype == np.int32


def test_chunk_segment_spec():
    from multimodal_seq2seq_gscan_tpu.train.resident import chunk_segment_spec

    rng = np.random.RandomState(5)
    # 85% short (<=16), 10% medium (<=32), 5% long — gSCAN-like skew.
    lengths = np.concatenate([rng.randint(5, 17, 850),
                              rng.randint(17, 33, 100),
                              rng.randint(33, 60, 50)]).astype(np.int32)
    spec = chunk_segment_spec(lengths, steps_per_block=50, width_multiple=16)
    counts = [c for c, _ in spec]
    widths = [w for _, w in spec]
    assert sum(counts) == 50
    assert widths == sorted(widths)                    # ascending
    assert widths[-1] == int(lengths.max())            # capped at T_max
    assert all(c >= 1 for c in counts)
    # every chunk carries the length mix: the short class dominates but the
    # long tail still gets at least one batch per chunk
    assert counts[0] >= 40 and counts[-1] >= 1


def test_stratified_index_block_stream():
    from multimodal_seq2seq_gscan_tpu.train.resident import (
        chunk_segment_spec, stratified_index_block_stream)

    rng = np.random.RandomState(7)
    n, batch, k = 400, 4, 5
    lengths = np.concatenate([rng.randint(3, 17, 340),
                              rng.randint(17, 40, 60)]).astype(np.int32)
    stream = stratified_index_block_stream(lengths, batch, k,
                                           np.random.default_rng(2),
                                           width_multiple=16)
    spec = chunk_segment_spec(lengths, k, width_multiple=16)
    per_epoch = n // (batch * k) * (batch * k)
    seen = []
    for _ in range(2 * per_epoch // (batch * k)):
        block, got_spec = next(stream)
        assert got_spec == spec
        assert block.shape == (k, batch) and block.dtype == np.int32
        # every row of every segment fits that segment's width
        offset = 0
        for count, width in spec:
            seg = block[offset:offset + count]
            assert lengths[seg].max() <= width
            offset += count
        seen.append(block.ravel())
    flat = np.concatenate(seen)
    for epoch in range(2):
        window = flat[epoch * per_epoch:(epoch + 1) * per_epoch]
        # once per epoch horizon (carry-over examples allowed to cross)
        assert len(np.unique(window)) == per_epoch


def test_chunk_segments_match_sliced_single_steps():
    """A segmented chunk must equal per-step training on batches whose
    target matrix is host-sliced to the same per-segment widths (the
    reference itself pads targets to the BATCH max, so per-batch width is
    the faithful semantic)."""
    config, host = _toy_problem()
    optimizer = make_optimizer()
    k, batch = 4, 8
    w_max = int(host.target_lengths.max())  # covers every row, < t_out
    segments = ((2, w_max), (2, w_max - 1)) if w_max > 1 else ((4, w_max),)
    # build a block whose later segments respect their narrower width
    rng = np.random.default_rng(6)
    short_rows = np.flatnonzero(host.target_lengths <= w_max - 1)
    blocks = np.stack(
        [rng.choice(host.num_examples, batch, replace=False) for _ in range(2)]
        + [rng.choice(short_rows, batch, replace=False) for _ in range(2)]
    ).astype(np.int32)

    chunk_fn = make_train_chunk(config, optimizer, donate=False)
    data = ResidentData(*(jax.device_put(a) for a in host))
    state_a = create_train_state(jax.random.PRNGKey(11), config, optimizer)
    state_a, metrics = chunk_fn(state_a, data, blocks, segments)
    assert metrics["loss"].shape == (k,)

    step_fn = make_train_step(config, optimizer, donate=False)
    state_b = create_train_state(jax.random.PRNGKey(11), config, optimizer)
    sliced_losses = []
    for row, width in zip(blocks, [w_max, w_max, w_max - 1, w_max - 1]):
        b = _host_batch_from(host, row)
        b = b._replace(target_ids=b.target_ids[:, :width])
        state_b, m = step_fn(state_b, b)
        sliced_losses.append(float(m["loss"]))

    np.testing.assert_allclose(np.asarray(metrics["loss"]), sliced_losses,
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-6),
        state_a.params, state_b.params)


def test_chunk_segments_exact_without_aux():
    """Without the auxiliary task (the flagship setting) covering widths are
    EXACT: same losses and parameters as the full-width chunk."""
    config, host = _toy_problem()
    config = config._replace(auxiliary_task=False)
    optimizer = make_optimizer()
    k, batch = 4, 8
    w_max = int(host.target_lengths.max())
    blocks = next(index_block_stream(host.num_examples, batch, k,
                                     np.random.default_rng(8)))
    chunk_fn = make_train_chunk(config, optimizer, donate=False)
    data = ResidentData(*(jax.device_put(a) for a in host))

    state_w = create_train_state(jax.random.PRNGKey(13), config, optimizer)
    state_w, metrics_w = chunk_fn(state_w, data, blocks,
                                  ((2, w_max), (2, w_max)))
    state_f = create_train_state(jax.random.PRNGKey(13), config, optimizer)
    state_f, metrics_f = chunk_fn(state_f, data, blocks, None)

    np.testing.assert_allclose(np.asarray(metrics_w["loss"]),
                               np.asarray(metrics_f["loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        state_w.params, state_f.params)


def _toy_problem(n=24, batch=8, grid=4, channels=6, t_in=7, t_out=9):
    rng = np.random.RandomState(0)
    config = ModelConfig(
        input_vocabulary_size=12, target_vocabulary_size=8,
        num_cnn_channels=channels, embedding_dimension=10,
        encoder_hidden_size=12, decoder_hidden_size=12, cnn_kernel_size=3,
        cnn_hidden_num_channels=6, auxiliary_task=True)
    input_lengths = rng.randint(3, t_in + 1, size=n).astype(np.int32)
    target_lengths = rng.randint(3, t_out + 1, size=n).astype(np.int32)
    input_ids = np.zeros((n, t_in), np.int32)
    target_ids = np.zeros((n, t_out), np.int32)
    for i in range(n):
        input_ids[i, :input_lengths[i]] = rng.randint(
            3, 12, size=input_lengths[i])
        target_ids[i, :target_lengths[i]] = rng.randint(
            3, 8, size=target_lengths[i])
    host = ResidentData(
        input_ids=input_ids, input_lengths=input_lengths,
        situations=(rng.rand(n, grid, grid, channels) < 0.2).astype(np.uint8),
        target_ids=target_ids, target_lengths=target_lengths,
        agent_positions=rng.randint(0, grid * grid, size=n).astype(np.int32),
        target_positions=rng.randint(0, grid * grid, size=n).astype(np.int32))
    return config, host


def _host_batch_from(host: ResidentData, idx) -> Batch:
    # gather_batch works on host numpy arrays exactly as on device arrays.
    return gather_batch(host, idx)


def test_chunk_matches_single_steps():
    config, host = _toy_problem()
    optimizer = make_optimizer()
    k, batch = 4, 8
    blocks = next(index_block_stream(host.num_examples, batch, k,
                                     np.random.default_rng(3)))

    chunk_fn = make_train_chunk(config, optimizer, donate=False)
    data = ResidentData(*(jax.device_put(a) for a in host))
    state_a = create_train_state(jax.random.PRNGKey(7), config, optimizer)
    state_a, metrics = chunk_fn(state_a, data, blocks)
    assert metrics["loss"].shape == (k,)

    step_fn = make_train_step(config, optimizer, donate=False)
    state_b = create_train_state(jax.random.PRNGKey(7), config, optimizer)
    per_step_losses = []
    for row in blocks:
        state_b, m = step_fn(state_b, _host_batch_from(host, row))
        per_step_losses.append(float(m["loss"]))

    np.testing.assert_allclose(np.asarray(metrics["loss"]), per_step_losses,
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-6),
        state_a.params, state_b.params)
    assert int(state_a.step) == int(state_b.step) == k


def test_chunk_on_mesh_matches_single_device():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    config, host = _toy_problem(batch=16)
    optimizer = make_optimizer()
    k, batch = 3, 16
    blocks = next(index_block_stream(host.num_examples, batch, k,
                                     np.random.default_rng(4)))

    mesh = make_mesh()
    sharded_chunk = make_train_chunk(config, optimizer, mesh=mesh,
                                     donate=False)
    data_sharded = build_resident_data(_FakeSet(host), mesh=mesh)
    state_m = create_train_state(jax.random.PRNGKey(9), config, optimizer)
    state_m, metrics_m = sharded_chunk(state_m, data_sharded, blocks)

    plain_chunk = make_train_chunk(config, optimizer, donate=False)
    data_local = ResidentData(*(jax.device_put(a) for a in host))
    state_s = create_train_state(jax.random.PRNGKey(9), config, optimizer)
    state_s, metrics_s = plain_chunk(state_s, data_local, blocks)

    np.testing.assert_allclose(np.asarray(metrics_m["loss"]),
                               np.asarray(metrics_s["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-6),
        state_m.params, state_s.params)


class _FakeSet:
    """Duck-typed stand-in for GroundedScanDataset's packed columns."""

    def __init__(self, host: ResidentData):
        self._input_matrix = host.input_ids
        self._input_lengths = host.input_lengths
        self._situation_stack = host.situations
        self._target_matrix = host.target_ids
        self._target_lengths = host.target_lengths
        self._agent_positions = host.agent_positions
        self._target_positions = host.target_positions
        self.num_examples = host.num_examples

    def _ensure_packed(self):
        pass
