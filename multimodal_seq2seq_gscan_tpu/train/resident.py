"""Device-resident training data + multi-step scanned training chunks.

TPU-first redesign of the training inner loop.  The reference assembles one
host batch per optimizer step (reference seq2seq/train.py:88-153); even with
a vectorized host pipeline and prefetch the loop stays host/dispatch-bound
(~9 ms/step against a ~1 ms device step, and every step pays one dispatch
round-trip — expensive when the chip sits behind a network tunnel).  Instead:

* the ENTIRE vectorized training split lives in device memory, in compact
  dtypes (uint8 one-hot grids; ~0.4 GB for 533k examples) — HBM is the right
  home for data the MXU re-reads every epoch;
* each device call runs ``K = steps_per_execution`` optimizer steps under one
  ``lax.scan``, gathering batches ON DEVICE from a ``[K, B]`` int32 block of
  permutation indices — the only per-call host-to-device transfer (~40 KB);
* the host's remaining job is bookkeeping: stream permutation rows (epoch
  reshuffles included, every example exactly once per epoch) and log the
  returned ``[K]``-shaped metrics.

Multi-chip: the resident arrays are replicated across the mesh; the index
block is sharded on its batch axis, so each device gathers exactly its batch
shard from its local replica and XLA inserts the usual gradient all-reduce.
"""

import math
import warnings
from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_seq2seq_gscan_tpu.core.batch import Batch
from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.train.state import TrainState
from multimodal_seq2seq_gscan_tpu.train.step import (
    fused_compiler_options, train_step_body)


class ResidentData(NamedTuple):
    """The whole training split as flat device arrays (compact dtypes)."""

    input_ids: jax.Array        # [N, T_in]  int32
    input_lengths: jax.Array    # [N]        int32
    situations: jax.Array       # [N, H, W, C] uint8 (cast to f32 per batch)
    target_ids: jax.Array       # [N, T_out] int32
    target_lengths: jax.Array   # [N]        int32
    agent_positions: jax.Array  # [N]        int32
    target_positions: jax.Array  # [N]       int32

    @property
    def num_examples(self) -> int:
        return self.input_ids.shape[0]


def host_resident_data(training_set) -> ResidentData:
    """Pack a ``GroundedScanDataset`` into host numpy arrays (the single
    source of truth for the column layout; ``gather_batch`` works on these
    host arrays exactly as on their device-put counterparts)."""
    training_set._ensure_packed()
    situations = training_set._situation_stack
    if situations.dtype != np.uint8:
        situations = situations.astype(np.uint8)
    return ResidentData(
        input_ids=np.ascontiguousarray(training_set._input_matrix),
        input_lengths=training_set._input_lengths,
        situations=np.ascontiguousarray(situations),
        target_ids=np.ascontiguousarray(training_set._target_matrix),
        target_lengths=training_set._target_lengths,
        agent_positions=training_set._agent_positions,
        target_positions=training_set._target_positions)


def build_resident_data(training_set, mesh=None) -> ResidentData:
    """Pack a ``GroundedScanDataset`` into device-resident arrays.

    With ``mesh`` the arrays are replicated over it (each device holds the
    full split; batches are then sharded by index-block sharding).
    """
    host = host_resident_data(training_set)
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P())
    return ResidentData(*(jax.device_put(a, sharding) for a in host))


def gather_batch(data: ResidentData, idx: jax.Array) -> Batch:
    """On-device batch assembly: one gather per column, uint8 grid -> f32."""
    return Batch(
        input_ids=data.input_ids[idx],
        input_lengths=data.input_lengths[idx],
        situations=data.situations[idx].astype(jnp.float32),
        target_ids=data.target_ids[idx],
        target_lengths=data.target_lengths[idx],
        agent_positions=data.agent_positions[idx],
        target_positions=data.target_positions[idx])


def chunk_callable(config: ModelConfig,
                   optimizer: optax.GradientTransformation,
                   weight_target_loss: float = 0.3):
    """The un-jitted ``chunk(state, data, idx_block, segments=None)`` body:
    ``K`` scanned optimizer steps.  ``make_train_chunk`` jits it (optionally
    mesh-sharded); ``train/multiseed.py`` vmaps it over a stacked-seed axis
    before jitting."""

    def chunk(state: TrainState, data: ResidentData, idx_block: jax.Array,
              segments=None):
        t_full = data.target_ids.shape[1]

        def body_at(width):
            def body(carry, idx):
                batch = gather_batch(data, idx)
                if width is not None and width < t_full:
                    batch = batch._replace(
                        target_ids=batch.target_ids[:, :width])
                new_state, metrics = train_step_body(
                    carry, batch, config, optimizer, weight_target_loss)
                return new_state, metrics
            return body

        if segments is None:
            return jax.lax.scan(body_at(None), state, idx_block)
        per_segment = []
        offset = 0
        for count, width in segments:
            state, metrics = jax.lax.scan(
                body_at(width), state, idx_block[offset:offset + count])
            per_segment.append(metrics)
            offset += count
        metrics = jax.tree.map(lambda *xs: jnp.concatenate(xs), *per_segment)
        return state, metrics

    return chunk


def make_train_chunk(config: ModelConfig,
                     optimizer: optax.GradientTransformation,
                     weight_target_loss: float = 0.3, mesh=None,
                     donate: bool = True):
    """Jit ``chunk(state, data, idx_block, segments=None)``: ``K`` scanned
    optimizer steps.

    ``idx_block`` is ``[K, B] int32``; the returned metrics dict has ``[K]``
    leaves (per-step values, last entry = most recent step).

    ``segments`` (static, ``((count, width), ...)`` with counts summing to
    K) splits the block into consecutive row groups and narrows each
    group's gathered target matrix to its ``width`` columns before the
    train step — exact (loss and metrics mask everything past each row's
    target length) whenever each width covers every row of its group, which
    `stratified_index_block_stream` guarantees.  One program is compiled
    per distinct spec (normally: one).
    """
    chunk = chunk_callable(config, optimizer, weight_target_loss)
    donate_argnums = (0,) if donate else ()
    compiler_options = fused_compiler_options(config)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        replicated = NamedSharding(mesh, P())
        data_shardings = ResidentData(
            *([replicated] * len(ResidentData._fields)))
        idx_sharding = NamedSharding(mesh, P(None, "data"))
        return jax.jit(chunk,
                       in_shardings=(replicated, data_shardings, idx_sharding),
                       out_shardings=(replicated, replicated),
                       donate_argnums=donate_argnums,
                       static_argnums=(3,),
                       compiler_options=compiler_options)
    return jax.jit(chunk, donate_argnums=donate_argnums, static_argnums=(3,),
                   compiler_options=compiler_options)


def index_block_stream(num_examples: int, batch_size: int,
                       steps_per_block: int,
                       rng: Optional[np.random.Generator] = None
                       ) -> Iterator[np.ndarray]:
    """Endless ``[K, B] int32`` permutation blocks.

    Epochs are seamless: each epoch is a fresh permutation of all examples,
    and a batch that would straddle an epoch boundary is filled from the next
    permutation — every batch is full and every example appears exactly once
    per epoch (the streaming loop's pad-final-batch semantics, without the
    padded rows).
    """
    if rng is None:
        rng = np.random.default_rng()
    need = steps_per_block * batch_size
    buffer = np.empty((0,), dtype=np.int64)
    while True:
        while buffer.size < need:
            buffer = np.concatenate([buffer, rng.permutation(num_examples)])
        block, buffer = buffer[:need], buffer[need:]
        yield np.ascontiguousarray(
            block.reshape(steps_per_block, batch_size).astype(np.int32))


def _class_widths(target_lengths: np.ndarray, width_multiple: int,
                  cuts=None) -> Tuple[np.ndarray, int]:
    """Per-example width class.

    Default: length rounded up to ``width_multiple``, capped at the global
    max length.  With ``cuts`` (sorted ints): the smallest cut >= length,
    else the global max — e.g. ``cuts=(32,)`` yields the two-class scheme
    {<=32, rest} whose wide class can be mixing-backfilled (``wide_mix``).
    """
    lengths = np.maximum(np.asarray(target_lengths), 1)
    t_max = int(lengths.max())
    if cuts:
        widths = np.full(lengths.shape, t_max, dtype=np.int64)
        for cut in sorted(cuts, reverse=True):
            if cut < t_max:
                widths[lengths <= cut] = cut
        return widths, t_max
    return np.minimum(t_max, -(-lengths // width_multiple)
                      * width_multiple).astype(np.int64), t_max


def _interleave_spec(spec: Tuple[Tuple[int, int], ...], rounds: int = 4
                     ) -> Tuple[Tuple[int, int], ...]:
    """Spread each class's step allocation over ``rounds`` round-robin
    passes (ascending width within each pass) so wide-batch updates are
    distributed through the chunk instead of bunched at its end.  Counts
    per class are preserved exactly; classes whose allocation is smaller
    than ``rounds`` appear in fewer passes."""
    out = []
    remaining = {w: c for c, w in spec}
    order = [w for _, w in spec]
    for r in range(rounds):
        for w in order:
            left = remaining[w]
            if left <= 0:
                continue
            take = -(-left // (rounds - r))  # ceil split of the remainder
            remaining[w] -= take
            out.append((take, w))
    return tuple(out)


def _effective_wide_mix(fractions: np.ndarray, steps_per_block: int,
                        wide_mix: float) -> float:
    """Resolve the wide-mix knob against the block size.

    The mixing scheme is only sound when the widest class's inflated
    allocation ``ceil(K * fraction / (1 - wide_mix))`` fits in ``K - 1``
    steps (at least one step must remain for the shorter classes, and the
    ceil is the per-epoch capacity guarantee: clamping below it starves the
    widest class — at ``K == 1`` it drops the widest class from the spec
    entirely, the stream then can never fill a block, and round 4 shipped
    exactly that livelock).  Degenerate configurations fall back to plain
    stratification (wide_mix = 0) with a warning instead of clamping into
    infeasibility, so the emitted spec ALWAYS contains a segment at least as
    wide as the true widest non-empty class.
    """
    if not wide_mix or len(fractions) < 2:
        return 0.0
    if not 0.0 < wide_mix < 1.0:
        raise ValueError("wide_mix must be in (0, 1), got %r" % wide_mix)
    wide_steps = int(math.ceil(steps_per_block * fractions[-1]
                               / (1.0 - wide_mix)))
    if steps_per_block < 2 or wide_steps > steps_per_block - 1:
        warnings.warn(
            "stratified wide_mix=%g needs %d of %d block steps for the "
            "widest class (plus >=1 for the rest); disabling wide_mix for "
            "this run — raise steps_per_execution (or align "
            "print_every/evaluate_every so the resolved chunk size is "
            "larger) to use it" % (wide_mix, wide_steps, steps_per_block),
            RuntimeWarning, stacklevel=3)
        return 0.0
    return wide_mix


def chunk_segment_spec(target_lengths: np.ndarray, steps_per_block: int,
                       width_multiple: int = 16, cuts=None,
                       wide_mix: float = 0.0, interleave: bool = False
                       ) -> Tuple[Tuple[int, int], ...]:
    """Static ``((count, width), ...)`` segments for one [K, B] train chunk,
    widths ascending, counts summing to K.

    Each chunk mirrors the dataset's target-length distribution: class j
    (lengths rounded up to ``width_multiple``, or binned by ``cuts``) gets
    ``floor(K * fraction_j)`` of the chunk's K batches, and the widest class
    absorbs the remainder, so every K-step device call sees the full length
    mix.  (A length-SORTED chunk stream was measured to destroy training —
    dev EM 2.2 vs 27.9 at 4k iterations — because ~85% of examples are
    short, so sorted chunks produce hundreds-of-steps runs without a single
    long-sequence update.)  Classes whose floor is 0 get no segment; their
    examples ride along in wider segments (always exact — a segment only
    requires width >= every row's length).

    ``wide_mix`` in (0, 1) inflates the widest class's allocation to
    ``K * fraction / (1 - wide_mix)`` steps so the stream can backfill that
    share of every wide batch with random shorter examples: the rare long
    examples then always train in mixed batches instead of segregated ones
    (the round-4 200k run showed fully width-homogeneous batches plateau
    ~1.4 dev-EM below full-width training).  ``interleave`` spreads each
    class's steps round-robin through the chunk instead of ascending runs.
    """
    widths, _ = _class_widths(target_lengths, width_multiple, cuts)
    classes, counts = np.unique(widths, return_counts=True)
    fractions = counts / counts.sum()
    wide_mix = _effective_wide_mix(fractions, steps_per_block, wide_mix)
    if wide_mix:
        # ceil: per-epoch wide-row capacity must be >= the wide class's
        # supply, otherwise the wide pool grows without bound across epochs
        # (the own-take cap below stops wide segments from draining it).
        # _effective_wide_mix guarantees this fits in steps_per_block - 1.
        wide_steps = int(math.ceil(steps_per_block * fractions[-1]
                                   / (1.0 - wide_mix)))
        rest = steps_per_block - wide_steps
        alloc = np.floor(fractions[:-1] / fractions[:-1].sum()
                         * rest).astype(int)
        # largest-remainder rounding for the shorter classes
        remainders = fractions[:-1] / fractions[:-1].sum() * rest - alloc
        for j in np.argsort(-remainders)[:rest - int(alloc.sum())]:
            alloc[j] += 1
        alloc = np.concatenate([alloc, [wide_steps]])
    else:
        alloc = np.floor(fractions * steps_per_block).astype(int)
        alloc[-1] += steps_per_block - int(alloc.sum())  # widest takes rest
    spec = tuple((int(a), int(w)) for a, w in zip(alloc, classes) if a > 0)
    return _interleave_spec(spec) if interleave else spec


def stratified_index_block_stream(target_lengths: np.ndarray, batch_size: int,
                                  steps_per_block: int,
                                  rng: Optional[np.random.Generator] = None,
                                  width_multiple: int = 16, cuts=None,
                                  wide_mix: float = 0.0,
                                  interleave: bool = False
                                  ) -> Iterator[tuple]:
    """Endless ``([K, B] int32 block, segment spec)`` pairs.

    Like ``index_block_stream`` (fresh permutation per epoch horizon, every
    example exactly once, seamless epoch boundaries), but each block's rows
    are laid out to match ``chunk_segment_spec``: the first ``c_1`` rows hold
    examples no longer than ``w_1``, the next ``c_2`` no longer than ``w_2``,
    and so on — so the scanned train chunk runs each segment's teacher-forced
    unroll at that segment's width instead of the ~104-token global max
    (most gSCAN targets are ~12-20 tokens, so this removes most of the
    sequential decoder latency that dominates the device step) while every
    device call still samples the whole length distribution.

    Segments are filled from their own length class first, then backfilled
    from shorter classes (exact: a row only needs width >= its length).
    With ``wide_mix`` the widest class's own-pool take is capped at
    ``(1 - wide_mix) * need`` per segment, so EVERY wide batch carries
    ~``wide_mix`` random shorter examples (without the cap the own-first
    rule would saturate early chunks with longs and leave later chunks'
    wide segments all-short).  When the remaining examples cannot fill a
    block (fewer than K*B left, or only over-long examples remain for some
    segment), the leftovers carry into the next epoch's pools and are
    consumed first.  Degenerate wide_mix configurations fall back to plain
    stratification via ``_effective_wide_mix`` (round 4 shipped a livelock
    here: at ``steps_per_block == 1`` the clamped spec dropped the widest
    class and no block was ever fillable); a progress guard backstops any
    residual infeasibility by raising instead of spinning.
    """
    if rng is None:
        rng = np.random.default_rng()
    target_lengths = np.asarray(target_lengths)
    widths, _ = _class_widths(target_lengths, width_multiple, cuts)
    classes, counts = np.unique(widths, return_counts=True)
    wide_mix = _effective_wide_mix(counts / counts.sum(), steps_per_block,
                                   wide_mix)
    spec = chunk_segment_spec(target_lengths, steps_per_block, width_multiple,
                              cuts, wide_mix, interleave)
    widest = max(w for _, w in spec)
    class_of = {w: np.flatnonzero(widths == w) for w in classes}
    pools = {w: np.empty((0,), np.int64) for w in class_of}
    stuck_refills = 0
    while True:
        for w, members in class_of.items():
            pools[w] = np.concatenate([pools[w], rng.permutation(members)])
        yielded_any = False
        while True:
            if sum(p.size for p in pools.values()) < steps_per_block * batch_size:
                break
            segments = []
            taken = {w: 0 for w in pools}
            feasible = True
            for count, width in spec:
                need = count * batch_size
                own_cap = need
                if wide_mix and width == widest:
                    own_cap = need - int(round(need * wide_mix))
                rows = []
                # own class first (capped), then widest-to-shortest of the
                # shorter classes
                for w in sorted((w for w in pools if w <= width),
                                key=lambda w: (w != width, -w)):
                    avail = pools[w].size - taken[w]
                    want = need - sum(r.size for r in rows)
                    if w == width:
                        want = min(want, own_cap)
                    grab = min(want, avail)
                    if grab <= 0:
                        continue
                    rows.append(pools[w][taken[w]:taken[w] + grab])
                    taken[w] += grab
                    if sum(r.size for r in rows) == need:
                        break
                if sum(r.size for r in rows) != need:
                    feasible = False
                    break
                seg = np.concatenate(rows)
                rng.shuffle(seg)
                segments.append(seg.reshape(count, batch_size))
            if not feasible:
                break
            for w in pools:
                pools[w] = pools[w][taken[w]:]
            block = np.concatenate(segments, axis=0)
            yielded_any = True
            yield (np.ascontiguousarray(block.astype(np.int32)), spec)
        # Progress guard: an epoch refill adds every example once, so if a
        # refill that brought supply above one block's worth still yielded
        # nothing, another identical refill cannot help — raise instead of
        # growing the pools forever (the round-4 livelock mode).
        if yielded_any:
            stuck_refills = 0
        elif sum(p.size for p in pools.values()) >= steps_per_block * batch_size:
            stuck_refills += 1
            if stuck_refills >= 2:
                raise RuntimeError(
                    "stratified_index_block_stream made no progress over two "
                    "consecutive epoch refills: spec=%r, pool sizes=%r, "
                    "batch_size=%d, steps_per_block=%d" % (
                        spec, {w: int(p.size) for w, p in pools.items()},
                        batch_size, steps_per_block))


def resolve_chunk_size(steps_per_execution: int, print_every: int,
                       evaluate_every: int) -> int:
    """Largest chunk size <= steps_per_execution that divides both logging
    periods, so print/eval boundaries always land between device calls."""
    period = math.gcd(int(print_every), int(evaluate_every))
    k = max(1, min(int(steps_per_execution), period))
    while period % k:
        k -= 1
    return k
