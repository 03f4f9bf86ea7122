"""Multi-seed campaign training: all seeds of a family in ONE program.

The reference trains each seed as a separate 26-hour job (reference
all_experiments.sh:5-12 — three seeds per family, sequentially or on three
GPUs).  Stacking the seeds on a leading axis and ``jax.vmap``-ing the train
step runs the whole family as ONE program with ONE dispatch stream and ONE
HBM-resident copy of the dataset.

Measured scaling (documentation/PERFORMANCE.md round-5 section): per-seed
step time grows near-linearly with the stacked-seed count (6.73 ms single ->
19.6 ms at 3 seeds on the same chip/day), so the aggregate gain over
sequential single-seed runs is small (153.5 vs 148.4 seed-steps/s at 3
seeds, +3.4%).  This REFUTES the "latency-bound, extra seeds nearly free"
hypothesis the trainer was built to test: the ~6.7 ms device step is
throughput-bound (per-scan-step HBM/VPU work proportional to batch), not a
fixed-latency scan chain.  The trainer's real value is operational — one
launch, one compile, one dataset residency, and per-seed trajectories that
exactly match individually-trained runs — plus the small aggregate win.

Mechanics:

* parameters / optimizer state / RNG are initialised per seed and stacked
  leaf-wise to a leading ``[n_seeds, ...]`` axis (``stack_train_states``);
* each seed keeps its OWN data order: one permutation stream per seed
  (seeded with that seed, exactly like a single-seed run), stacked into a
  ``[n_seeds, K, B]`` index block;
* the device-resident scanned chunk (train/resident.py) is vmapped over
  (state, index block) with the resident data arrays shared (closed over,
  broadcast) — the HBM-resident dataset is stored ONCE for all seeds;
* evaluation / checkpointing slice one seed's params off the stacked state
  (an on-device gather, ~2 MB) and reuse the ordinary single-model decoder,
  writing per-seed run directories (``<output>/seed_<s>/``) that are
  byte-compatible with single-seed runs (same checkpoint format, same
  training-log line shape, so RESULTS.md tooling works unchanged).

Exactness: vmap only adds a batch axis; each seed's computation is the same
program a single-seed run compiles, so per-seed trajectories match
individually-trained runs to numerical-association noise
(tests/test_multiseed.py asserts metrics and params against per-seed chunks).
"""

import logging
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.train.resident import (
    ResidentData, chunk_callable)
from multimodal_seq2seq_gscan_tpu.train.state import TrainState

logger = logging.getLogger(__name__)


def stack_train_states(states: Sequence[TrainState]) -> TrainState:
    """Stack per-seed states leaf-wise onto a leading [n_seeds] axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def load_campaign_checkpoints(seed_dirs: Sequence[str],
                              states: Sequence[TrainState], k: int):
    """Restore per-seed running checkpoints for a campaign resume.

    Returns ``(states, best, done)`` where ``done`` is the (common) completed
    iteration. Validates the invariants the stream replay relies on: all
    seeds at the same iteration (the campaign checkpoints every seed at every
    eval boundary) and that iteration on the ``k``-step chunk grid.
    """
    import os

    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt

    states, metas = list(states), []
    for i, d in enumerate(seed_dirs):
        states[i], meta = ckpt.load_checkpoint(
            os.path.join(d, ckpt.CHECKPOINT_FILE), states[i])
        metas.append(meta)
    done_iters = sorted({int(m["iteration"]) for m in metas})
    if len(done_iters) != 1:
        raise ValueError(
            "cannot resume: per-seed checkpoints are at different "
            "iterations {} ({})".format(done_iters, tuple(seed_dirs)))
    done = done_iters[0]
    if done % k:
        # Checkpoints are only written at eval boundaries and
        # resolve_chunk_size makes k divide evaluate_every, so this can only
        # trip if the periods changed between launch and resume.
        raise ValueError(
            "cannot resume: checkpoint iteration {} is not on the "
            "{}-step chunk grid (did print_every/evaluate_every/"
            "steps_per_execution change?)".format(done, k))
    best = [{"iteration": m["best_iteration"],
             "accuracy": m["best_accuracy"],
             "exact_match": m["best_exact_match"]} for m in metas]
    return states, best, done


def slice_train_state(stacked: TrainState, i: int) -> TrainState:
    """Seed ``i``'s state off the stacked axis (device-level slice)."""
    return jax.tree.map(lambda x: x[i], stacked)


def make_multiseed_train_chunk(config: ModelConfig,
                               optimizer: optax.GradientTransformation,
                               weight_target_loss: float = 0.3,
                               donate: bool = True):
    """Jit ``chunk(stacked_state, data, idx_blocks, segments=None)``.

    ``idx_blocks`` is ``[n_seeds, K, B] int32`` (one independent permutation
    stream per seed); the resident ``data`` is shared across seeds
    (broadcast, stored once).  Returned metrics have ``[n_seeds, K]`` leaves.
    ``segments`` is static and must be identical across seeds (it is — the
    spec is a deterministic function of the dataset's target lengths).
    """
    chunk = chunk_callable(config, optimizer, weight_target_loss)

    def multi(stacked_state: TrainState, data: ResidentData,
              idx_blocks: jax.Array, segments=None):
        return jax.vmap(
            lambda state, block: chunk(state, data, block, segments),
            in_axes=(0, 0))(stacked_state, idx_blocks)

    return jax.jit(multi, static_argnums=(3,),
                   donate_argnums=(0,) if donate else ())


def train_multiseed(training_set, dev_set, config: ModelConfig,
                    optimizer: optax.GradientTransformation,
                    seeds: Sequence[int], output_directory: str,
                    max_training_iterations: int, training_batch_size: int,
                    steps_per_execution: int, print_every: int,
                    evaluate_every: int, max_decoding_steps: int,
                    weight_target_loss: float = 0.3,
                    evaluation_batch_size: int = 256,
                    max_testing_examples: Optional[int] = None,
                    chunk_layout: str = "full",
                    stratified_options: Optional[dict] = None,
                    learning_rate: float = 0.001, lr_decay: float = 0.9,
                    lr_decay_steps: float = 20000.0,
                    decode_dtype: Optional[str] = None,
                    resume: bool = False):
    """Train ``len(seeds)`` models simultaneously on one chip.

    Mirrors the single-seed resident loop (train/loop.py::_train_resident):
    same chunk alignment, same per-``print_every`` metrics line (one per
    seed, tagged ``[seed N]``), same per-``evaluate_every`` dev decode +
    best-on-exact-match checkpointing — per seed, into
    ``<output_directory>/seed_<s>/``.

    With ``resume=True`` each seed restores
    ``<output_directory>/seed_<s>/checkpoint.msgpack`` (all seeds must be at
    the same iteration — they are, since the campaign checkpoints every seed
    at every eval boundary) and each seed's permutation stream is replayed
    past the consumed blocks, so the resumed trajectory is the one the
    uninterrupted run would have taken (tests/test_multiseed.py asserts
    final-state equality).
    """
    import os

    from multimodal_seq2seq_gscan_tpu.decode.predict import evaluate
    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt
    from multimodal_seq2seq_gscan_tpu.train.resident import (
        build_resident_data, host_resident_data, index_block_stream,
        resolve_chunk_size, stratified_index_block_stream)
    from multimodal_seq2seq_gscan_tpu.train.state import create_train_state

    n_seeds = len(seeds)
    k = resolve_chunk_size(steps_per_execution, print_every, evaluate_every)
    states = [create_train_state(jax.random.PRNGKey(s), config, optimizer)
              for s in seeds]

    host_data = host_resident_data(training_set)
    data = build_resident_data(training_set)

    def seed_stream(seed):
        rng = np.random.default_rng(seed)
        if chunk_layout == "stratified":
            return stratified_index_block_stream(
                host_data.target_lengths, training_batch_size, k, rng,
                **(stratified_options or {}))
        return ((block, None) for block in index_block_stream(
            training_set.num_examples, training_batch_size, k, rng))

    streams = [seed_stream(s) for s in seeds]
    seed_dirs = [os.path.join(output_directory, "seed_{}".format(s))
                 for s in seeds]
    for d in seed_dirs:
        os.makedirs(d, exist_ok=True)

    lr_fn = (lambda step: learning_rate * (lr_decay ** (step / lr_decay_steps)))
    best = [{"iteration": 1, "accuracy": 0.0, "exact_match": 0.0}
            for _ in seeds]
    start_iteration = 1
    if resume:
        states, best, done = load_campaign_checkpoints(seed_dirs, states, k)
        # Replay each seed's permutation stream past the consumed blocks so
        # the resumed run sees exactly the data order the uninterrupted run
        # would have.
        for stream in streams:
            for _ in range(done // k):
                next(stream)
        start_iteration = done + 1
        logger.info("Resumed %d-seed campaign at iteration %d "
                    "(per-seed best EM: %s).", n_seeds, done,
                    ["%.2f" % b["exact_match"] for b in best])

    stacked = stack_train_states(states)
    chunk_fn = make_multiseed_train_chunk(
        config, optimizer, weight_target_loss=weight_target_loss)

    logger.info("Multi-seed training: %d seeds %s in one vmapped program, "
                "%d examples on device (stored once), %d-step chunks.",
                n_seeds, tuple(seeds), training_set.num_examples, k)

    def log_metrics(iteration, metrics, steps_per_s):
        # metrics leaves are [n_seeds] (last step of the chunk, per seed).
        for i, s in enumerate(seeds):
            logger.info(
                "Iteration %08d [seed %d], loss %8.4f, accuracy %5.2f, "
                "exact match %5.2f, learning_rate %.5f, aux. accuracy "
                "target pos %5.2f, steps/s %6.2f"
                % (iteration, s, metrics["loss"][i], metrics["accuracy"][i],
                   metrics["exact_match"][i], lr_fn(iteration - 1),
                   metrics["aux_accuracy"][i], steps_per_s))

    def run_evaluation(iteration, stacked_state):
        for i, s in enumerate(seeds):
            state_i = slice_train_state(stacked_state, i)
            accuracy, exact_match, target_accuracy = evaluate(
                dev_set, state_i.params, config,
                max_decoding_steps=max_decoding_steps,
                batch_size=evaluation_batch_size,
                max_examples_to_evaluate=max_testing_examples,
                decode_dtype=decode_dtype)
            logger.info(
                "  Evaluation [seed %d] Accuracy: %5.2f Exact Match: %5.2f "
                " Target Accuracy: %5.2f"
                % (s, accuracy, exact_match, target_accuracy))
            is_best = exact_match > best[i]["exact_match"]
            if is_best:
                best[i] = {"iteration": iteration, "accuracy": accuracy,
                           "exact_match": exact_match}
            ckpt.save_checkpoint(
                seed_dirs[i], state_i, is_best=is_best,
                best_iteration=best[i]["iteration"],
                best_accuracy=best[i]["accuracy"],
                best_exact_match=best[i]["exact_match"])

    iteration = start_iteration
    window_start = time.time()
    window_steps = 0
    while iteration <= max_training_iterations:
        steps = min(k, max_training_iterations - iteration + 1)
        pairs = []
        for stream in streams:
            block, spec = next(stream)
            pairs.append((block[:steps], spec))
        segments = pairs[0][1]
        if steps < k and segments is not None:
            # Tail chunk shorter than the stream's spec: fall back to
            # full-width segments for the final partial chunk.
            segments = None
        blocks = np.stack([b for b, _ in pairs])
        stacked, metrics = chunk_fn(stacked, data, blocks, segments)
        end_iteration = iteration + steps - 1
        window_steps += steps
        if end_iteration % print_every == 0:
            last = jax.device_get(
                jax.tree.map(lambda m: m[:, -1], metrics))
            elapsed = time.time() - window_start
            # steps/s counts OPTIMIZER steps per seed; multiply by n_seeds
            # for campaign throughput.
            steps_per_s = window_steps / max(elapsed, 1e-9)
            window_start, window_steps = time.time(), 0
            log_metrics(end_iteration, last, steps_per_s)
        if end_iteration % evaluate_every == 0:
            run_evaluation(end_iteration, stacked)
            window_start, window_steps = time.time(), 0
        iteration = end_iteration + 1
    logger.info("Finished training.")
    return stacked, best
