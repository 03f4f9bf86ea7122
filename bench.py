"""Benchmark: batched greedy decode throughput with a TRAINED model on REAL
gSCAN examples.

Headline metric vs the reference's batch-1 decode loop: 21.35 ex/s on a CUDA
GPU (2001 examples / 93.74 s, reference training log adverb_run_1.txt tail).
Here the same workload — trained compositional-splits model, real dev-split
commands/situations, max 120 decoding steps — runs fully batched under one
compiled program.

Inputs (overridable via env):
  BENCH_DATA       directory with dataset.txt + training vocab files
                   (default: data/bench_fixture, a committed dev-split
                   subset; falls back to data/compositional_splits_r10)
  BENCH_CHECKPOINT trained checkpoint (default:
                   runs/adverb_r10_seed66/model_best.msgpack)

Reports the early-exit bfloat16_keys decode number as the headline — the
fastest EM-NEUTRAL variant: bf16 storage of the projected attention keys
only, all arithmetic f32 (TPU dots truncate key operands to bf16 regardless).
Validated round 5 on all 9 splits x 2000 examples vs float32: identical EM
on 7/9 splits, max delta -0.10 pp on the other two, fixture dev EM 99.29 vs
f32's 99.27 (documentation/perf_round5.txt). It is NOT bit-identical
(56/18000 token-level prediction mismatches), so --decode_dtype for CLI
evaluation defaults to float32 for strict run-to-run reproducibility — the
headline is one flag away (--decode_dtype=bfloat16_keys). The float32 and
remaining bf16 variants, the fixed-120-step (no early exit) number, and the
dev exact match of every decoded variant go to stderr so BENCH and
PERFORMANCE.md can't drift apart. Falls back to synthetic data/params
(metric name suffixed "_synthetic") only if the artifacts are missing.

Methodology (round 5, supersedes the round-2/3/4 figures): batches are
jax.device_put ONCE and each timed call runs BENCH_CHAIN back-to-back full
decodes inside one compiled program (lax.scan whose next-iteration input
depends on the previous iteration's tokens AND both attention stacks), with
the median window reported. Two measured reasons (scripts/probe_latency.py,
documentation/perf_round4.txt): (a) the axon tunnel's host->device bandwidth
swings ~10x (down to ~100 MB/s), so host-fed timing measures the tunnel, not
the decoder; (b) per-dispatch overhead (~58 ms during bad tunnel epochs)
pinned EVERY variant at the same rate, and blocking on the tokens output
alone can return before the [B, S, M] attention buffers finish
materializing, which inflated the round-2/3 "best window" figures
(382k-539k ex/s) — the chained number is sustained throughput with every
output buffer forced. Round-5 correction: the round-4 chain's carry read
only the token buffer, so XLA dead-coded the attention stacks out of the
chain body (0 occurrences in the optimized HLO); the guard now folds one
element of each attention stack into the next iteration's input and run()
returns all three buffers, restoring the materialization the methodology
note promises (tests/test_bench_fixture.py asserts the buffers survive in
the optimized HLO).

Wedge-proofing: the measurement runs in a KILLABLE CHILD process
(BENCH_CHILD=1) with a host-side watchdog in the parent — a tunnel wedge
blocks inside a single C++ call where a SIGALRM handler cannot fire, so an
in-process alarm is not a real deadline. The child prints the headline JSON
line as soon as the headline variant is measured (the remaining variants
are stderr-only diagnostics), so a wedge mid-variants costs nothing. The
child also wires the persistent XLA compilation cache (BENCH_CACHE_DIR,
default ~/.cache/jax_gscan) so the ~6-10 min chained-decoder compiles
amortize across driver captures instead of re-paying every run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_EXAMPLES_PER_SECOND = 21.35  # 2001 ex / 93.74 s, batch-1 reference
# Bound on FIRST device contact. The axon tunnel can go down for hours, in
# which state jax.devices() blocks indefinitely (round 3 lost its entire
# driver bench slot to rc=124 with no JSON line, BENCH_r03.json). A dead
# tunnel must degrade to a parseable *_synthetic CPU number, never a hang.
DEVICE_PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", 150))
MAX_DECODING_STEPS = 120              # all_experiments.sh test setting
# Default from the measured batch sweep (documentation/perf_round2.txt):
# 512 -> 165k ex/s, 1024 -> 226k, 2048 -> 373k, 4096 -> 382k (early-exit).
BATCH_SIZE = int(os.environ.get("BENCH_BATCH_SIZE", 4096))
MAX_EXAMPLES = int(os.environ.get("BENCH_MAX_EXAMPLES", 4096))
# Early-exit done-check block size (decoder steps per lax.cond block).
# 32 measured fastest (133.7k/137.6k/137.9k ex/s at 8/16/32, decode_ab.py).
EXIT_CHECK_EVERY = int(os.environ.get("BENCH_EXIT_CHECK_EVERY", 32))
# Full decodes per compiled call: amortizes per-dispatch tunnel overhead.
BENCH_CHAIN = int(os.environ.get("BENCH_CHAIN", 30))


def _log(msg):
    print(msg, file=sys.stderr)


def _device_backend_alive():
    """True iff the default jax backend answers a tiny computation within
    DEVICE_PROBE_TIMEOUT_S. Probed in a SUBPROCESS because a wedged axon
    tunnel blocks inside jax.devices() with no Python-level escape; the
    parent process must stay un-initialized so it can still flip to the CPU
    backend afterwards (jax.config.update is a no-op once a backend exists).
    """
    code = ("import os, jax, jax.numpy as jnp; "
            "p = os.environ.get('GSCAN_JAX_PLATFORM'); "
            "p and jax.config.update('jax_platforms', p); "
            "print(jax.devices()); "
            "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready(); "
            "print('PROBE_OK')")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=DEVICE_PROBE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        _log("bench: device probe timed out after {}s — backend unreachable"
             .format(DEVICE_PROBE_TIMEOUT_S))
        return False
    if proc.returncode == 0 and "PROBE_OK" in proc.stdout:
        return True
    _log("bench: device probe failed (rc={}): {}".format(
        proc.returncode, (proc.stderr or proc.stdout).strip()[-400:]))
    return False


def make_chained_decoder(decoder, k, compiler_options=None):
    """One compiled call = ``k`` sequential full decodes of a batch.

    The scan carry is the previous decode's OUTPUT BUFFERS, and the next
    decode's input depends on a guard folding one element of EACH of them —
    the token ids and both [B, S, M] attention stacks (``tok[0,0] < 0`` or
    ``attn[0,0,0] < -1`` — never true for softmax weights, but not provable
    at compile time) — so XLA can neither loop-hoist the body nor dead-code
    the attention stacks the real evaluation path materializes every call.
    ``run`` returns all three final buffers so the last iteration's stacks
    stay live too. (The round-4 version read only the token carry; the
    optimized HLO showed XLA had eliminated the attention-stack
    materialization from the whole chain, understating buffer traffic —
    every chained number measured before round 5 has that distortion.)
    This turns per-call dispatch overhead (measured at ~58 ms through a
    degraded tunnel — larger than the decode itself) into a 1/k term.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    # A nested jit may not carry compiler_options (the pallas variant's
    # scoped-VMEM bump) — unwrap it and hoist the options out here.
    decoder = getattr(decoder, "__wrapped__", decoder)

    def run(params, input_ids, input_lengths, situations, target_positions):
        def body(carry, _):
            tok, attn_cmd, attn_sit = carry
            dep = jnp.logical_or(
                tok[0, 0] < 0,
                (attn_cmd[0, 0, 0] + attn_sit[0, 0, 0]).astype(jnp.float32)
                < -1.0)
            ids = jnp.where(dep, input_ids + 1, input_ids)
            out = decoder(params, ids, input_lengths, situations,
                          target_positions)
            return (out.tokens, out.attention_commands,
                    out.attention_situations), None

        out0 = decoder(params, input_ids, input_lengths, situations,
                       target_positions)
        carry, _ = lax.scan(
            body, (out0.tokens, out0.attention_commands,
                   out0.attention_situations), None, length=k - 1)
        return carry

    return jax.jit(run, compiler_options=compiler_options)


def fence(out):
    """End-of-measurement fence: tiny device->host reads instead of (only)
    block_until_ready — on the axon backend block_until_ready has been
    observed returning early in some tunnel states (a chained 30-decode
    program "finished" in 0.68 ms), and a real dependent read cannot lie.
    One read per OUTPUT BUFFER (tokens + both attention stacks): blocking on
    tokens alone can return before the attention buffers finish
    materializing. A few bytes each, so tunnel bandwidth doesn't contaminate
    timing."""
    import jax

    if hasattr(out, "tokens"):
        arrs = (out.tokens, out.attention_commands, out.attention_situations)
    elif isinstance(out, (tuple, list)):
        arrs = out
    else:
        arrs = (out,)
    for a in arrs:
        np.asarray(jax.device_get(a[(slice(0, 1),) * a.ndim]))


def _time_decoder(decoder, params, batches, counts, windows=5,
                  chain=None, compiler_options=None):
    """counts[i] = REAL examples in batch i (excludes zero-padded rows the
    final batch may carry), so the reported examples/s is not inflated.

    Inputs are device_put once; each window is one chained call of ``chain``
    full decodes; the MEDIAN window is reported (with best/mean logged).
    See the module docstring for why this supersedes the round-2/3 host-fed
    best-of-windows methodology."""
    import jax

    chain = BENCH_CHAIN if chain is None else chain
    outs = [decoder(params, *b) for b in batches]  # compile + EM outputs
    jax.block_until_ready(outs[-1].tokens)
    dev_batches = [tuple(jax.device_put(a) for a in b) for b in batches]
    jax.block_until_ready(dev_batches)
    fn = (make_chained_decoder(decoder, chain, compiler_options)
          if chain > 1 else decoder)
    last = fn(params, *dev_batches[0])  # compile the chained program
    jax.block_until_ready(last)
    _fence = fence

    n_examples = chain * sum(counts)
    rates = []
    for _ in range(windows):
        start = time.perf_counter()
        for b in dev_batches:
            last = fn(params, *b)
        _fence(last)
        rates.append(n_examples / (time.perf_counter() - start))
    rates.sort()
    median = rates[len(rates) // 2]
    if len(rates) > 1:
        _log("bench:   windows median {:.0f} / best {:.0f} / mean {:.0f} "
             "ex/s (chain {})".format(median, max(rates),
                                      sum(rates) / len(rates), chain))
    return median, outs


def _real_workload():
    """(config, params, batches, target_id_lists) from trained artifacts."""
    import jax

    from multimodal_seq2seq_gscan_tpu.data.dataset import GroundedScanDataset
    from multimodal_seq2seq_gscan_tpu.models import ModelConfig
    from multimodal_seq2seq_gscan_tpu.train import checkpoint as ckpt
    from multimodal_seq2seq_gscan_tpu.train.state import (
        create_train_state, make_optimizer)

    data_dir = os.environ.get("BENCH_DATA", "")
    if not data_dir:
        for candidate in ("data/bench_fixture", "data/compositional_splits_r10",
                          "data/compositional_splits"):
            if os.path.isfile(os.path.join(candidate, "dataset.txt")):
                data_dir = candidate
                break
    ckpt_path = os.environ.get("BENCH_CHECKPOINT", "")
    if not ckpt_path:
        for candidate in ("data/bench_fixture/model_best.msgpack",
                          "runs/r2_adverb_seed66/model_best.msgpack",
                          "runs/adverb_r10_seed66/model_best.msgpack"):
            if os.path.isfile(candidate):
                ckpt_path = candidate
                break
    if not data_dir or not os.path.isfile(ckpt_path):
        return None
    dataset = GroundedScanDataset(
        os.path.join(data_dir, "dataset.txt"), data_dir, k=0, split="dev",
        input_vocabulary_file="training_input_vocab.txt",
        target_vocabulary_file="training_target_vocab.txt",
        generate_vocabulary=False)
    dataset.read_dataset(max_examples=MAX_EXAMPLES)
    _log("bench: {} dev examples from {}".format(dataset.num_examples,
                                                 data_dir))

    config = ModelConfig(
        input_vocabulary_size=dataset.input_vocabulary_size,
        target_vocabulary_size=dataset.target_vocabulary_size,
        num_cnn_channels=dataset.image_channels, embedding_dimension=25,
        encoder_hidden_size=100, decoder_hidden_size=100, cnn_kernel_size=7,
        cnn_hidden_num_channels=50, auxiliary_task=False)
    template = create_train_state(jax.random.PRNGKey(0), config,
                                  make_optimizer())
    state, meta = ckpt.load_checkpoint(ckpt_path, template)
    _log("bench: checkpoint {} (iteration {}, best dev EM {})".format(
        ckpt_path, meta.get("iteration"), meta.get("best_exact_match")))

    batches, counts, target_lists = [], [], []
    for batch, idx, _, _ in dataset.get_data_iterator(
            batch_size=BATCH_SIZE, pad_to_full_batch=True,
            with_representations=False):
        batches.append((batch.input_ids, batch.input_lengths,
                        batch.situations, batch.target_positions))
        counts.append(len(idx))  # real rows; the final batch may be padded
        target_lists.append([dataset._target_ids[int(i)] for i in idx])
        if sum(counts) >= MAX_EXAMPLES:
            break
    return config, state.params, batches, counts, target_lists


def _synthetic_workload():
    import jax

    from multimodal_seq2seq_gscan_tpu.models import (
        ModelConfig, init_model_params)

    grid, channels = 6, 16
    config = ModelConfig(
        input_vocabulary_size=21, target_vocabulary_size=9,
        num_cnn_channels=channels, embedding_dimension=25,
        encoder_hidden_size=100, decoder_hidden_size=100, cnn_kernel_size=7,
        cnn_hidden_num_channels=50, auxiliary_task=False)
    params = init_model_params(jax.random.PRNGKey(0), config)
    rng = np.random.RandomState(0)
    t_in = 16
    input_lengths = rng.randint(5, t_in + 1, size=BATCH_SIZE).astype(np.int32)
    input_ids = np.zeros((BATCH_SIZE, t_in), dtype=np.int32)
    for i in range(BATCH_SIZE):
        input_ids[i, 0] = 1
        input_ids[i, 1:input_lengths[i] - 1] = rng.randint(
            3, 21, size=input_lengths[i] - 2)
        input_ids[i, input_lengths[i] - 1] = 2
    situations = (rng.rand(BATCH_SIZE, grid, grid, channels) < 0.1).astype(
        np.float32)
    target_positions = np.zeros((BATCH_SIZE,), dtype=np.int32)
    batches = [(input_ids, input_lengths, situations, target_positions)] * 4
    return config, params, batches, [BATCH_SIZE] * 4, None


def _exact_match(config, outs, target_lists):
    from multimodal_seq2seq_gscan_tpu.decode.greedy import (
        strip_output_sequences)

    matched = total = 0
    for out, targets in zip(outs, target_lists):
        sequences, _ = strip_output_sequences(out, config.target_eos_idx)
        for seq, target in zip(sequences, targets):
            total += 1
            if seq == target[1:-1].tolist():
                matched += 1
    return 100.0 * matched / max(total, 1)


def _emit(metric, rate):
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 2),
        "unit": "examples/s",
        "vs_baseline": round(rate / BASELINE_EXAMPLES_PER_SECOND, 2),
    }), flush=True)


def main():
    if os.environ.get("BENCH_CHILD") == "1":
        _child_main()
        return

    global BATCH_SIZE, MAX_EXAMPLES
    degraded = not _device_backend_alive()
    if degraded:
        # Dead tunnel: flip THIS process to the CPU backend before any jax
        # use (env vars are too late under the sitecustomize preload; the
        # config update is the documented escape hatch) and shrink the
        # workload so a parseable number still lands within ~2 min.
        import jax
        jax.config.update("jax_platforms", "cpu")
        BATCH_SIZE = min(BATCH_SIZE, 256)
        MAX_EXAMPLES = min(MAX_EXAMPLES, 256)
        _log("bench: DEGRADED MODE — device backend unreachable, running the "
             "synthetic workload on CPU (batch {})".format(BATCH_SIZE))
        from multimodal_seq2seq_gscan_tpu.decode.greedy import (
            make_greedy_decoder)
        config, params, batches, counts, _ = _synthetic_workload()
        early = make_greedy_decoder(config, MAX_DECODING_STEPS,
                                    early_exit=True,
                                    exit_check_every=EXIT_CHECK_EVERY)
        early_rate, _ = _time_decoder(early, params, batches, counts,
                                      windows=1, chain=1)
        _emit("greedy_decode_throughput_synthetic", early_rate)
        return

    # The probe only guards a DEAD tunnel; a live tunnel can still wedge
    # mid-run (observed Aug 19: a healthy bench completed, the next one hung
    # 8+ min at 1% CPU) — and a wedge blocks inside a single C++ call, where
    # an in-process SIGALRM handler never fires. So the measurement runs in
    # a killable CHILD process with a host-side watchdog here. The child
    # prints the headline JSON line as soon as the headline variant is
    # measured and then keeps going on the stderr-only variants, so a wedge
    # mid-variants costs nothing; a wedge before the headline lands becomes
    # an explicit *_wedged line — never an rc=124 with no JSON.
    deadline_s = int(os.environ.get("BENCH_DEADLINE_S", 480))
    env = dict(os.environ, BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE, text=True)  # stderr inherited: live logs
    lines = []

    def _drain():
        for line in proc.stdout:
            lines.append(line)

    import threading
    reader = threading.Thread(target=_drain, daemon=True)
    reader.start()
    try:
        proc.wait(timeout=deadline_s)
    except subprocess.TimeoutExpired:
        _log("bench: WATCHDOG deadline ({}s) hit — killing the measurement "
             "child (pid {})".format(deadline_s, proc.pid))
        proc.kill()
        proc.wait()
    reader.join(timeout=10)
    for line in lines:
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            print(line, flush=True)
            return
    _emit("greedy_decode_throughput_wedged", 0.0)


def _child_main():
    """The actual measurement (run under the parent watchdog)."""
    import jax

    if os.environ.get("GSCAN_JAX_PLATFORM"):
        # Same escape hatch as cli/seq2seq.py: force a backend before first
        # jax use (the sitecustomize preload makes JAX_PLATFORMS too late).
        # Lets the full non-degraded bench path run on CPU for testing.
        jax.config.update("jax_platforms", os.environ["GSCAN_JAX_PLATFORM"])
    cache_dir = os.environ.get(
        "BENCH_CACHE_DIR", os.path.expanduser("~/.cache/jax_gscan"))
    if cache_dir:
        # Persistent compilation cache: the chained-decoder compiles took
        # 367-623 s in the round-4 sessions — without the cache every driver
        # capture re-pays them and barely fits its budget.
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    try:
        workload = _real_workload()
        if workload is None:
            _log("bench: trained artifacts missing — synthetic fallback")
    except Exception as exc:  # e.g. checkpoint/vocab artifacts desynced
        _log("bench: failed to load trained artifacts ({}: {}) — "
             "synthetic fallback".format(type(exc).__name__, exc))
        workload = None
    synthetic = workload is None
    if synthetic:
        workload = _synthetic_workload()
    metric = "greedy_decode_throughput"
    if synthetic:
        metric += "_synthetic"
    _run_variants(metric, *workload)


def _run_variants(metric, config, params, batches, counts, target_lists):
    from multimodal_seq2seq_gscan_tpu.decode.greedy import (
        DEFAULT_DECODE_IMPL, make_greedy_decoder)

    # Headline: the fastest EM-neutral decode (early exit, default impl,
    # bfloat16_keys — see the module docstring for the 9-split round-5
    # evidence). CLI evaluation defaults to DEFAULT_DECODE_DTYPE (float32,
    # bit-reproducible); the headline config is one --decode_dtype flag
    # away. Everything after the _emit below is stderr-only diagnostics
    # for PERFORMANCE.md (including the float32 rate + EM).
    headline_dtype = os.environ.get("BENCH_DECODE_DTYPE", "bfloat16_keys")
    dtype_arg = None if headline_dtype == "float32" else headline_dtype
    early = make_greedy_decoder(config, MAX_DECODING_STEPS, early_exit=True,
                                exit_check_every=EXIT_CHECK_EVERY,
                                compute_dtype=dtype_arg)
    early_rate, outs = _time_decoder(early, params, batches, counts)
    _emit(metric, early_rate)
    _log("bench: [{}/{}] early-exit {:.0f} ex/s (headline)".format(
        DEFAULT_DECODE_IMPL, headline_dtype, early_rate))
    if target_lists is not None:
        _log("bench: dev exact match of decoded output: {:.2f}%".format(
            _exact_match(config, outs, target_lists)))

    try:
        fixed = make_greedy_decoder(config, MAX_DECODING_STEPS,
                                    early_exit=False, compute_dtype=dtype_arg)
        fixed_rate, _ = _time_decoder(fixed, params, batches, counts)
        _log("bench: [{}/{}] fixed-120 {:.0f} ex/s".format(
            DEFAULT_DECODE_IMPL, headline_dtype, fixed_rate))
    except Exception as exc:
        _log("bench: fixed-120 variant failed ({}: {})".format(
            type(exc).__name__, exc))
    # Every decode dtype, rate + EM, so BENCH and PERFORMANCE.md can't drift
    # apart and the f32-vs-bf16 quality ledger is always on record.
    for dtype in ("float32", "bfloat16_keys", "bfloat16_mixed", "bfloat16"):
        if dtype == headline_dtype:
            continue
        try:
            variant = make_greedy_decoder(
                config, MAX_DECODING_STEPS, early_exit=True,
                exit_check_every=EXIT_CHECK_EVERY,
                compute_dtype=None if dtype == "float32" else dtype)
            rate, var_outs = _time_decoder(variant, params, batches, counts)
            msg = "bench: [{}/{}] early-exit {:.0f} ex/s".format(
                DEFAULT_DECODE_IMPL, dtype, rate)
            if target_lists is not None:
                msg += ", dev EM {:.2f}%".format(
                    _exact_match(config, var_outs, target_lists))
            _log(msg)
        except Exception as exc:
            _log("bench: [{}] decoder failed ({}: {})".format(
                dtype, type(exc).__name__, exc))
    # Measure the non-default decoder-step implementation too, so BENCH and
    # PERFORMANCE.md record both sides of the xla/pallas choice.
    other_impl = "pallas" if DEFAULT_DECODE_IMPL == "xla" else "xla"
    try:
        import jax
        other = make_greedy_decoder(config, MAX_DECODING_STEPS,
                                    early_exit=True, decode_impl=other_impl,
                                    exit_check_every=EXIT_CHECK_EVERY)
        opts = ({"xla_tpu_scoped_vmem_limit_kib": "32768"}
                if other_impl == "pallas" and jax.default_backend() == "tpu"
                else None)
        other_rate, _ = _time_decoder(other, params, batches, counts,
                                      compiler_options=opts)
        _log("bench: [{}] early-exit {:.0f} ex/s".format(other_impl,
                                                         other_rate))
    except Exception as exc:
        _log("bench: [{}] decoder failed ({}: {})".format(
            other_impl, type(exc).__name__, exc))
    return early_rate


if __name__ == "__main__":
    main()
