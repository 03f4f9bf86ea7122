"""Interleaved A/B comparison of greedy-decode variants on DEVICE-RESIDENT
inputs.

Why this exists (round 4): the Aug 19 between-rounds session ran bench.py
five times back-to-back and the SAME config measured anywhere from 27k to
498k ex/s best-window — the axon tunnel's host->device bandwidth was varying
by ~10x run-to-run (scripts/probe_latency.py measured ~100 MB/s h2d, so the
9.4 MB situations tensor per host-fed batch dominates everything). Two fixes
here:

  1. inputs are jax.device_put ONCE before timing, so the timed region is
     decoder compute + dispatch, not tunnel bandwidth;
  2. variants are timed INTERLEAVED (round-robin windows in one process), so
     slow environment epochs hit every variant equally and the per-variant
     MEDIAN window is a fair paired comparison.

Prints one human table plus one JSON line with per-variant median/best/mean.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("AB_REPEATS", 25))   # sweeps per window
WINDOWS = int(os.environ.get("AB_WINDOWS", 12))   # windows per variant
VARIANTS = os.environ.get(
    "AB_VARIANTS", "ee8,ee16,ee32,fixed,bf16ee32,pallas8").split(",")
# CHAIN > 0: amortize per-dispatch overhead by running CHAIN back-to-back
# decodes inside ONE compiled call. The first chained measurement (round 4)
# was forced by a ~58 ms per-dispatch tunnel overhead that pinned EVERY
# variant — fixed-120 and early-exit-8 alike — at the same ~70k ex/s, making
# un-chained A/B blind to real compute differences.
CHAIN = int(os.environ.get("AB_CHAIN", 0))


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def main():
    import jax

    from bench import MAX_DECODING_STEPS, _exact_match, _real_workload
    from multimodal_seq2seq_gscan_tpu.decode.greedy import make_greedy_decoder

    cache_dir = os.environ.get(
        "BENCH_CACHE_DIR", os.path.expanduser("~/.cache/jax_gscan"))
    if cache_dir:
        # Chained-decoder compiles run minutes each; amortize across runs.
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    workload = _real_workload()
    if workload is None:
        print("no trained artifacts; aborting", file=sys.stderr)
        sys.exit(1)
    config, params, batches, counts, target_lists = workload

    spec = {
        "ee8": dict(early_exit=True, exit_check_every=8),
        "ee16": dict(early_exit=True, exit_check_every=16),
        "ee32": dict(early_exit=True, exit_check_every=32),
        "ee64": dict(early_exit=True, exit_check_every=64),
        "fixed": dict(early_exit=False),
        "bf16ee8": dict(early_exit=True, exit_check_every=8,
                        compute_dtype="bfloat16"),
        "bf16ee32": dict(early_exit=True, exit_check_every=32,
                         compute_dtype="bfloat16"),
        "bf16fixed": dict(early_exit=False, compute_dtype="bfloat16"),
        "mixed32": dict(early_exit=True, exit_check_every=32,
                        compute_dtype="bfloat16_mixed"),
        "keys32": dict(early_exit=True, exit_check_every=32,
                       compute_dtype="bfloat16_keys"),
        "pallas8": dict(early_exit=True, exit_check_every=8,
                        decode_impl="pallas"),
        "pallas32": dict(early_exit=True, exit_check_every=32,
                         decode_impl="pallas"),
    }
    names = [n for n in VARIANTS if n in spec]

    dev_batches = [tuple(jax.device_put(a) for a in b) for b in batches]
    jax.block_until_ready(dev_batches)

    from bench import make_chained_decoder

    decoders, ems = {}, {}
    for name in names:
        t0 = time.time()
        base = make_greedy_decoder(config, MAX_DECODING_STEPS, **spec[name])
        outs = [base(params, *b) for b in dev_batches]  # compile + EM pass
        jax.block_until_ready(outs[-1].tokens)
        if target_lists is not None:
            ems[name] = _exact_match(config, outs, target_lists)
        if CHAIN > 1:
            opts = None
            if name.startswith("pallas") and jax.default_backend() == "tpu":
                opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
            decoders[name] = make_chained_decoder(base, CHAIN,
                                                  compiler_options=opts)
            jax.block_until_ready(decoders[name](params, *dev_batches[0]))
        else:
            decoders[name] = base
        print("compiled {} in {:.0f}s (dev EM {:.2f}%)".format(
            name, time.time() - t0, ems.get(name, float("nan"))),
            file=sys.stderr, flush=True)

    # Tiny dependent device->host reads of EVERY output buffer:
    # block_until_ready alone has been observed returning early on the axon
    # backend, and blocking on tokens alone can return before the attention
    # stacks finish materializing (see bench.fence).
    from bench import fence as _fence

    per_call = (CHAIN if CHAIN > 1 else 1)
    if CHAIN > 1:
        def run_window(fn):
            for b in dev_batches:
                out = fn(params, *b)
            _fence(out)
    else:
        def run_window(fn):
            for _ in range(REPEATS):
                for b in dev_batches:
                    out = fn(params, *b)
            _fence(out)

    n_examples = (per_call if CHAIN > 1 else REPEATS) * sum(counts)
    rates = {name: [] for name in names}
    for w in range(WINDOWS):
        for name in names:
            start = time.perf_counter()
            run_window(decoders[name])
            rates[name].append(n_examples / (time.perf_counter() - start))
        print("round {:2d}: ".format(w) + "  ".join(
            "{}={:6.0f}".format(n, rates[n][-1] / 1e0) for n in names),
            file=sys.stderr, flush=True)

    summary = {}
    print("{:10s} {:>10s} {:>10s} {:>10s} {:>8s}".format(
        "variant", "median", "best", "mean", "EM%"))
    for name in names:
        r = rates[name]
        summary[name] = {"median": round(median(r), 1),
                         "best": round(max(r), 1),
                         "mean": round(sum(r) / len(r), 1),
                         "em": round(ems.get(name, -1.0), 2)}
        print("{:10s} {:>10.0f} {:>10.0f} {:>10.0f} {:>8.2f}".format(
            name, summary[name]["median"], summary[name]["best"],
            summary[name]["mean"], ems.get(name, -1.0)))
    print(json.dumps({"decode_ab": summary, "repeats": REPEATS,
                      "windows": WINDOWS, "unit": "examples/s"}))


if __name__ == "__main__":
    main()
