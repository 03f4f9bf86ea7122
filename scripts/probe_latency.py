"""Separate tunnel dispatch latency / host->device bandwidth from device
compute time for the bench decode workload.

Round-4 motivation: after the long tunnel outage, bench.py decode throughput
dropped ~7x vs the round-2 numbers (71k vs 493-539k ex/s) with early-exit ==
fixed-120, the signature of per-call overhead (dispatch round-trips or the
~9.4 MB/batch host->device transfer) dominating rather than decoder compute.
This probe times each piece in isolation:

  1. dispatch round-trip: tiny jitted op, block_until_ready, repeated
  2. host->device bandwidth: device_put of the real bench batch arrays
  3. decode compute: the bench decoder on DEVICE-RESIDENT inputs
  4. decode end-to-end: same decoder fed from host numpy (what bench.py does)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print("devices: {} ({:.1f}s)".format(dev, time.time() - t0), flush=True)

    # -- 1. dispatch round-trip latency ------------------------------------
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    f(x).block_until_ready()
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    print("dispatch round-trip: min {:.2f} ms, median {:.2f} ms".format(
        times[0] * 1e3, times[10] * 1e3), flush=True)

    # -- 2. host->device bandwidth -----------------------------------------
    batch = np.random.rand(4096, 6, 6, 16).astype(np.float32)  # 9.4 MB
    jax.device_put(batch).block_until_ready()
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.device_put(batch).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    mb = batch.nbytes / 1e6
    print("h2d {:.1f} MB: min {:.1f} ms ({:.0f} MB/s), median {:.1f} ms "
          "({:.0f} MB/s)".format(mb, times[0] * 1e3, mb / times[0],
                                 times[3] * 1e3, mb / times[3]),
          flush=True)

    # -- 3/4. decode compute vs end-to-end ---------------------------------
    from bench import _real_workload, MAX_DECODING_STEPS
    from multimodal_seq2seq_gscan_tpu.decode.greedy import make_greedy_decoder

    workload = _real_workload()
    if workload is None:
        print("no trained artifacts; skipping decode probes", flush=True)
        return
    config, params, batches, counts, _ = workload
    decoder = make_greedy_decoder(config, MAX_DECODING_STEPS, early_exit=True,
                                  exit_check_every=8)
    out = decoder(params, *batches[0])
    jax.block_until_ready(out.tokens)

    dev_batches = [tuple(jax.device_put(a) for a in b) for b in batches]
    jax.block_until_ready(dev_batches)
    n = 3 * sum(counts)
    for name, src in (("device-resident", dev_batches), ("host-numpy",
                                                         batches)):
        rates = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                for b in src:
                    out = decoder(params, *b)
            jax.block_until_ready(out.tokens)
            rates.append(n / (time.perf_counter() - t0))
        print("decode {}: best {:.0f} ex/s, mean {:.0f} ex/s".format(
            name, max(rates), sum(rates) / len(rates)), flush=True)


if __name__ == "__main__":
    main()
