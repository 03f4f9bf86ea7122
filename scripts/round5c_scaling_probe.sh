#!/bin/bash
# Round-5c: multi-seed vmap SCALING probes (the honest follow-up to the
# refuted "latency-bound, seeds nearly free" hypothesis — PERFORMANCE.md
# round-5 section). Measures steady-state steps/s, same session/tunnel
# epoch, for:
#   n=1 control (plain single-seed path)
#   n=2 / n=3 / n=6 stacked-seed vmap campaigns
# Each probe: full-width, batch 200, steps_per_execution=50, 2k iters,
# no mid-run evals. Fits time/step ~= a + b*n if the scaling is affine.
set -uo pipefail
cd "$(dirname "$0")/.."

L=${R5C_LOG:-documentation/perf_round5.txt}
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=${R5C_DATA:-data/compositional_splits_r10}
ITERS=${R5C_ITERS:-2000}
BATCH=${R5C_BATCH:-200}
PRINT=${R5C_PRINT:-500}
CACHE=${R5C_CACHE:-$HOME/.cache/jax_gscan}
OUT=${R5C_OUT:-/tmp/r5c_probes}
EXTRA=${R5C_EXTRA:-}

mkdir -p "$OUT"
echo "--- multiseed vmap scaling probes ($(date)) ---" >> "$L"

probe () {  # name seed_flags...
  local name=$1; shift
  if [ -f "$OUT/$name.done" ]; then return; fi
  $S --mode=train --data_directory="$D" --output_directory="$OUT/$name" \
    --conditional_attention --no_auxiliary_task \
    --training_batch_size="$BATCH" \
    --max_training_iterations="$ITERS" --generate_vocabularies \
    --evaluate_every=1000000 --print_every="$PRINT" \
    --max_decoding_steps=120 \
    --compilation_cache_dir="$CACHE" $EXTRA "$@" > "$OUT/$name.log" 2>&1
  # Steady-state = the LAST printed window (first window pays compile).
  local line
  line=$(grep "steps/s" "$OUT/$name.log" | tail -1)
  echo "probe $name: ${line##*steps/s}" | tr -s ' ' >> "$L"
  touch "$OUT/$name.done"
}

probe n1 --seed=66
probe n2 --seeds=66,49
probe n3 --seeds=66,49,50
probe n6 --seeds=66,49,50,67,82,84
echo "--- scaling probes done ($(date)) ---" >> "$L"
