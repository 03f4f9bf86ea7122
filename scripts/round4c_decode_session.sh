#!/bin/bash
# Round-4c TPU decode session: measure the bfloat16_mixed decode variant
# (bf16 loop + f32 output head, decode/greedy.py) and gather the evidence
# needed to decide whether it can become the shipped default:
#
#   1. Interleaved chained A/B at batch 4096 on the trained fixture:
#      ee32 (current f32 default) vs mixed32 vs bf16ee32 — throughput AND
#      fixture dev EM per variant (scripts/decode_ab.py).
#   2. Sequence-identity at scale through the REAL test-mode CLI: decode
#      dev+test (2000 examples each) of the round-4 full-width control's
#      best checkpoint under --decode_dtype=float32 and =bfloat16_mixed,
#      then diff the predict.json outputs field-by-field
#      (scripts/compare_predictions.py). The default may only flip if
#      prediction_mismatches == 0 everywhere.
#
# Strictly sequential (one TPU client), resumable, env-overridable for the
# CPU smoke test (tests/test_session_script.py).
set -uo pipefail
cd "$(dirname "$0")/.."

L=${R4C_LOG:-documentation/perf_round4.txt}
S="python -m multimodal_seq2seq_gscan_tpu.cli.seq2seq"
D=${R4C_DATA:-data/compositional_splits_r10}
RUN=${R4C_RUN:-runs/r4_full_seed66}
SPLITS=${R4C_SPLITS:-dev,test}
TMPD=${R4C_TMP:-/tmp/r4c_decode}
EXTRA=${R4C_EXTRA:-}
VARIANTS=${R4C_VARIANTS:-ee32,mixed32,bf16ee32}
DTYPES=${R4C_DTYPES:-bfloat16_mixed}
CHAIN=${R4C_CHAIN:-30}

echo "=== round4c decode session $(date) ===" >> "$L"

# --- phase 1: chained interleaved A/B on the fixture ---
if [ -z "${R4C_SKIP_AB:-}" ] && [ ! -f "$TMPD/.ab_done" ]; then
  mkdir -p "$TMPD"
  echo "--- decode A/B: $VARIANTS (chain $CHAIN) ---" >> "$L"
  AB_VARIANTS="$VARIANTS" AB_CHAIN="$CHAIN" \
    python scripts/decode_ab.py >> "$L" 2>&1 && touch "$TMPD/.ab_done"
fi

# --- phase 2: f32 vs mixed sequence identity through the test CLI ---
if [ ! -f "$RUN/model_best.msgpack" ] && [ ! -f "$RUN/checkpoint.msgpack" ]; then
  echo "FATAL: no checkpoint under $RUN" | tee -a "$L"
  exit 1
fi
BEST="$RUN/model_best.msgpack"
[ -f "$BEST" ] || BEST="$RUN/checkpoint.msgpack"

for dt in float32 ${DTYPES//,/ }; do
  OUT="$TMPD/identity_$dt"
  if [ ! -f "$OUT/.done" ]; then
    mkdir -p "$OUT"
    echo "--- test-mode decode, decode_dtype=$dt ---" >> "$L"
    $S --mode=test --data_directory="$D" --output_directory="$OUT" \
      --conditional_attention --no_auxiliary_task \
      --resume_from_file="$BEST" --splits="$SPLITS" \
      --max_decoding_steps=120 --test_batch_size=512 \
      --max_testing_examples=2000 --decode_dtype="$dt" $EXTRA \
      >> "$TMPD/identity_$dt.log" 2>&1 && touch "$OUT/.done"
  fi
done

PAIRS=()
for dt in ${DTYPES//,/ }; do
  for split in ${SPLITS//,/ }; do
    PAIRS+=("$TMPD/identity_float32/${split}_predict.json"
            "$TMPD/identity_$dt/${split}_predict.json")
  done
done
echo "--- f32 vs {$DTYPES} prediction identity ---" >> "$L"
python scripts/compare_predictions.py "${PAIRS[@]}" >> "$L" 2>&1
echo "identity rc=$?" >> "$L"

echo "=== round4c decode session done $(date) ===" >> "$L"
