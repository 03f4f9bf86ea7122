#!/bin/bash
# Build the native gSCAN loader shared library.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p multimodal_seq2seq_gscan_tpu/data/_native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
  native/gscan_loader.cc \
  -o multimodal_seq2seq_gscan_tpu/data/_native/libgscan_loader.so
echo "Built multimodal_seq2seq_gscan_tpu/data/_native/libgscan_loader.so"
