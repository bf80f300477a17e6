#!/bin/bash
# Round-3 pending hardware measurements — run when the TPU tunnel is up.
# One at a time (never two TPU processes), compile cache on.
set -e
export JAX_COMPILATION_CACHE_DIR=/tmp/crfconv_tpu_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
cd "$(dirname "$0")/.."

echo "=== fused point-conv inference kernel A/B ===" >&2
timeout 2400 python benchmarks/conv_fused_bench.py | tee /tmp/r3_conv_fused.json

echo "=== windowed gather v1/v2/v3 body A/B ===" >&2
timeout 2400 python benchmarks/gather_kernel_bench.py | tee /tmp/r3_gather.json

echo "=== headline bench (after arming winners!) ===" >&2
timeout 2400 python bench.py | tee /tmp/r3_bench.json
