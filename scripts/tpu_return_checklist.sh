#!/bin/bash
# One-shot runner for the PERF_NOTES.md "TPU-return checklist".
#
# Runs every queued measurement in order on the real TPU, logging each to
# /tmp/tpuq/<NN>_<name>.log and a PASS/FAIL summary to /tmp/tpuq/SUMMARY.
# Serial by design: only one process can use the tunneled TPU at a time
# (PERF_NOTES / memory: overlapping timed runs corrupts both).
#
# Usage:  bash scripts/tpu_return_checklist.sh            # full queue
#         bash scripts/tpu_return_checklist.sh kernels    # single stage
set -u
cd /root/repo
OUT=/tmp/tpuq
mkdir -p "$OUT"
: > "$OUT/SUMMARY"

STAGE="${1:-}"
STAGES="kernels v4ab sr eval dedup serving bench"
if [ -n "$STAGE" ] && ! printf '%s\n' $STAGES | grep -qx "$STAGE"; then
  echo "unknown stage '$STAGE' (valid: $STAGES)" >&2
  exit 2
fi

run_stage() {
  local name="$1"; shift
  local log="$OUT/${name}.log"
  echo "=== $name: $* (log: $log)" | tee -a "$OUT/SUMMARY"
  local t0=$SECONDS
  if "$@" > "$log" 2>&1; then
    echo "    PASS (${name}, $((SECONDS - t0))s)" | tee -a "$OUT/SUMMARY"
  else
    echo "    FAIL rc=$? (${name}, $((SECONDS - t0))s) — see $log" | tee -a "$OUT/SUMMARY"
  fi
}

want() { [ -z "$STAGE" ] || [ "$STAGE" = "$1" ]; }

# 1. first real-Mosaic compile of the Pallas ops that have only ever run
#    in interpret mode: SR/v4 update kernels AND the shipped equality-
#    matmul dedup kernel (its differential tests live in test_optimizers)
want kernels && run_stage 01_kernels \
  env GRU4REC_TPU_TEST_PLATFORM=tpu timeout 3000 \
  python -m pytest tests/test_sr_state.py tests/test_pallas_kernels.py \
    "tests/test_optimizers.py::test_dedup_matmul_matches_sort_chain" \
    "tests/test_optimizers.py::test_dedup_impl_matmul_full_chunk_parity" \
    -x -q

# 2. queued v3/v4 A/B (decision procedure: PERF_NOTES "v4 kernel" section)
want v4ab && run_stage 02_v4ab \
  timeout 3000 python scripts/measure_shapes.py v4ab

# 3. SR-state A/B incl. sub-64MB forced rows
want sr && run_stage 03_sr \
  timeout 3000 python scripts/measure_shapes.py sr

# 4. eval-throughput protocol at the reference's published setup
want eval && run_stage 04_eval \
  timeout 1800 python scripts/measure_eval.py

# 5. round-4 candidate: equality-matmul dedup for the sub-64MB regime
#    (mm_pal IS the shipped ops/kernels/dedup_matmul.py function)
want dedup && run_stage 05_dedup_mm \
  timeout 1800 python scripts/proto_dedup_matmul.py all

# 6. serving-path latency/throughput protocol (predict_topk + full-frame)
want serving && run_stage 06_serving \
  timeout 1800 python scripts/measure_serving.py

# 7. headline bench (driver also runs this at round end)
want bench && run_stage 07_bench \
  timeout 3000 python bench.py

echo "checklist complete" | tee -a "$OUT/SUMMARY"
cat "$OUT/SUMMARY"
