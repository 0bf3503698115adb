#!/bin/bash
# Round-5 solver-mode bench matrix (VERDICT r4 item 1): v1 / v2 / approx on the real
# TPU, one JSON artifact each with BOTH success columns (the solver's own status-based
# rate and the reference-absolute residual test) plus tolerance-semantics fields.
# Run serially — only one process may hold the TPU tunnel.
set -e
cd "$(dirname "$0")/.."
mkdir -p results/r5 logs

for S in v1 v2 approx; do
  echo "=== bench solver=$S ==="
  DGSQP_BENCH_SOLVER=$S DGSQP_BENCH_REPS=3 \
  DGSQP_BENCH_OUT=results/r5/bench_${S}_r5.json \
  timeout 3000 python bench.py 2>&1 | tee logs/bench_${S}_r5.log | tail -4
done
echo BENCH_MATRIX_DONE
