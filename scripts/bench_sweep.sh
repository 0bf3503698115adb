#!/bin/bash
# One-shot bench sweep on the real TPU: stagnation-escape and chunk-size knobs.
# Usage: bash scripts/bench_sweep.sh [out_file]
# Each line of the output: the env config followed by bench.py's JSON.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results/bench_sweep.jsonl}
mkdir -p "$(dirname "$OUT")"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}

run() {
  local desc="$1"; shift
  echo "# $desc" >&2
  local json
  json=$(env "$@" timeout 580 python bench.py 2>>"$OUT.stderr")
  echo "{\"config\": \"$desc\", \"bench\": ${json:-null}}" | tee -a "$OUT"
}

run "baseline chunk8"      DGSQP_BENCH_CHUNK=8
run "qpws"                 DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_QP_WS=1
run "hess-dp"              DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_HESS=dp
run "stall15"              DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_STALL=15
run "stall15+qpws"         DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_STALL=15 DGSQP_BENCH_QP_WS=1
run "stall15+qpws+dp"      DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_STALL=15 DGSQP_BENCH_QP_WS=1 DGSQP_BENCH_HESS=dp
run "stall15+qpws chunk16" DGSQP_BENCH_CHUNK=16 DGSQP_BENCH_STALL=15 DGSQP_BENCH_QP_WS=1
run "stall15+qpws qp15"    DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_STALL=15 DGSQP_BENCH_QP_WS=1 DGSQP_BENCH_QP_ITERS=15
