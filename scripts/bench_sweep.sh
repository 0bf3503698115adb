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

# stall15 is the committed default; "r1-config" reproduces the round-1 configuration
run "r1-config (stall off)" DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_STALL=0
run "default (stall15)"     DGSQP_BENCH_CHUNK=8
run "stall15+qpws"          DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_QP_WS=1
run "stall15+dp"            DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_HESS=dp
run "stall15+qpws+dp"       DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_QP_WS=1 DGSQP_BENCH_HESS=dp
run "stall15+qpws chunk16"  DGSQP_BENCH_CHUNK=16 DGSQP_BENCH_QP_WS=1
run "stall15+qpws qp15"     DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_QP_WS=1 DGSQP_BENCH_QP_ITERS=15
run "stall15+box"           DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_BOX=1
run "stall15+qpws+box"      DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_QP_WS=1 DGSQP_BENCH_BOX=1
run "stall15+qpws+dp+box"   DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_QP_WS=1 DGSQP_BENCH_HESS=dp DGSQP_BENCH_BOX=1
# Gondzio correctors: on first-round QPs (CPU) they cut mean IPM iterations ~7% but
# not the batch-max; worth re-measuring on TPU where mid-solve QPs run much longer
run "stall15+corr2"         DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_CORR=2
run "stall15+qpws+corr2"    DGSQP_BENCH_CHUNK=8  DGSQP_BENCH_QP_WS=1 DGSQP_BENCH_CORR=2

# pick the best config: highest solves/s among configs whose conv_abs is within
# 1 point of the best conv_abs (quality first, then speed)
python - "$OUT" <<'PY'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
rows = [r for r in rows if r.get('bench')]
if rows:
    best_conv = max(r['bench']['convergence_rate'] for r in rows)
    ok = [r for r in rows if r['bench']['convergence_rate'] >= best_conv - 0.01]
    win = max(ok, key=lambda r: r['bench']['value'])
    print(f"# best config: {win['config']} -> {win['bench']['value']} solves/s/chip "
          f"(conv_abs {win['bench']['convergence_rate']:.1%})")
PY
