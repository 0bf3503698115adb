#!/bin/bash
# Round-5 TPU study queue (run AFTER run_bench_matrix_r5.sh; strictly serial —
# only one process may hold the TPU tunnel).  Ordered by judge priority:
# agents scaling (VERDICT 5), F1 (3), dynamic exact+approx (4), regularization
# sweep (7), then the perturbed-retry bench rows (2a).
set -e
cd "$(dirname "$0")/.."
mkdir -p results/r5 logs

echo "=== agents study: reference-committed config (M=2,3 at N=25 theta=90) ==="
for M in 2 3; do
  timeout 3000 python scripts/monte_carlo_main.py --scenario agents --agents $M \
    --n 64 --N 25 --theta 90 --out results/r5 --skip_existing \
    2>&1 | tee logs/agents_M${M}_N25.log | tail -3
done

echo "=== agents study: ICRA sweep config (M=2,3,4 at N=15 theta=45) ==="
for M in 2 3 4; do
  timeout 3000 python scripts/monte_carlo_main.py --scenario agents --agents $M \
    --n 64 --N 15 --theta 45 --out results/r5 --skip_existing \
    2>&1 | tee logs/agents_M${M}_N15.log | tail -3
done

echo "=== F1 study (BASELINE config 5) ==="
timeout 3000 python scripts/f1_study_main.py --n 64 --N 15 --solvers dgsqp \
  --out results/r5/f1_study_N15.json 2>&1 | tee logs/f1_study_r5.log | tail -3

echo "=== dynamic-bicycle study: exact ==="
timeout 3000 python scripts/monte_carlo_main.py --scenario dynamic --n 64 --N 15 \
  --formulation exact --solver dgsqp_v2 --out results/r5 --skip_existing \
  2>&1 | tee logs/dynamic_r5.log | tail -3

echo "=== dynamic-bicycle study: approximate (PA) ==="
timeout 3000 python scripts/monte_carlo_main.py --scenario dynamic --n 64 --N 15 \
  --formulation approximate --solver dgsqp_v2 --out results/r5 --skip_existing \
  2>&1 | tee logs/dynamic_approx_r5.log | tail -3

echo "=== regularization sweep ==="
timeout 6000 python scripts/regularization_study_main.py --m 64 --N 25 \
  --out results/r5/regularization 2>&1 | tee logs/reg_sweep_r5.log | tail -3

echo "=== bench v2 + perturbed retries ==="
DGSQP_BENCH_SOLVER=v2 DGSQP_BENCH_REPS=2 DGSQP_BENCH_RETRY_SIGMAS=0.4 \
DGSQP_BENCH_OUT=results/r5/bench_v2_retry_r5.json \
timeout 3000 python bench.py 2>&1 | tee logs/bench_v2_retry_r5.log | tail -3

echo "=== bench v1 + perturbed retries ==="
DGSQP_BENCH_SOLVER=v1 DGSQP_BENCH_REPS=2 DGSQP_BENCH_RETRY_SIGMAS=0.4 \
DGSQP_BENCH_OUT=results/r5/bench_v1_retry_r5.json \
timeout 3000 python bench.py 2>&1 | tee logs/bench_v1_retry_r5.log | tail -3

echo TPU_QUEUE_DONE

echo "=== globalization ablation (VERDICT 7 / reference DGSQP_monte_carlo_ablation.py) ==="
for CFG in "stat_l1 armijo" "stat_l1 max" "sum_obj_l1 armijo"; do
  set -- $CFG
  timeout 2500 python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp_v2 \
    --merit_function $1 --merit_decrease_condition $2 --n 64 --N 25 \
    --out results/r5/ablation --skip_existing 2>&1 | tee logs/ablation_$1_$2.log | tail -3
done
timeout 2500 python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp_v2 \
  --no_nms --n 64 --N 25 --out results/r5/ablation --skip_existing \
  2>&1 | tee logs/ablation_nonms.log | tail -3
echo ABLATION_DONE

echo "=== agents M=3 N=25 retry (sampler fixed) ==="
timeout 3000 python scripts/monte_carlo_main.py --scenario agents --agents 3 \
  --n 64 --N 25 --theta 90 --out results/r5 --skip_existing \
  2>&1 | tee logs/agents_M3_N25.log | tail -3
echo M3_RETRY_DONE

echo "=== F1 study retry (bspline angle fix) ==="
timeout 3000 python scripts/f1_study_main.py --n 64 --N 15 --solvers dgsqp \
  --out results/r5/f1_study_N15.json 2>&1 | tee logs/f1_study_r5b.log | tail -3
echo F1_RETRY_DONE
