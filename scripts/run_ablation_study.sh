#!/bin/bash
# Globalization ablation (counterpart of scripts/DGSQP_monte_carlo_ablation.py and
# comparison_study_barc/run_ablation_study.sh): merit function x decrease condition x NMS.
set -e
OUT=${1:-results/ablation}
N_SAMPLES=${2:-100}
for MF in stat_l1 sum_obj_l1; do
  for MD in armijo max; do
    python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp_v2 \
      --merit_function $MF --merit_decrease_condition $MD --n $N_SAMPLES --out $OUT
  done
done
python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp_v2 --no_nms --n $N_SAMPLES --out $OUT
python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp --merit_function stat --n $N_SAMPLES --out $OUT
