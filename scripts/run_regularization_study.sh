#!/usr/bin/env bash
# Regularization sweep of the journal DGSQP (v2) on the APPROXIMATE kinematic game —
# TPU-native counterpart of the reference's
# scripts/comparison_study_barc/run_regularization_study.sh: reg_init x reg_decay grid,
# eval_type in {once, always}, M samples per cell.  Each cell is ONE batched solve here
# instead of M sequential processes.  Aggregate with:
#   python scripts/analyze_regularization.py $OUT_DIR
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

OUT_DIR=${OUT_DIR:-results/regularization_study_$(date +%Y-%m-%d_%H-%M-%S)}
M=${M:-100}
N=${N:-25}

for eval_type in once always; do
    for reg in 1 10 100 1000; do
        for decay in 0.5 0.65 0.8 0.95 1.0; do
            python3 scripts/monte_carlo_main.py \
                --scenario chicane --formulation approximate --solver dgsqp_v2 \
                --n "$M" --N "$N" \
                --merit_function stat_l1 --merit_decrease_condition armijo \
                --reg_init "$reg" --reg_decay "$decay" --eval_type "$eval_type" \
                --out "$OUT_DIR" --skip_existing
        done
    done
    # unregularized baseline (reg 0, no decay)
    python3 scripts/monte_carlo_main.py \
        --scenario chicane --formulation approximate --solver dgsqp_v2 \
        --n "$M" --N "$N" \
        --merit_function stat_l1 --merit_decrease_condition armijo \
        --reg_init 0 --reg_decay 1.0 --eval_type "$eval_type" \
        --out "$OUT_DIR" --skip_existing
done

python3 scripts/analyze_regularization.py "$OUT_DIR"
