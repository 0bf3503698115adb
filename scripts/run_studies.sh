#!/bin/bash
# Full Monte-Carlo study sweep (counterpart of the reference's run_kinematic_study.sh /
# run_dynamic_study.sh shell loops).  Each configuration is one batched, sharded solve —
# what the reference ran as 500 sequential python processes per line.
set -e
OUT=${1:-results}
N_SAMPLES=${2:-200}

for N in 15 20 25; do
  python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp    --N $N --n $N_SAMPLES --out $OUT
  python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp_v2 --N $N --n $N_SAMPLES --out $OUT
  python scripts/monte_carlo_main.py --scenario curve   --solver dgsqp_v2 --N $N --n $N_SAMPLES --out $OUT
done
python scripts/monte_carlo_main.py --scenario merge  --solver dgsqp --n $N_SAMPLES --out $OUT
python scripts/monte_carlo_main.py --scenario agents --agents 3 --solver dgsqp --n $N_SAMPLES --out $OUT
python scripts/monte_carlo_main.py --scenario agents --agents 4 --solver dgsqp --n $N_SAMPLES --out $OUT
# approximate-game formulation (MPCC) via the frenet-approx solver
python scripts/monte_carlo_main.py --scenario chicane --formulation approximate --n $N_SAMPLES --out $OUT
# exact dynamic-bicycle study (journal dynamic study; reference run_dynamic_study.sh)
for CS in 0 1 2 3; do
  python scripts/monte_carlo_main.py --scenario dynamic --cost_setting $CS --n $N_SAMPLES --out $OUT
done
# cross-solver oracles on the same chicane samples (equilibrium agreement)
python scripts/monte_carlo_main.py --scenario chicane --solver algames --n $N_SAMPLES --out $OUT
python scripts/monte_carlo_main.py --scenario chicane --solver mcp --N 15 --n $N_SAMPLES --out $OUT
# then: python scripts/gne_compare_main.py --N 15 $OUT/<dgsqp pickle> $OUT/<mcp pickle>
# (equilibrium-match analysis; see docs/match_dgsqp_mcp_N15.json for a recorded run)
