#!/usr/bin/env python3
"""Merge two independent oracle MC runs into one adjudication pickle.

The equilibrium-match artifacts need an oracle solution per sample; no single
oracle converges everywhere (the hybrid MCP reaches ~60% of the chicane suite
independently).  This merges two oracle MCResults on the SAME samples — primary
(usually MCP, the sharpest residuals) where it converged, the secondary (usually
ALGAMES) elsewhere — mirroring the reference's practice of running several
baseline solvers per trial and analyzing whichever succeeded
(``DGSQP_ALGAMES_monte_carlo_chicane.py:479-506``).

Usage:
    python scripts/merge_oracles.py primary.pkl secondary.pkl merged.pkl
"""
import pickle
import sys
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dgsqp_tpu.harness.mc_study import MCResults  # noqa: E402  (unpickling)
from dgsqp_tpu.solvers.dgsqp import CONV_ABS, CONV_REL


def merge(a: 'MCResults', b: 'MCResults', success: str = 'abs') -> 'MCResults':
    ok = (CONV_ABS,) if success == 'abs' else (CONV_ABS, CONV_REL)
    assert a.num_samples == b.num_samples
    assert np.allclose(a.x0, b.x0, atol=1e-6), 'oracle runs sampled different ICs'
    pa, pb = getattr(a, 'provenance', None), getattr(b, 'provenance', None)
    if pa and pb:
        # oracle runs must share precision + scenario + seed, not just ICs — a
        # mixed f32/f64 merge would silently blend different KKT accuracy regimes
        for k in ('dtype', 'x64', 'seed'):
            assert pa.get(k) == pb.get(k), \
                f'oracle provenance mismatch on {k!r}: {pa.get(k)} vs {pb.get(k)}'
    use_a = np.isin(a.statuses, ok)
    take_b = ~use_a & np.isin(b.statuses, ok)
    statuses = np.where(use_a, a.statuses, np.where(take_b, b.statuses, a.statuses))
    u_sol = np.where(use_a[:, None], a.u_sol, np.where(take_b[:, None], b.u_sol, a.u_sol))
    merged = replace(a, solver=f'{a.solver}+{b.solver}', statuses=statuses, u_sol=u_sol)
    n_a, n_b = int(use_a.sum()), int(take_b.sum())
    print(f'merged: {n_a} from {a.solver}, {n_b} from {b.solver}, '
          f'coverage {(n_a + n_b)}/{a.num_samples}', file=sys.stderr)
    return merged


def main():
    a = pickle.load(open(sys.argv[1], 'rb'))
    b = pickle.load(open(sys.argv[2], 'rb'))
    out = merge(a, b)
    with open(sys.argv[3], 'wb') as f:
        pickle.dump(out, f)


if __name__ == '__main__':
    main()
