#!/usr/bin/env python3
"""Aggregate a regularization sweep into (reg x decay) success/solve-time tables.

Counterpart of the reference's ``analyze_data_regularization.py``: parses the per-config
JSON summaries written by ``monte_carlo_main.py`` (file names carry ``regR_decayD_EVAL``),
and prints one success-rate and one solves/s table per eval_type, plus the JSON artifact
``regularization_summary.json`` in the study directory.
"""
import json
import re
import sys
from pathlib import Path


def main():
    study_dir = Path(sys.argv[1] if len(sys.argv) > 1 else 'results')
    pat = re.compile(r'reg([0-9.]+)_decay([0-9.]+)_(once|always).*\.json$')
    cells = {}
    for f in sorted(study_dir.glob('*.json')):
        m = pat.search(f.name)
        if not m:
            continue
        reg, decay, ev = float(m.group(1)), float(m.group(2)), m.group(3)
        d = json.loads(f.read_text())
        cells[(ev, reg, decay)] = dict(
            success_rate=d.get('success_rate'),
            solves_per_s=d.get('solves_per_s'),
            mean_iters=d.get('mean_iters'),
            status_counts=d.get('status_counts'))
    if not cells:
        print(f'no regularization-sweep JSONs under {study_dir}', file=sys.stderr)
        sys.exit(1)

    out = {}
    for ev in ('once', 'always'):
        regs = sorted({r for (e, r, _) in cells if e == ev})
        decays = sorted({d for (e, _, d) in cells if e == ev})
        if not regs:
            continue
        print(f'\n=== eval_type={ev}: success rate (rows reg, cols decay) ===')
        header = 'reg\\decay ' + ' '.join(f'{d:>7g}' for d in decays)
        print(header)
        for r in regs:
            row = [cells.get((ev, r, d), {}).get('success_rate') for d in decays]
            print(f'{r:>9g} ' + ' '.join('   --  ' if v is None else f'{v:7.3f}'
                                         for v in row))
        out[ev] = {f'reg{r}_decay{d}': cells[(ev, r, d)]
                   for r in regs for d in decays if (ev, r, d) in cells}

    (study_dir / 'regularization_summary.json').write_text(json.dumps(out, indent=2))
    print(f'\nwrote {study_dir / "regularization_summary.json"}')


if __name__ == '__main__':
    main()
