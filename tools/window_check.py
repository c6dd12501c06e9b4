#!/usr/bin/env python3
"""Compare graft.Bench run logs against BASELINE.md's canonical medians.

Usage: python3 tools/window_check.py run1.log [run2.log ...]

Prints per-run shared-key median ratios (the hot-window detector), the
window medians for keys above the 1.5x reprice threshold, and entry
medians for keys missing from the canonical table. Reads ONLY the
canonical table (the section under '## Recorded engine bench'), never
the rehearsal tables, whose first two columns happen to parse the same
way — the trap that once made sealed rows look like 3x regressions.
"""
import json, re, statistics, sys


def load(path):
    line = [l for l in open(path) if '"metric"' in l][0]
    return json.loads(re.sub(r'^\[info\] ', '', line.strip()))['queries']


def canonical_medians(baseline='BASELINE.md'):
    lines = open(baseline).read().split('\n')
    start = next(i for i, l in enumerate(lines)
                 if l.startswith('## Recorded engine bench'))
    end = next(i for i in range(start + 1, len(lines))
               if lines[i].startswith('## '))
    med = {}
    for l in lines[start:end]:
        m = re.match(r'\|\s*`?([a-z0-9_]+)`?\s*\|\s*([0-9.]+)\s*\|', l)
        if m:
            med[m.group(1)] = float(m.group(2))
    return med


def main():
    med = canonical_medians()
    runs = [load(p) for p in sys.argv[1:]]
    for i, q in enumerate(runs, 1):
        rs = [q[k] / med[k] for k in q if k in med and med[k] > 0.05]
        print(f'run{i}: total {sum(q.values()):7.1f}  '
              f'median ratio {statistics.median(rs):.3f}')
    keys = runs[0].keys()
    wmed = {k: statistics.median([r[k] for r in runs]) for k in keys}
    shared = sorted(((wmed[k] / med[k], k, wmed[k], med[k])
                     for k in wmed if k in med and med[k] > 0.05),
                    reverse=True)
    print('window median ratio:',
          round(statistics.median(r for r, _, _, _ in shared), 3))
    print('>1.5x window medians:')
    for rt, k, v, m in shared:
        if rt > 1.5:
            per = [round(r[k], 2) for r in runs]
            print(f'  {k:28s} wmed {v:6.2f} vs {m:6.2f} ({rt:.2f}x) runs={per}')
    missing = {k: round(wmed[k], 2) for k in wmed if k not in med}
    if missing:
        print('missing from canonical table:', missing)
    # downward-reprice candidates: every run strictly below the row
    down = [(k, [round(r[k], 2) for r in runs], med[k]) for k in wmed
            if k in med and med[k] > 0.1 and all(r[k] < med[k] * 0.67 for r in runs)]
    if down:
        print('downward-reprice candidates (every run < 0.67x row):')
        for k, per, m in down:
            print(f'  {k:28s} runs={per} vs {m}')


if __name__ == '__main__':
    try:
        main()
    except BrokenPipeError:  # piped into head
        pass
