"""Digest the round-4 hardware battery (/tmp/hw_r4) into the runbook
decisions: fused conv+GN default-or-delete, target checks, verify-drive
health. Read-only; safe to run any time after /tmp/hw_r4/done appears.

Usage: python benchmarks/analyze_hw_r4.py [battery_dir]
"""
import json
import os
import sys


def _load_bench(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{'):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
    return None


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else '/tmp/hw_r4'
    base = _load_bench(os.path.join(d, 'bench_base.json'))
    fused = _load_bench(os.path.join(d, 'bench_fused.json'))

    print('=== 1. baseline capture (BENCH_r04 preview) ===')
    if base is None:
        print('  MISSING bench_base.json — battery not finished or failed')
    elif 'error' in base:
        print(f'  bench errored: {base["error"]}')
    else:
        extra = base.get('extra', {})
        dense = base.get('value')
        print(f'  headline: {dense} {base.get("unit")} '
              f'(vs_baseline {base.get("vs_baseline")})')
        road = extra.get('road_preset', {})
        ts = extra.get('train_step', {})
        print(f'  road_preset: {road}')
        print(f'  train_step: {ts}')
        checks = []
        if isinstance(dense, (int, float)):
            checks.append(('dense >= 700', dense >= 700, dense))
        if isinstance(road.get('dense_fps'), (int, float)):
            checks.append(('road dense >= 550', road['dense_fps'] >= 550,
                           road['dense_fps']))
        if isinstance(ts.get('mfu_pct'), (int, float)):
            checks.append(('train MFU >= 25%', ts['mfu_pct'] >= 25.0,
                           ts['mfu_pct']))
        for name, ok, val in checks:
            print(f'  [{"PASS" if ok else "MISS"}] {name}  (actual {val})')

    print('\n=== 2. fused conv+GN A/B (default-or-delete) ===')
    if base is None or fused is None:
        print('  incomplete — need both bench_base.json and bench_fused.json')
    elif 'error' in (fused or {}):
        print(f'  fused run errored: {fused["error"]} -> DELETE the kernel')
    else:
        b, f = base.get('value'), fused.get('value')
        if isinstance(b, (int, float)) and isinstance(f, (int, float)) and b:
            gain = (f - b) / b * 100
            verdict = ('MAKE DEFAULT (remove env gate)' if gain >= 2.0
                       else 'DELETE kernel + branch + tests')
            print(f'  base {b} vs fused {f}: {gain:+.1f}% -> {verdict}')
        else:
            print(f'  unparseable values: base={b} fused={f}')

    print('\n=== 3. logs on disk ===')
    for name in ('exp_pool_v3.log', 'trace_model.log', 'trace_road.log',
                 'trace_train.log', 'suite.log', 'serve_degradation.log',
                 'verify_train.log', 'verify_probes.log'):
        p = os.path.join(d, name)
        if os.path.exists(p):
            size = os.path.getsize(p)
            with open(p, errors='replace') as fh:
                tail = fh.read()[-400:]
            print(f'--- {name} ({size} B) tail ---')
            print(tail)
        else:
            print(f'--- {name}: MISSING ---')


if __name__ == '__main__':
    main()
