"""Break down device time INSIDE given top-level ops (e.g. the mask-branch
conditionals) by nesting trace events within their time spans.

Usage: python benchmarks/trace_cond_breakdown.py /tmp/model_trace conditional
"""
import collections
import glob
import gzip
import json
import sys


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/model_trace'
    prefixes = sys.argv[2:] or ['conditional']
    f = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz',
                         recursive=True))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    events = d.get('traceEvents', [])
    dev_pids = {e['pid'] for e in events
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and 'TPU' in str(e.get('args', {}).get('name', ''))}
    xs = [e for e in events
          if e.get('ph') == 'X' and e.get('pid') in dev_pids
          and 'dur' in e and 'ts' in e]
    # spans of the requested top-level ops
    spans = collections.defaultdict(list)
    for e in xs:
        n = e['name']
        for p in prefixes:
            if n == p or (n.startswith(p + '.')
                          and n[len(p) + 1:].isdigit()):
                spans[n].append((e['ts'], e['ts'] + e['dur']))
    for name in sorted(spans):
        ivals = spans[name]
        total = sum(b - a for a, b in ivals)
        n_calls = len(ivals)
        inner = collections.Counter()
        inner_n = collections.Counter()
        for e in xs:
            if e['name'] == name:
                continue
            mid = e['ts'] + e['dur'] / 2.0
            if any(a < mid < b for a, b in ivals):
                # family key: strip the .N instance suffix
                base = e['name'].rsplit('.', 1)
                key = (base[0] if len(base) == 2 and base[1].isdigit()
                       else e['name'])
                inner[e['name']] += e['dur']
                inner_n[e['name']] += 1
        covered = sum(inner.values())
        print(f'\n=== {name}: {total/1000:.3f} ms over {n_calls} calls '
              f'({total/n_calls/1000:.3f} ms/call), inner events cover '
              f'{covered/1000:.3f} ms ===')
        for k, v in inner.most_common(25):
            print(f'  {v/1000:8.3f} ms  {inner_n[k]:3d}x  {k}')


if __name__ == '__main__':
    main()
