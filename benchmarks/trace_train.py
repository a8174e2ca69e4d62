"""Device-trace the BASELINE config-5 train step (resnext50 b4 @256px)
and report the top ops by device time — the train-step analog of
trace_model.py (wall clocks lie on this platform)."""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.data.synthetic import make_random_batch
    from masklab_tpu.models import build_masklab
    from masklab_tpu.train import (TrainState, cyclic_lr, make_train_step,
                                   rectified_adam)

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = os.environ.get('BENCH_BACKBONE', 'resnext50')
    cfg.compute.compute_dtype = 'bfloat16'
    if os.environ.get('BENCH_COMPACT') == '0':
        cfg.compute.mask_compaction = False
    model = build_masklab(cfg)
    batch_size = int(os.environ.get('BENCH_BATCH', '4'))
    size = int(os.environ.get('BENCH_SIZE', '256'))
    batch = {k: jnp.asarray(v)
             for k, v in make_random_batch(batch_size, (size, size),
                                           8).items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch['images'][:1])
    state = TrainState.create(variables,
                              rectified_adam(cyclic_lr(1e-4, 1e-3, 700)))
    step = make_train_step(model, with_metrics=False)
    state, m = step(state, batch)
    jax.block_until_ready(m['loss'])

    trace_dir = '/tmp/train_trace'
    os.system(f'rm -rf {trace_dir}')
    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        state, m = step(state, batch)
    jax.block_until_ready(m['loss'])
    jax.profiler.stop_trace()

    f = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz',
                         recursive=True))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    events = d.get('traceEvents', [])
    # device rows only: host threads (dispatch, python) and runtime
    # wrappers would otherwise double-count every op in the denominator
    dev_pids = {e['pid'] for e in events
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and any(t in str(e.get('args', {}).get('name', ''))
                        for t in ('TPU', 'Device', 'device'))}
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get('ph') == 'X' and e.get('pid') in dev_pids:
            tot[e['name']] += e.get('dur', 0)
            cnt[e['name']] += 1
    for k, v in tot.most_common(35):
        print(f'{v/1000:10.3f} ms total {cnt[k]:4d}x  {k[:110]}')

    # rollup by op family: the bound analysis for VERDICT item 4 needs
    # "where does the step time go" at category level, not 35 fusions
    def family(name):
        n = name.lower()
        # runtime/host wrapper events enclose the real ops — skip them
        # so the rollup sums op time, not 2x everything
        for skip in ('thunkexecutor', 'block_until_ready', 'try_to_block',
                     'xlamodule', '$', 'tsl::', 'stream::'):
            if skip in n:
                return None
        # the jit_<fn> module span and the bare step-number markers
        # ENCLOSE every op event — summing them would ~double the
        # denominator (seen as a phantom 103 ms/step, session 3)
        if n.startswith('jit_') or n.strip().isdigit():
            return None
        for key, fam in (('conv', 'conv/dot'), ('dot', 'conv/dot'),
                         ('custom-call', 'custom-call (pallas)'),
                         ('all-reduce', 'collective'),
                         ('sort', 'sort'), ('scatter', 'scatter'),
                         ('gather', 'gather'), ('copy', 'copy/transpose'),
                         ('transpose', 'copy/transpose'),
                         ('reduce', 'reduce'), ('cond', 'cond/branch'),
                         ('while', 'cond/branch'),
                         ('fusion', 'fusion (elementwise)')):
            if key in n:
                return fam
        return 'other'

    fams = collections.Counter()
    for k, v in tot.items():
        fam = family(k)
        if fam is not None:
            fams[fam] += v
    # denominator = the rolled-up op time itself (device pids, wrappers
    # skipped) so ms/step and the percentages are self-consistent
    total_us = sum(fams.values())
    mod_us = sum(v for k, v in tot.items() if k.lower().startswith('jit_'))
    if mod_us:
        print(f'\nmodule span (true step time incl. gaps): '
              f'{mod_us/5000:.2f} ms/step')
    print(f'\n--- rollup over {total_us/1000:.2f} ms device time '
          f'(5 steps -> {total_us/5000:.2f} ms/step) ---')
    for fam, v in fams.most_common():
        print(f'{v/1000:10.3f} ms  {100*v/max(total_us,1):5.1f}%  {fam}')


if __name__ == '__main__':
    main()
