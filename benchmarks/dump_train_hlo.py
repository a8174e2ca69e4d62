"""Dump the optimized train-step HLO and attribute named ops.

The device trace names ops `fusion.N` / `broadcast.N` / `conditional.N`;
this compiles the SAME train step (persistent-cache hit when bench/trace
ran first) and prints each requested op's definition plus the metadata
op_name trail XLA keeps (source annotations), so trace lines map back to
model code.

Usage: python benchmarks/dump_train_hlo.py fusion.25 broadcast.410 ...
       (no args: prints the 40 largest-shape fusions/broadcasts)
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    names = sys.argv[1:]
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
    if os.environ.get('BENCH_FRACTIONS'):
        # match an already-cached program (the capacity ladder is config,
        # so a default change would otherwise force a fresh remote compile)
        cfg.compute.mask_capacity_fractions = tuple(
            float(f) for f in os.environ['BENCH_FRACTIONS'].split(','))
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
    lowered = jax.jit(step).lower(state, batch)
    txt = lowered.compile().as_text()
    with open('/tmp/train_step_hlo.txt', 'w') as f:
        f.write(txt)
    print(f'HLO dumped: /tmp/train_step_hlo.txt ({len(txt)} bytes)')

    # index op definitions by name
    defs = {}
    for line in txt.splitlines():
        m = re.match(r'\s*(?:ROOT )?%?([\w.-]+) = ', line)
        if m:
            defs[m.group(1)] = line.strip()
    if not names:
        pat = re.compile(r'^(fusion|broadcast|copy)[.\d]*$')
        cands = [(len(v), k) for k, v in defs.items() if pat.match(k)]
        names = [k for _, k in sorted(cands, reverse=True)[:40]]
    for n in names:
        line = defs.get(n) or defs.get(n.replace('%', ''))
        print(f'\n=== {n} ===')
        if line is None:
            print('  (not found)')
            continue
        print(' ', line[:600])
        m = re.search(r'op_name="([^"]+)"', line)
        if m:
            print('  op_name:', m.group(1))


if __name__ == '__main__':
    main()
