"""Device-trace the full dense-regime joint inference graph and report the
top ops by device time (wall-clock microbenches lie on this platform)."""
import gzip
import json
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab

    if os.environ.get('BENCH_PRESET') == 'road':
        from masklab_tpu.presets import road_project_config
        cfg = road_project_config()
    else:
        cfg = ModelConfiguration()
        cfg.backbone.backbone_type = os.environ.get('BENCH_BACKBONE',
                                                    'mobilenet')
    cfg.compute.compute_dtype = 'bfloat16'
    model = build_masklab(cfg)
    batch = int(os.environ.get('BENCH_BATCH', '8'))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3) * 255, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])

    def bump(path, leaf):
        keys = jax.tree_util.keystr(path)
        if 'cls_subnet' in keys and 'output_' in keys and 'bias' in keys:
            return leaf * 0.0 + 2.0
        return leaf
    dense = {**variables, 'params': jax.tree_util.tree_map_with_path(
        bump, variables['params'])}
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    jax.block_until_ready(fwd(dense, images))

    trace_dir = '/tmp/model_trace'
    os.system(f'rm -rf {trace_dir}')
    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        out = fwd(dense, images)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    f = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz',
                         recursive=True))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in d.get('traceEvents', []):
        if e.get('ph') == 'X':
            tot[e['name']] += e.get('dur', 0)
            cnt[e['name']] += 1
    for k, v in tot.most_common(30):
        print(f'{v/1000:10.3f} ms total {cnt[k]:4d}x  {k[:110]}')


if __name__ == '__main__':
    main()
