"""Device-trace the FULL production serving graph @1080p: uint8 in ->
downsample 540x960 -> model -> NMS -> masks -> smoothing -> upsample ->
fused analytics + overlays (the {visualize, summarize} signature)."""
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
    import numpy as np
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving.predictor import MaskLabPredictor

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = os.environ.get('BENCH_BACKBONE',
                                                'mobilenet')
    cfg.compute.compute_dtype = 'bfloat16'
    model = build_masklab(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 1080, 1920, 3) * 255, jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 540, 960, 3)))
    pred = MaskLabPredictor(model, variables, cfg, visualization=True)
    fn = pred._get((1080, 1920))
    jax.block_until_ready(fn(variables, img))

    tdir = '/tmp/serving_full_trace'
    os.system(f'rm -rf {tdir}')
    jax.profiler.start_trace(tdir)
    for _ in range(5):
        out = fn(variables, img)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    f = sorted(glob.glob(f'{tdir}/**/*.trace.json.gz', recursive=True))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in d.get('traceEvents', []):
        if e.get('ph') == 'X' and e['name'].startswith('jit_'):
            tot[e['name']] += e.get('dur', 0)
            cnt[e['name']] += 1
    name, dur = tot.most_common(1)[0]
    print(json.dumps({'serving_graph_1080p_ms': round(dur / cnt[name] / 1000,
                                                      2),
                      'program': name[:60]}))


if __name__ == '__main__':
    main()
