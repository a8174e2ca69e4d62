"""Sub-op costs of the level-0 compact mask branch at dense b16 shapes.

cond.31 (the level-0 bucket) is ~10.3 ms of the 25.5 ms dense batch.
Components: RoIAlign crop (interpolation matmuls), the conv+GN head,
the 2x transpose conv + 1x1, and the one-hot scatter epilogue. This
isolates each and A/Bs cheaper formulations:

  crop_f32hi   production: f32 einsums at Precision.HIGHEST
  crop_bf16    bf16 operands, default precision
  epi_5d       production scatter: einsum 'bcj,bchwd->bjhwd' (d=6 lanes)
  epi_flat     same scatter on [b, c, h*w*d] flattened operands
  head         conv+GN stack (known: ~3.8 ms at these shapes)
  upconv       ConvTranspose 2x + 1x1 sigmoid output
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, K, C, HW = 16, 100, 128, 14
FH, FW = 64, 64          # level-0 fmap at 512 px / stride 8
D = 6                    # num_classes + 1


def module_time_ms(trace_dir, iters):
    f = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz',
                         recursive=True))[-1]
    d = json.load(gzip.open(f))
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in d.get('traceEvents', []):
        if e.get('ph') == 'X' and e['name'].startswith('jit_'):
            tot[e['name']] += e.get('dur', 0)
            cnt[e['name']] += 1
    # each dispatch emits two stacked X events with the full duration
    return {k: v / 1000.0 / iters / max(1, cnt[k] // iters)
            for k, v in tot.items()}


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu.ops.roi_align import batched_crop_and_resize

    rng = np.random.RandomState(0)
    fmap = jnp.asarray(rng.rand(B, FH, FW, C), jnp.bfloat16)
    y1 = rng.rand(B, K) * 0.8
    x1 = rng.rand(B, K) * 0.8
    boxes = np.stack([y1, x1, y1 + 0.2, x1 + 0.2], -1).astype(np.float32)
    boxes = jnp.asarray(boxes)
    ymask = jnp.asarray(rng.rand(B, K, 2 * HW, 2 * HW, D), jnp.bfloat16)
    sel = jnp.asarray(np.argsort(rng.rand(B, K), axis=1), jnp.int32)

    def crop_f32hi(fmap, boxes):
        return batched_crop_and_resize(fmap, boxes, (HW, HW))

    def crop_bf16(fmap, boxes):
        # bf16 interpolation matmuls at default precision
        import jax.numpy as jnp
        from masklab_tpu.ops.roi_align import _sample_weights

        def one(f, bx):
            wy = _sample_weights(bx[:, 0], bx[:, 2], HW, FH).astype(
                jnp.bfloat16)
            wx = _sample_weights(bx[:, 1], bx[:, 3], HW, FW).astype(
                jnp.bfloat16)
            rows = jnp.einsum('kih,hwc->kiwc', wy, f)
            return jnp.einsum('kjw,kiwc->kijc', wx, rows)
        return jax.vmap(one)(fmap, boxes)

    def epi_5d(sel, y):
        onehot = (sel[:, :, None] == jnp.arange(K)[None, None, :])
        return jnp.einsum('bcj,bchwd->bjhwd', onehot.astype(y.dtype), y)

    def epi_flat(sel, y):
        onehot = (sel[:, :, None] == jnp.arange(K)[None, None, :])
        flat = y.reshape(B, K, -1)
        out = jnp.einsum('bcj,bcm->bjm', onehot.astype(y.dtype), flat)
        return out.reshape(y.shape)

    variants = {
        'crop_f32hi': (crop_f32hi, (fmap, boxes)),
        'crop_bf16': (crop_bf16, (fmap, boxes)),
        'epi_5d': (epi_5d, (sel, ymask)),
        'epi_flat': (epi_flat, (sel, ymask)),
    }
    only = os.environ.get('VARIANTS')
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(',')}

    iters = 10
    fns = {}
    for name, (fn, args) in variants.items():
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(*args))
        fns[name] = (jfn, args)

    trace_dir = '/tmp/mask_branch_trace'
    os.system(f'rm -rf {trace_dir}')
    jax.profiler.start_trace(trace_dir)
    for name, (jfn, args) in fns.items():
        for _ in range(iters):
            out = jfn(*args)
        jax.block_until_ready(out)
    jax.profiler.stop_trace()
    for k, v in sorted(module_time_ms(trace_dir, iters).items(),
                       key=lambda kv: kv[1]):
        print(f'{v:8.3f} ms/call  {k[:80]}')


if __name__ == '__main__':
    main()
