"""Microbench the mask-head conv stack (the 42%-MXU hotspot, VERDICT r2).

Dense regime at 512px b8: ~800 crops of [14, 14, 256] run through
4 x [conv3x3 -> relu -> GroupNorm] + ConvTranspose + 1x1. Device-trace
timing (wall clocks lie on this platform). Variants isolate where the
time goes and test alternative formulations:

  stack      current production stack (HeadBlock semantics, no SE)
  stack_se   with SqueezeExcite per depth (road preset)
  conv_only  4 x conv3x3+relu (no GN) — conv ceiling
  gn_only    4 x GroupNorm — GN/relayout cost
  gemm_conv  conv3x3 as 9 shifted GEMMs [N*196, 256] x [256, 256]
  mosaic     crops packed into one wide image (2-px zero gaps), conv
             runs over [M, 14, R*16, 256] — bigger spatial tiles
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get('N_CROPS', '800'))
C = 256
HW = 14
DEPTH = 4


def module_time_ms(trace_dir, iters):
    f = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True))[-1]
    d = json.load(gzip.open(f))
    tot = collections.Counter()
    for e in d.get('traceEvents', []):
        if e.get('ph') == 'X' and e['name'].startswith('jit_'):
            tot[e['name']] += e.get('dur', 0)
    return {k: v / 1000.0 / iters for k, v in tot.items()}


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from masklab_tpu.nn.layers import GroupNorm, SqueezeExcite

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, HW, HW, C), dtype)
    kernels = [jnp.asarray(rng.rand(3, 3, C, C) * 0.01, dtype)
               for _ in range(DEPTH)]
    scales = [jnp.asarray(rng.rand(C), jnp.float32) for _ in range(DEPTH)]
    biases = [jnp.asarray(rng.rand(C), jnp.float32) for _ in range(DEPTH)]

    gn = GroupNorm(16, dtype)

    def apply_gn(h, i):
        return gn.apply({'params': {'scale': scales[i], 'bias': biases[i]}}, h)

    def conv(h, k):
        return jax.lax.conv_general_dilated(
            h, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # ---- variants ----
    def stack(h):
        for i in range(DEPTH):
            h = nn.relu(conv(h, kernels[i]))
            h = apply_gn(h, i)
        return h

    se = SqueezeExcite(16.0, dtype)
    se_vars = [jax.jit(se.init)(jax.random.PRNGKey(i), x)
               for i in range(DEPTH)]

    def stack_se(h):
        for i in range(DEPTH):
            h = se.apply(se_vars[i], h)
            h = nn.relu(conv(h, kernels[i]))
            h = apply_gn(h, i)
        return h

    def conv_only(h):
        for i in range(DEPTH):
            h = nn.relu(conv(h, kernels[i]))
        return h

    def gn_only(h):
        for i in range(DEPTH):
            h = apply_gn(h, i)
        return h

    # conv3x3 as 9 shifted GEMMs: y[p] = sum_d shift_d(x) @ W[d]
    def gemm_conv(h):
        for i in range(DEPTH):
            k = kernels[i]
            acc = jnp.zeros((N, HW, HW, C), jnp.float32)
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            for dy in range(3):
                for dx in range(3):
                    win = hp[:, dy:dy + HW, dx:dx + HW, :]
                    acc = acc + jax.lax.dot_general(
                        win.reshape(-1, C), k[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(N, HW, HW, C)
            h = nn.relu(acc.astype(dtype))
        return h

    # mosaic: pack R crops along width with 2-px zero gaps
    R = int(os.environ.get('MOSAIC_R', '40'))
    M = N // R

    def mosaic(h):
        hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))   # [N,14,16,C]
        m = hp.reshape(M, R, HW, HW + 2, C).transpose(0, 2, 1, 3, 4)
        m = m.reshape(M, HW, R * (HW + 2), C)
        for i in range(DEPTH):
            m = nn.relu(conv(m, kernels[i]))
            # re-zero the gap columns (GN omitted in this variant — conv
            # layout comparison only)
            v = m.reshape(M, HW, R, HW + 2, C)
            col = jnp.arange(HW + 2)
            keep = ((col >= 1) & (col <= HW)).astype(m.dtype)
            m = (v * keep[None, None, None, :, None]).reshape(m.shape)
        return m

    variants = {
        'stack': stack, 'stack_se': stack_se, 'conv_only': conv_only,
        'gn_only': gn_only, 'gemm_conv': gemm_conv, 'mosaic': mosaic,
    }
    only = os.environ.get('VARIANTS')
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(',')}

    iters = 10
    fns = {}
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(x))     # compile
        fns[name] = jfn

    trace_dir = '/tmp/mask_head_trace'
    os.system(f'rm -rf {trace_dir}')
    jax.profiler.start_trace(trace_dir)
    for name, jfn in fns.items():
        for _ in range(iters):
            out = jfn(x)
        jax.block_until_ready(out)
    jax.profiler.stop_trace()

    times = module_time_ms(trace_dir, iters)
    # conv FLOPs for the 4-layer stack
    flops = DEPTH * N * HW * HW * C * C * 9 * 2
    peak = 197e12
    print(f'N={N} crops, {DEPTH} layers, conv stack FLOPs/call: '
          f'{flops / 1e9:.1f} G')
    for k, v in sorted(times.items(), key=lambda kv: kv[1]):
        mxu = flops / (v / 1e3) / peak * 100.0
        print(f'{v:8.3f} ms/call  {mxu:5.1f}% MXU-equiv  {k}')


if __name__ == '__main__':
    main()
