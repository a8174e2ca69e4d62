"""Op-level trace dump for one jitted function (chrome-trace parsing).

Usage: python benchmarks/dump_ops.py <module> [top_n]
where <module> picks a variant from profile_mask_head (stack, gn_only, ...)
or 'nhwc_gn' style one-offs defined below. Prints every device op event
aggregated by name, sorted by total time — the only honest measurement on
this platform (see CLAUDE.md: wall clocks lie; parse the trace).
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump(trace_dir, iters, top=40):
    f = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True))[-1]
    d = json.load(gzip.open(f))
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in d.get('traceEvents', []):
        if e.get('ph') == 'X' and 'dur' in e:
            name = e['name']
            if name.startswith('jit_') or '/' in name or name[0].isalpha():
                tot[name] += e['dur']
                cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
    for name, us in rows:
        print(f'{us / 1000.0 / iters:9.4f} ms/call  x{cnt[name] // iters:<4d} {name[:110]}')


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'gn_only'
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu.nn.layers import GroupNorm

    N = int(os.environ.get('N_CROPS', '800'))
    C, HW, DEPTH = 256, 14, 4
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

    def gn_only(h):
        for i in range(DEPTH):
            h = apply_gn(h, i)
        return h

    def stack(h):
        for i in range(DEPTH):
            h = jax.nn.relu(conv(h, kernels[i]))
            h = apply_gn(h, i)
        return h

    fns = {'gn_only': gn_only, 'stack': stack}
    fn = jax.jit(fns[variant])
    jax.block_until_ready(fn(x))

    iters = 10
    trace_dir = '/tmp/dump_ops_trace'
    os.system(f'rm -rf {trace_dir}')
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    dump(trace_dir, iters, top)


if __name__ == '__main__':
    main()
