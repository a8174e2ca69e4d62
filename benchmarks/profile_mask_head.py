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
C = int(os.environ.get('C_FEAT', '256'))
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

    # boundary-decomposed flat-band GN: identical math to the ragged
    # GroupNorm path but with NO [N, G, L] relayout. Band sums come from
    # per-pixel row sums + a cumsum + 16 static partial-channel
    # corrections at the band boundaries; normalize/affine select between
    # the (at most two) bands a pixel spans, all elementwise in native
    # NHWC layout.
    G = 16
    Q = HW * HW                      # pixels per crop
    L = Q * C // G                   # band length (3136)
    q_idx = np.arange(Q)
    g0 = (q_idx * C) // L                        # band of channel 0
    cstar = np.clip(L * (g0 + 1) - C * q_idx, 0, C)   # boundary channel
    qk = (np.arange(G) * L) // C                 # split pixel per band k
    rk = (np.arange(G) * L) % C                  # channels below boundary
    sel_hi = jnp.asarray(np.arange(C)[None, :] >= cstar[:, None])  # [Q,C]
    part_mask = jnp.asarray(np.arange(C)[None, :] < rk[:, None],
                            jnp.float32)         # [G, C]
    g0_j = jnp.asarray(g0)
    g1_j = jnp.asarray(np.minimum(g0 + 1, G - 1))
    qk_j = jnp.asarray(qk)

    def bd_gn(h, i):
        f = h.reshape(N, Q, C).astype(jnp.float32)
        f2 = jnp.square(f)
        P = jnp.sum(f, axis=-1)                  # [N, Q]
        P2 = jnp.sum(f2, axis=-1)
        cum = jnp.cumsum(P, axis=-1)             # S over whole pixels
        cum2 = jnp.cumsum(P2, axis=-1)
        rows = f[:, qk_j, :]                      # [N, G, C] static gather
        rows2 = f2[:, qk_j, :]
        part = jnp.sum(rows * part_mask[None], axis=-1)    # [N, G]
        part2 = jnp.sum(rows2 * part_mask[None], axis=-1)
        whole = jnp.where(qk_j > 0, cum[:, qk_j - 1], 0.0)
        whole2 = jnp.where(qk_j > 0, cum2[:, qk_j - 1], 0.0)
        S = jnp.concatenate([whole + part, cum[:, -1:]], axis=-1)  # [N,G+1]
        S2 = jnp.concatenate([whole2 + part2, cum2[:, -1:]], axis=-1)
        m1 = (S[:, 1:] - S[:, :-1]) / L           # [N, G]
        m2 = (S2[:, 1:] - S2[:, :-1]) / L
        inv = jax.lax.rsqrt(jnp.maximum(m2 - jnp.square(m1), 0.0) + 1e-5)
        m_lo, m_hi = m1[:, g0_j], m1[:, g1_j]     # [N, Q]
        i_lo, i_hi = inv[:, g0_j], inv[:, g1_j]
        m_e = jnp.where(sel_hi[None], m_hi[:, :, None], m_lo[:, :, None])
        i_e = jnp.where(sel_hi[None], i_hi[:, :, None], i_lo[:, :, None])
        # affine: scale[band*cg + c % cg]; cg | C so c % cg is per-channel
        cg = C // G
        s_tab = scales[i].reshape(G, cg)          # [G, cg]
        b_tab = biases[i].reshape(G, cg)
        s_lo = s_tab[g0_j][:, np.tile(np.arange(cg), C // cg)]   # [Q, C]
        s_hi = s_tab[g1_j][:, np.tile(np.arange(cg), C // cg)]
        b_lo = b_tab[g0_j][:, np.tile(np.arange(cg), C // cg)]
        b_hi = b_tab[g1_j][:, np.tile(np.arange(cg), C // cg)]
        s_e = jnp.where(sel_hi, s_hi, s_lo)
        b_e = jnp.where(sel_hi, b_hi, b_lo)
        y = ((h.reshape(N, Q, C) - m_e.astype(h.dtype))
             * i_e.astype(h.dtype) * s_e.astype(h.dtype)
             + b_e.astype(h.dtype))
        return y.reshape(h.shape)

    def stack_bdgn(h):
        for i in range(DEPTH):
            h = nn.relu(conv(h, kernels[i]))
            h = bd_gn(h, i)
        return h

    from masklab_tpu.ops.pallas.groupnorm_kernel import band_groupnorm_pallas
    BN = int(os.environ.get('PGN_BLOCK', '8'))

    def stack_pgn(h):
        for i in range(DEPTH):
            h = nn.relu(conv(h, kernels[i]))
            y = band_groupnorm_pallas(h.reshape(N, Q, C),
                                      scales[i], biases[i], G, block_n=BN)
            h = y.reshape(h.shape)
        return h

    def stack_pgn_relu(h):
        # relu fused INTO the GN kernel — conv output goes straight in
        for i in range(DEPTH):
            h = conv(h, kernels[i])
            y = band_groupnorm_pallas(h.reshape(N, Q, C),
                                      scales[i], biases[i], G, block_n=BN,
                                      fuse_relu=True)
            h = y.reshape(h.shape)
        return h

    def pgn_only(h):
        for i in range(DEPTH):
            h = band_groupnorm_pallas(h.reshape(N, Q, C),
                                      scales[i], biases[i], G,
                                      block_n=BN).reshape(h.shape)
        return h

    variants = {
        'stack': stack, 'stack_se': stack_se, 'conv_only': conv_only,
        'gn_only': gn_only, 'gemm_conv': gemm_conv, 'mosaic': mosaic,
        'stack_bdgn': stack_bdgn, 'stack_pgn': stack_pgn,
        'stack_pgn_relu': stack_pgn_relu, 'pgn_only': pgn_only,
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
