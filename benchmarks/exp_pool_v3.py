"""EXPERIMENT: sort-free level-2 candidate pool over composite uint32 keys.

Round-4's composite single-key sort (ops/nms.py `use_composite`) reduced
the pool's stage-2 to ONE uint32 sort of [.., cap*s = 10240]. This
experiment removes that sort too: because the (value, index) order is now
embedded in ONE key, a second strided segment-extraction needs NO index
tracking (keys are unique, so `x == max` masks exactly one element) and a
second exactness certificate covers truncation — the only sort left is
over cap2*s2 = 1280 keys.

Fallback chain (all in-graph):
  cert2 fails -> full sort of the 10240 keys (the production composite
  path); cert1 (the existing pool certificate) then covers stage 1 as
  before when this is promoted.

CPU usage (parity):   python benchmarks/exp_pool_v3.py check
TPU usage (timing):   python benchmarks/exp_pool_v3.py time

Promotion criterion: wins the device trace vs the composite sort at the
dense bench shape [16*5, 81840] -> promote into ops/nms.py with tests;
otherwise record the negative result in docs/PERFORMANCE.md and delete.
"""
import functools
import sys

IDX_BITS = 17


def _encode_keys(cand_v, cand_i):
    """Composite uint32 keys, identical to ops/nms.py `use_composite`."""
    import jax
    import jax.numpy as jnp
    mask_i = jnp.uint32((1 << IDX_BITS) - 1)
    u = jax.lax.bitcast_convert_type(
        cand_v.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    vpart = jnp.where(cand_v > 0.0, u + jnp.uint32(1), jnp.uint32(0))
    return (vpart << IDX_BITS) | ((mask_i - cand_i.astype(jnp.uint32))
                                  & mask_i)


def _decode(top_key):
    import jax
    import jax.numpy as jnp
    mask_i = jnp.uint32((1 << IDX_BITS) - 1)
    top_i = (mask_i - (top_key & mask_i)).astype(jnp.int32)
    vp = top_key >> IDX_BITS
    top_v = jnp.where(
        vp > 0,
        jax.lax.bitcast_convert_type(
            (vp - jnp.uint32(1)).astype(jnp.uint16),
            jnp.bfloat16).astype(jnp.float32),
        -jnp.inf)
    return top_v, top_i


def level2_topk_keys(keys, k, cap2=16, m2=128):
    """Exact top-k of unique uint32 keys [.., P] without a P-sized sort.

    Strided level-2 segmentation + cap2 rounds of (max, mask) + a small
    cap2*s2 sort + a truncation certificate; certificate failure falls
    back to the full P-sized sort in-graph.
    """
    import jax
    import jax.numpy as jnp
    *batch, p = keys.shape
    s2 = -(-p // m2)
    pad = s2 * m2 - p
    x = keys
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((*batch, pad), keys.dtype)], axis=-1)
    x3 = x.reshape(-1, m2, s2)                       # column j strided
    work = x3
    outs = []
    for _ in range(cap2):
        mx = jnp.max(work, axis=1, keepdims=True)    # [R, 1, s2]
        outs.append(mx[:, 0, :])
        work = jnp.where(work == mx, jnp.uint32(0), work)
    cand2 = jnp.stack(outs, axis=1).reshape(*batch, cap2 * s2)
    flipped = jax.lax.sort(~cand2, dimension=-1, is_stable=False)
    top_key = ~flipped[..., :k]
    # certificate: a key can only be missing if its level-2 segment
    # truncated it (its 16th extract > the pool's kth key). Dead segments
    # end in 0-keys which never exceed any kth candidate key.
    last = outs[-1].reshape(*batch, s2)
    kth = top_key[..., k - 1:k]
    certified = ~jnp.any(last > kth)

    def fast(_):
        return top_key

    def exact(_):
        f = jax.lax.sort(~keys, dimension=-1, is_stable=False)
        return ~f[..., :k]

    return jax.lax.cond(certified, fast, exact, None)


def pool_v3(scores, k, floor):
    """candidate_pool with BOTH sort stages removed/shrunk (experiment).

    Mirrors ops/nms.py _pool_body stage 1 (pallas extraction on TPU, XLA
    rounds on CPU), then level2_topk_keys instead of the 10240-key sort.
    The outer certificate (stage-1 truncation) is identical.
    """
    import jax
    import jax.numpy as jnp
    from masklab_tpu.ops.nms import NEG
    *batch, n = scores.shape
    cap, m = 16, 128
    s = -(-n // m)
    # production gates the composite path on s*m <= 2^IDX_BITS
    # (ops/nms.py); without it index values would silently wrap and the
    # certificate cannot catch it — a false-positive parity/timing result
    assert s * m <= (1 << IDX_BITS), (
        f'index capacity exceeded: {s * m} > {1 << IDX_BITS}')
    pad = s * m - n
    x = jnp.concatenate(
        [scores, jnp.full((*batch, pad), -jnp.inf, scores.dtype)], axis=-1)
    x3 = x.reshape(-1, m, s)
    if jax.devices()[0].platform == 'tpu':
        from masklab_tpu.ops.pallas.topk_kernel import segment_topk_pallas
        vals3, idxs3 = segment_topk_pallas(x3, cap)
    else:
        work = jnp.swapaxes(x3, -1, -2)
        base_idx = (jnp.arange(s, dtype=jnp.int32)[:, None]
                    + jnp.arange(m, dtype=jnp.int32)[None, :] * s)
        iota_m = jnp.arange(m, dtype=jnp.int32)
        vs, ids = [], []
        for _ in range(cap):
            am = jnp.argmax(work, axis=-1)
            vs.append(jnp.max(work, axis=-1))
            ids.append(jnp.take_along_axis(
                jnp.broadcast_to(base_idx, work.shape),
                am[..., None].astype(jnp.int32), axis=-1)[..., 0])
            work = jnp.where(iota_m == am[..., None], -jnp.inf, work)
        vals3 = jnp.stack(vs, axis=-2)
        idxs3 = jnp.stack(ids, axis=-2)
    cand_v = vals3.reshape(*batch, cap * s)
    cand_i = idxs3.reshape(*batch, cap * s)

    keys = _encode_keys(cand_v, cand_i)
    top_key = level2_topk_keys(keys, k)
    top_v, top_i = _decode(top_key)

    lv = vals3[..., cap - 1, :].reshape(*batch, s)
    li = idxs3[..., cap - 1, :].reshape(*batch, s)
    kv = top_v[..., k - 1:k]
    ki = top_i[..., k - 1:k]
    truncating = (lv >= jnp.float32(floor)) & (
        (lv > kv) | ((lv == kv) & (li < ki)))
    certified = ~jnp.any(truncating)

    def fast(args):
        tv, ti = args
        dead = tv < floor
        return (jnp.where(dead, NEG, tv), jnp.where(dead, 0, ti))

    def exact(_):
        return tuple(jax.lax.top_k(scores, k))

    return jax.lax.cond(certified, fast, exact, (top_v, top_i))


def check():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.RandomState(0)
    failures = 0
    for trial in range(8):
        n = int(rng.choice([40000, 81840]))
        k = int(rng.choice([64, 256]))
        floor = 0.5
        kind = trial % 4
        base = rng.rand(2, 3, n) * (0.3 if kind == 1 else 1.0)
        if kind == 2:  # plateau ties at the boundary
            base[:] = 0.25
            base[..., 17::97] = 0.75
        if kind == 3:  # adversarial strided segment
            s = -(-n // 128)
            base[0, 0, 3::s] = np.linspace(0.6, 1.0, base[0, 0, 3::s].size)
        q = np.asarray(jnp.asarray(base, jnp.bfloat16), np.float32)
        masked = jnp.where(jnp.asarray(q) >= floor, jnp.asarray(q), -1.0)
        got_v, got_i = jax.jit(
            functools.partial(pool_v3, k=k, floor=floor))(masked)
        ref_v, ref_i = jax.lax.top_k(masked, k)
        valid = np.asarray(ref_v) >= floor
        ok = (np.array_equal(np.asarray(got_v)[valid],
                             np.asarray(ref_v)[valid])
              and np.array_equal(np.asarray(got_i)[valid],
                                 np.asarray(ref_i)[valid]))
        print(f'trial {trial}: n={n} k={k} kind={kind} -> '
              f'{"OK" if ok else "MISMATCH"}')
        failures += not ok
    print('PASS' if failures == 0 else f'FAIL ({failures})')
    return failures


def _device_trace_ms(trace_dir):
    """Sum device-pid X-event durations from the newest trace.json.gz.

    Wall-clock loops LIE on this platform for ~1 ms programs (CLAUDE.md);
    only profiler traces are trustworthy at this size. Host rows (dispatch,
    python) are excluded via the process-name metadata.
    """
    import glob
    import gzip
    import json
    f = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz',
                         recursive=True))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    events = d.get('traceEvents', [])
    dev_pids = {e['pid'] for e in events
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and any(t in str(e.get('args', {}).get('name', ''))
                        for t in ('TPU', 'Device', 'device'))}
    total = sum(e.get('dur', 0) for e in events
                if e.get('ph') == 'X' and e.get('pid') in dev_pids)
    return total / 1000.0


def time_tpu():
    import os
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu.ops.nms import _pool_body
    rng = np.random.RandomState(0)
    shape = (16 * 5, 81840)   # dense b16 road-ish: [B*C, N]
    q = np.asarray(jnp.asarray(rng.rand(*shape), jnp.bfloat16), np.float32)
    scores = jnp.asarray(q)
    k, floor = 256, 0.5
    variants = {
        'composite_sort': jax.jit(functools.partial(
            _pool_body, k=k, floor=floor, bf16_exact=True)),
        'level2_extract': jax.jit(functools.partial(
            pool_v3, k=k, floor=floor)),
        'legacy_2key_sort': jax.jit(functools.partial(
            _pool_body, k=k, floor=floor, bf16_exact=False)),
    }
    iters = 50
    device_ms = {}
    for name, fn in variants.items():
        out = jax.block_until_ready(fn(scores))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(scores)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        # the decision metric: per-variant device trace (loop avg is
        # reported for context only)
        trace_dir = f'/tmp/exp_pool_v3_trace_{name}'
        os.system(f'rm -rf {trace_dir}')
        jax.profiler.start_trace(trace_dir)
        for _ in range(iters):
            out = fn(scores)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        try:
            device_ms[name] = _device_trace_ms(trace_dir) / iters
        except (IndexError, OSError, ValueError) as exc:
            device_ms[name] = None
            print(f'{name}: trace parse failed: {exc}')
        dev = (f'{device_ms[name]:.3f} ms/call DEVICE-TRACE'
               if device_ms[name] else 'n/a')
        print(f'{name}: {dev}  (loop avg {dt:.3f} ms, context only)')
    comp, lvl2 = device_ms.get('composite_sort'), device_ms.get(
        'level2_extract')
    if comp and lvl2:
        verdict = ('PROMOTE level2 into ops/nms.py' if lvl2 < comp
                   else 'record negative result + DELETE experiment')
        print(f'decision: level2 {lvl2:.3f} vs composite {comp:.3f} ms '
              f'-> {verdict}')


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'check'
    sys.path.insert(0, '/root/repo')
    raise SystemExit(check() if mode == 'check' else time_tpu())
