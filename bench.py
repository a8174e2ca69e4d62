"""Headline benchmark: MaskLab joint inference throughput at 512 px.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 30 images/sec/chip for full joint
instance + semantic inference at 512 px. vs_baseline = value / 30.

The headline value is the DENSE-proposal regime (every NMS slot populated,
all mask pyramid levels active) — the regime a trained detector actually
runs in. Random-init weights put every confidence below min_confidence
(the focal -log(99) bias init) which would measure an empty mask branch, so
unless BENCH_CKPT points at a trained checkpoint the classification output
biases are forced positive ("forced-dense", labeled in extra.regime).
The sparse regime (empty mask branch best case) is reported alongside, and
MFU is computed from XLA's own compiled-module FLOP count.

extra.road_preset benches the production road configuration (seresnet34 +
SE heads + 5 anchor ratios, presets.py — the config the reference actually
deploys, road_project/train.py:21-63) at batch 8.
extra.train_step benches one optimizer step (BASELINE.md config 5:
resnext50 joint trainer, batch 4 @ 256 px) in ms/step with its own MFU.
Set BENCH_SKIP_EXTRAS=1 to run the headline only.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 30.0


def _probe_backend_subprocess(timeout_s):
    """Try backend init in a KILLABLE subprocess.

    Two outage shapes have been observed on the tunnel: a raised
    `UNAVAILABLE` (round 3's rc=1) and an indefinite HANG inside backend
    init (round 4). An in-process `jax.devices()` cannot be cancelled, so a
    hang would stall the driver capture forever; probing in a subprocess
    bounds every attempt. Returns (ok, detail).
    """
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            capture_output=True, text=True, timeout=timeout_s,
            env=os.environ.copy())
    except subprocess.TimeoutExpired:
        return False, f'backend init hang (> {timeout_s:.0f}s, killed)'
    if proc.returncode == 0:
        return True, ''
    tail = (proc.stderr or '').strip().splitlines()
    return False, tail[-1][:200] if tail else f'rc={proc.returncode}'


def _acquire_devices(budget_s=240.0, first_wait=15.0, probe_timeout=150.0):
    """Bounded retry-with-backoff around first device acquisition.

    The TPU backend here rides a tunnel that has outages (round 3 lost its
    driver-recorded number to a transient `UNAVAILABLE` at capture time;
    round 4 saw init HANG instead of raising). Each attempt first probes in
    a killable subprocess (hang-proof), then inits in-process only after a
    probe succeeds: a late-but-valid number beats an rc=1 hole.

    Returns the device list. Raises once the budget is spent. Only
    availability-shaped in-process errors are retried; anything else
    (import errors, config bugs) surfaces immediately.
    """
    import jax

    deadline = time.monotonic() + budget_s
    wait = first_wait
    attempt = 0
    last_detail = 'no attempts made'
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise RuntimeError(
                f'device acquisition budget ({budget_s:.0f}s) spent after '
                f'{attempt - 1} attempts; last: {last_detail}')
        ok, detail = _probe_backend_subprocess(
            min(probe_timeout, max(remaining, 30.0)))
        if ok:
            try:
                return jax.devices()
            except Exception as exc:  # noqa: BLE001
                detail = str(exc).splitlines()[0][:200]
                transient = ('UNAVAILABLE' in detail
                             or 'DEADLINE_EXCEEDED' in detail
                             or 'Unable to initialize backend' in detail)
                if not transient:
                    raise
        last_detail = detail
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise RuntimeError(
                f'device acquisition budget ({budget_s:.0f}s) spent after '
                f'{attempt} attempts; last: {last_detail}')
        sleep_s = min(wait, remaining)
        print(f'bench: device acquisition attempt {attempt} failed '
              f'({detail}); retrying in {sleep_s:.0f}s '
              f'({remaining:.0f}s budget left)', file=sys.stderr)
        time.sleep(sleep_s)
        wait = min(wait * 2, 120.0)

# bf16 peak FLOP/s per chip by device kind (dense MXU)
_PEAK_BF16 = (
    ('v6', 918e12),
    ('v5p', 459e12),
    ('v5e', 197e12),
    ('v5 lite', 197e12),
    ('v4', 275e12),
)


def _peak_flops(device) -> float:
    kind = getattr(device, 'device_kind', '').lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return 197e12  # assume v5e


def _force_dense(variables):
    """Raise every classification output bias so all candidates clear
    min_confidence: NMS fills every slot and the mask branch runs over all
    pyramid levels — the trained-model (dense) regime, without weights."""
    import jax

    def bump(path, leaf):
        keys = jax.tree_util.keystr(path)
        if 'cls_subnet' in keys and 'output_' in keys and 'bias' in keys:
            return leaf * 0.0 + 2.0
        return leaf

    params = jax.tree_util.tree_map_with_path(bump, variables['params'])
    return {**variables, 'params': params}


def _timeit(fn, variables, images, iters, trials=3):
    """Best-of-`trials` timed loops of `iters` calls each.

    The device rides a tunnel with transient multi-second stalls (a
    background probe, a queued remote compile, plain tunnel jitter) that
    can poison any single mean — round 4 recorded a 105.9 ms capture for
    a program that times at 20.4 ms standalone. A stall only ever ADDS
    time, so the minimum across trials is the defensible estimate of the
    program's actual speed.
    """
    import jax
    out = fn(variables, images)           # warmup / compile
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(trials):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, images)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - start)
    return best


def _xla_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get('flops', 0.0))


def _bench_inference(cfg, batch, size, iters):
    """(dense_fps, sparse_fps, mfu_pct, flops, p50_ms) for one config."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu.models import build_masklab

    model = build_masklab(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3) * 255, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
    dense_variables = _force_dense(variables)
    forward = jax.jit(lambda v, x: model.apply(v, x))

    dense_s = _timeit(forward, dense_variables, images, iters)
    dense_fps = batch * iters / dense_s
    sparse_s = _timeit(forward, variables, images, iters)
    sparse_fps = batch * iters / sparse_s

    mfu_pct = None
    flops = None
    try:
        compiled = forward.lower(dense_variables, images).compile()
        flops = _xla_flops(compiled)
        if flops > 0:
            achieved = flops / (dense_s / iters)
            mfu_pct = 100.0 * achieved / _peak_flops(jax.devices()[0])
    except Exception:
        pass
    return (dense_fps, sparse_fps, mfu_pct, flops,
            dense_s / iters * 1000.0)


def _trace_module_span_ms(run_steps, n_steps=5):
    """Device-trace ``run_steps(n_steps)`` and return the per-step
    jit-module span in ms (device pids only), or None.

    Wall train-step numbers on this platform swing 20-26 ms with tunnel
    dispatch overhead at a FIXED 13 ms device span (docs/PERFORMANCE.md
    session 8) — the recorded wall MFU moves with the tunnel, not the
    code. The module span is the dispatch-independent step time; VERDICT
    r4 item 4 asks for it in the capture so regressions aren't masked by
    (or blamed on) dispatch jitter.
    """
    import glob
    import gzip
    import shutil
    import tempfile

    import jax

    trace_dir = tempfile.mkdtemp(prefix='bench_trace_')
    try:
        jax.profiler.start_trace(trace_dir)
        try:
            run_steps(n_steps)
        finally:
            jax.profiler.stop_trace()
        files = sorted(glob.glob(f'{trace_dir}/**/*.trace.json.gz',
                                 recursive=True))
        if not files:
            return None
        with gzip.open(files[-1]) as fh:
            data = json.load(fh)
        events = data.get('traceEvents', [])
        dev_pids = {
            e['pid'] for e in events
            if e.get('ph') == 'M' and e.get('name') == 'process_name'
            and any(t in str(e.get('args', {}).get('name', ''))
                    for t in ('TPU', 'Device', 'device'))}
        # per-step jit-module events; take the MINIMUM duration of the
        # dominant module. Later steps' spans inflate with dispatch gaps
        # when the (single, slow) host core can't keep the device fed —
        # the clean first-step span is the program's actual device time
        # (round-4 note: contended spans read 16-35 ms while the clean
        # step stays 13.01; a stall only ever ADDS time).
        by_name = {}
        for e in events:
            name = str(e.get('name', ''))
            if (e.get('ph') == 'X' and e.get('pid') in dev_pids
                    and name.lower().startswith('jit_')):
                by_name.setdefault(name, []).append(e.get('dur', 0))
        if not by_name:
            return None
        durs = max(by_name.values(), key=sum)
        return min(durs) / 1000.0
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def _bench_train_step(iters=10):
    """BASELINE config 5: resnext50 joint train step, batch 4 @ 256 px."""
    import jax
    import jax.numpy as jnp
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.data.synthetic import make_random_batch
    from masklab_tpu.models import build_masklab
    from masklab_tpu.train import (TrainState, cyclic_lr, make_train_step,
                                   rectified_adam)

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'resnext50'
    cfg.compute.compute_dtype = 'bfloat16'
    model = build_masklab(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_random_batch(4, (256, 256), 8).items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch['images'][:1])
    state = TrainState.create(variables,
                              rectified_adam(cyclic_lr(1e-4, 1e-3, 700)))
    step = make_train_step(model, with_metrics=False)
    state, _ = step(state, batch)          # warmup / compile
    jax.block_until_ready(state.params)
    # best-of-trials for the same reason as _timeit: one transient tunnel
    # stall inside a single mean mis-recorded a 20.4 ms step as 105.9 ms.
    # The step is short (~20 ms x 10 iters per trial) so stalls poison a
    # larger fraction of trials than the inference loops — use more.
    best = float('inf')
    for _ in range(10):
        start = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        jax.block_until_ready(m['loss'])
        best = min(best, time.perf_counter() - start)
    step_ms = best / iters * 1000.0

    mfu_pct = None
    flops = None
    try:
        # donated buffers: lower on a fresh state for analysis only
        compiled = step.lower(state, batch).compile()
        flops = _xla_flops(compiled)
        if flops > 0:
            mfu_pct = (100.0 * flops / (step_ms / 1000.0)
                       / _peak_flops(jax.devices()[0]))
    except Exception:
        pass

    span_ms = None
    span_mfu = None
    try:
        def run_steps(n, _s=[state]):
            for _ in range(n):
                _s[0], m = step(_s[0], batch)
            jax.block_until_ready(m['loss'])

        span_ms = _trace_module_span_ms(run_steps)
        if span_ms and flops:
            span_mfu = (100.0 * flops / (span_ms / 1000.0)
                        / _peak_flops(jax.devices()[0]))
    except Exception:
        pass
    return step_ms, mfu_pct, flops, span_ms, span_mfu


def main():
    if os.environ.get('BENCH_SELFTEST_HANG'):
        # test hook (tests/test_bench_capture.py kill-shape tests): park
        # before any device work so a test can SIGTERM/SIGALRM a live bench
        # process deterministically without TPU access
        print('bench: selftest hang', file=sys.stderr)
        sys.stderr.flush()
        time.sleep(3600)
    import jax
    # persistent compilation cache: TPU compiles go through a remote service
    # here and are expensive; cache them across processes/rounds
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    budget = float(os.environ.get('BENCH_ACQUIRE_BUDGET_S', '240'))
    _acquire_devices(budget_s=budget)
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = os.environ.get('BENCH_BACKBONE', 'mobilenet')
    # production inference setting: bf16 convs on the MXU, fp32 postprocess
    cfg.compute.compute_dtype = os.environ.get('BENCH_DTYPE', 'bfloat16')
    if os.environ.get('BENCH_COMPACTION'):
        cfg.compute.mask_compaction = \
            os.environ['BENCH_COMPACTION'].lower() in ('1', 'true')
    if os.environ.get('BENCH_CANDIDATES'):
        cfg.compute.nms_candidates_per_class = \
            int(os.environ['BENCH_CANDIDATES'])

    # batch 16: best measured throughput (585 dense / 1119 sparse vs
    # 548/900 at batch 8) with p50 batch latency ~27 ms — still inside
    # the 33 ms real-time budget per frame. Re-checked at the round-4
    # model (741 dense @ b16): batch 32 LOSES on dense (714.9, the mask
    # capacity ladder pads worse at 2x crops) and only helps sparse
    # (1614.8 vs 1405.8), so b16 stays.
    batch = int(os.environ.get('BENCH_BATCH', '16'))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    iters = int(os.environ.get('BENCH_ITERS', '20'))

    ckpt_dir = os.environ.get('BENCH_CKPT', '')
    if ckpt_dir and os.path.isdir(ckpt_dir):
        from masklab_tpu.train.checkpoints import CheckpointManager
        model = build_masklab(cfg)
        ckpt = CheckpointManager(ckpt_dir, None)
        saved = ckpt.load_config()
        if saved is not None:
            saved.compute.compute_dtype = cfg.compute.compute_dtype
            cfg = saved
            model = build_masklab(cfg)
        # restored leaves are host numpy arrays — without an explicit
        # device_put every timed call re-uploads the whole parameter tree
        # through the (tunneled) host link
        variables = jax.device_put(ckpt.restore_variables())
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(batch, size, size, 3) * 255,
                             jnp.float32)
        forward = jax.jit(lambda v, x: model.apply(v, x))
        dense_s = _timeit(forward, variables, images, iters)
        dense_fps = batch * iters / dense_s
        sparse_fps = dense_fps
        mfu_pct = flops = None
        p50 = dense_s / iters * 1000.0
        regime = f'trained_checkpoint:{ckpt_dir}'
    else:
        dense_fps, sparse_fps, mfu_pct, flops, p50 = _bench_inference(
            cfg, batch, size, iters)
        regime = 'forced_dense'

    extra = {
        'regime': regime,
        'dense_fps': round(dense_fps, 2),
        'sparse_fps': round(sparse_fps, 2),
        'mfu_pct': round(mfu_pct, 2) if mfu_pct is not None else None,
        'xla_flops_per_batch': flops,
        'batch': batch,
        'p50_batch_latency_ms': round(p50, 2),
        'backbone': cfg.backbone.backbone_type,
        'dtype': cfg.compute.compute_dtype,
        'mask_compaction': cfg.compute.mask_compaction,
        'device': str(jax.devices()[0]),
    }

    result = {
        'metric': f'masklab_joint_inference_images_per_sec_{size}px',
        'value': round(dense_fps, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(dense_fps / BASELINE_FPS, 3),
        'extra': extra,
    }
    # Emit the headline THE MOMENT it exists (round-4 post-mortem: the
    # driver's external `timeout` SIGTERM'd bench.py during the extras and
    # the round's capture was an empty tail, rc=124, with the headline
    # already measured minutes earlier). The enriched line is re-emitted
    # after the extras; the last parseable line wins.
    _emit(result)
    _save_last_good(result)

    if not os.environ.get('BENCH_SKIP_EXTRAS') and not ckpt_dir:
        # extras are best-effort: a failure must not take down the
        # headline metric the driver records
        try:
            from masklab_tpu.presets import road_project_config
            rcfg = road_project_config()
            rcfg.compute.compute_dtype = cfg.compute.compute_dtype
            rcfg.compute.mesh_data = 1    # single-chip bench
            rd, rs, rm, rf, rp = _bench_inference(rcfg, 8, size, iters)
            extra['road_preset'] = {
                'dense_fps': round(rd, 2), 'sparse_fps': round(rs, 2),
                'mfu_pct': round(rm, 2) if rm is not None else None,
                'batch': 8, 'p50_batch_latency_ms': round(rp, 2),
                'backbone': 'seresnet34+se_heads',
            }
        except Exception as exc:  # noqa: BLE001
            extra['road_preset'] = {'error': str(exc)[:200]}
        try:
            (ts_ms, ts_mfu, ts_flops, ts_span_ms,
             ts_span_mfu) = _bench_train_step()
            extra['train_step'] = {
                'step_ms': round(ts_ms, 2),
                'mfu_pct': round(ts_mfu, 2) if ts_mfu is not None else None,
                # dispatch-independent device span (VERDICT r4 item 4):
                # wall step_ms moves with tunnel jitter at a fixed span
                'trace_span_ms': round(ts_span_ms, 2)
                if ts_span_ms is not None else None,
                'trace_mfu_pct': round(ts_span_mfu, 2)
                if ts_span_mfu is not None else None,
                'xla_flops_per_step': ts_flops,
                'config': 'resnext50 b4@256 joint trainer (BASELINE cfg 5)',
            }
        except Exception as exc:  # noqa: BLE001
            extra['train_step'] = {'error': str(exc)[:200]}

    # extras mutate `extra` in place — re-emit the same result enriched
    _emit(result)
    _save_last_good(result)


_EMITTED = None


def _emit(result: dict):
    """Print one parseable JSON line and remember it for the signal path."""
    global _EMITTED
    print(json.dumps(result))
    sys.stdout.flush()
    _EMITTED = result


_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'benchmarks', 'last_good_bench.json')


def _is_default_capture() -> bool:
    """True when no BENCH_* env override changes what the driver measures —
    only such runs may stand in as the last-known-good capture."""
    return not any(os.environ.get(k) for k in (
        'BENCH_BACKBONE', 'BENCH_DTYPE', 'BENCH_COMPACTION',
        'BENCH_CANDIDATES', 'BENCH_BATCH', 'BENCH_SIZE', 'BENCH_ITERS',
        'BENCH_CKPT', 'BENCH_SKIP_EXTRAS',
        # kernel-path gates change WHAT is measured, not just how much
        'MASKLAB_NO_PALLAS_GN', 'MASKLAB_GN_KERNEL_MIN_C'))


def _save_last_good(result: dict):
    """Persist a successful default-config on-hardware capture.

    The TPU rides a tunnel with multi-hour outages (rounds 3 and 4 both
    lost driver-capture windows to it). A capture that fails AFTER a
    successful run earlier in the round should still surface that run's
    numbers — clearly labeled — instead of leaving the round evidence-free.
    Best-effort: never let bookkeeping break the benchmark itself.
    """
    if not _is_default_capture():
        return
    try:
        payload = dict(result)
        payload['captured_unix'] = time.time()
        with open(_LAST_GOOD_PATH, 'w') as f:
            json.dump(payload, f, indent=1)
            f.write('\n')
    except OSError:
        pass


def _load_last_good():
    try:
        with open(_LAST_GOOD_PATH) as f:
            data = json.load(f)
        if isinstance(data, dict) and data.get('value') is not None:
            return data
    except (OSError, ValueError):
        pass
    return None


def _emergency_exit(signame: str):
    """SIGTERM / SIGALRM path: guarantee the last stdout line is parseable.

    Round 4's capture died to an external `timeout` SIGTERM (rc=124, empty
    tail) — the third distinct outage shape after round 3's raised
    UNAVAILABLE and round 4's init hang. If the headline was already
    emitted, re-emit it (extras may be missing — noted); otherwise emit the
    error line with the labeled last_good, exactly like the exception path.
    os._exit because the main thread may be blocked inside an uncancellable
    device call.
    """
    if _EMITTED is not None:
        line = dict(_EMITTED)
        line['note'] = (f'capture interrupted by {signame} after the '
                        'headline was measured; extras may be incomplete')
        print(json.dumps(line))
        sys.stdout.flush()
        os._exit(1)
    line = {
        'metric': 'masklab_joint_inference_images_per_sec_512px',
        'value': None,
        'unit': 'images/sec/chip',
        'vs_baseline': None,
        'error': f'killed by {signame} before the headline was measured',
    }
    last = _load_last_good()
    if last is not None:
        line['last_good'] = last
    print(json.dumps(line))
    sys.stdout.flush()
    os._exit(1)


def _install_signal_handlers():
    """SIGTERM handler + internal SIGALRM watchdog (BENCH_TOTAL_BUDGET_S,
    default 900 s — conservative, under any plausible driver window) so an
    external kill can never leave an unparseable capture tail."""
    import signal

    def handler(signum, frame):  # noqa: ARG001
        name = signal.Signals(signum).name
        print(f'bench: received {name}, emitting best-known capture',
              file=sys.stderr)
        sys.stderr.flush()
        _emergency_exit(name)

    signal.signal(signal.SIGTERM, handler)
    watchdog_s = float(os.environ.get('BENCH_TOTAL_BUDGET_S', '900'))
    if watchdog_s > 0:
        signal.signal(signal.SIGALRM, handler)
        signal.alarm(max(1, int(watchdog_s)))


def run():
    """Entry wrapper: on ANY terminal failure, still print one parseable
    JSON line (with an `error` field) so the driver's capture is never an
    unparseable traceback-only tail, then exit non-zero. External
    SIGTERM / internal watchdog go through _emergency_exit, installed in
    the __main__ block — NOT here: an in-process caller (the capture
    tests import and call run()) must never inherit a live 900 s SIGALRM
    that os._exit()s its host process later (this silently killed two
    full pytest runs at minute ~21 before being traced)."""
    try:
        main()
    except (KeyboardInterrupt, SystemExit):
        raise
    except BaseException as exc:  # noqa: BLE001
        # full traceback to stderr FIRST so the JSON line is the last
        # thing in any combined-capture tail
        import traceback
        traceback.print_exc()
        sys.stderr.flush()
        line = {
            'metric': 'masklab_joint_inference_images_per_sec_512px',
            'value': None,
            'unit': 'images/sec/chip',
            'vs_baseline': None,
            'error': f'{type(exc).__name__}: {str(exc)[:400]}',
        }
        # a failed capture (tunnel outage) still surfaces the most recent
        # successful default-config run, labeled as such — never as `value`
        last = _load_last_good()
        if last is not None:
            line['last_good'] = last
        print(json.dumps(line))
        sys.stdout.flush()
        sys.exit(1)


if __name__ == '__main__':
    _install_signal_handlers()
    run()
