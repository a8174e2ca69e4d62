"""Capture a device trace of the real NMS and the bare sort; parse the
xplane for the top device ops by self time."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def top_ops(trace_dir, limit=15):
    """Parse xplane.pb via tensorflow profiler proto; fall back to raw
    event names if unavailable."""
    files = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    if not files:
        return ['<no xplane found>']
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover
        return [f'<cannot parse: {e}>']
    out = []
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, 'rb') as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if 'TPU' not in plane.name and 'tpu' not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            totals = {}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, '?')
                    totals[name] = totals.get(name, 0) + ev.duration_ps
            rows = sorted(totals.items(), key=lambda kv: -kv[1])[:limit]
            out.append(f'== plane {plane.name} ==')
            for name, ps in rows:
                out.append(f'{ps/1e9:10.3f} ms  {name[:110]}')
    return out


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu.ops.nms import batched_class_aware_nms

    b, n, c = 8, 81840, 6
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(rng.rand(b, n, 4) * 512, jnp.float32)
    scores = jnp.asarray(rng.rand(b, n, c), jnp.float32)
    kw = dict(min_confidence=0.5, nms_iou_threshold=0.4,
              post_iou_threshold=0.65, max_outputs=100,
              candidates_per_class=256)
    fn = jax.jit(lambda s, bx: batched_class_aware_nms(s, bx, **kw))
    out = fn(scores, boxes)
    jax.block_until_ready(out)

    trace_dir = '/tmp/nms_trace'
    os.system(f'rm -rf {trace_dir}')
    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        out = fn(scores, boxes)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    for line in top_ops(trace_dir):
        print(line)


if __name__ == '__main__':
    main()
