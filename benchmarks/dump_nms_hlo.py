"""Dump optimized HLO for the real NMS at the in-model shape; summarize
the largest fusions/ops by output size to find the 5 ms culprit."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    txt = fn.lower(scores, boxes).compile().as_text()
    out = '/tmp/nms_hlo.txt'
    with open(out, 'w') as f:
        f.write(txt)
    print('wrote', out, len(txt), 'bytes')
    # crude summary: count op kinds and big shapes
    kinds = {}
    for line in txt.splitlines():
        m = re.search(r'= (\w+)\(', line)
        if not m:
            continue
        k = m.group(1)
        kinds[k] = kinds.get(k, 0) + 1
    for k, v in sorted(kinds.items(), key=lambda kv: -kv[1])[:20]:
        print(f'{k:24s} {v}')
    print('--- sort/top-k related lines ---')
    for line in txt.splitlines():
        if re.search(r'sort|top-k|TopK', line) and '=' in line:
            print(line.strip()[:200])


if __name__ == '__main__':
    main()
