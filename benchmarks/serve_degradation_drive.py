"""Hardware drive for serving compile resilience (VERDICT r3 item 5).

Round 3's --max-batch=16 server run died silently during the batch-16
bucket's first compile on the dev tunnel. Round 4 reworked MicroBatcher
to a warm/suspend model (serving/batching.py): a bucket whose FIRST run
fails is suspended with doubling cooldown and requests ride the next
smaller bucket. This script reproduces the original failure shape on the
real TPU: start an in-process server at max_batch=16, fire a concurrent
client burst, and assert (a) every request gets an answer, (b) the
process survives, (c) the suspended-bucket log line appears if the
batch-16 compile fails.

Run on hardware (after tunnel return):
    timeout 1800 python benchmarks/serve_degradation_drive.py
"""
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving import MaskLabPredictor, MaskLabServer

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'seresnet34'
    cfg.backbone.backbone_outputs = ('C3', 'C4', 'C5')
    cfg.detection.feature_pyramid_inputs = ('C3', 'C4', 'C5')
    cfg.postprocess.resolution = (512, 512)

    model = build_masklab(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 128, 128, 3)))
    predictor = MaskLabPredictor(model, variables, cfg, visualization=True)

    port = 18790
    server = MaskLabServer(predictor, port=port, max_batch=16)
    server.start(background=True)
    time.sleep(1.0)

    image = np.uint8(np.random.RandomState(0).rand(512, 512, 3) * 255)
    ok, buf = cv2.imencode('.jpg', image)
    body = bytes(buf.tobytes())

    results = []
    lock = threading.Lock()

    def client(i):
        t0 = time.time()
        try:
            req = urllib.request.Request(
                f'http://localhost:{port}/predict?outputs=summarize',
                data=body, method='POST')
            with urllib.request.urlopen(req, timeout=900) as resp:
                payload = json.loads(resp.read())
                status = 'ok' if 'objs' in payload else 'bad'
        except Exception as exc:  # noqa: BLE001 — recording outcomes
            status = f'error: {exc}'
        with lock:
            results.append((i, status, time.time() - t0))

    # 24 concurrent clients forces the batcher through the 16 bucket
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(24)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    n_ok = sum(1 for _, s, _ in results if s == 'ok')
    print(f'\n{n_ok}/24 ok in {wall:.1f}s '
          f'({24 / wall:.1f} req/s incl. compiles)')
    for i, s, dt in sorted(results):
        if s != 'ok':
            print(f'  client {i}: {s} ({dt:.1f}s)')
    # second burst: everything compiled or suspended now — must be fast
    results.clear()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(24)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    n_ok2 = sum(1 for _, s, _ in results if s == 'ok')
    print(f'warm burst: {n_ok2}/24 ok in {wall:.1f}s '
          f'({24 / wall:.1f} req/s)')
    print(json.dumps({'cold_ok': n_ok, 'warm_ok': n_ok2,
                      'warm_req_s': round(24 / wall, 1),
                      'survived': True}))
    sys.exit(0 if (n_ok == 24 and n_ok2 == 24) else 1)


if __name__ == '__main__':
    main()
