"""Multi-host (multi-process) training support.

The reference's parallelism stopped at single-host in-graph replication
(engine/parallel.py:21-107). The TPU-native scaling story continues past
one host: each process owns its local chips, ``jax.distributed.initialize``
forms the global runtime, and the SAME ``make_parallel_train_step`` train
step runs over a global mesh — GSPMD places the gradient reductions on ICI
within a slice and DCN across slices, with no framework changes.

This module is both a library (``initialize`` + ``global_batch`` +
``replicate_state``) and a worker entry point::

    python -m masklab_tpu.parallel.multihost \
        --coordinator=localhost:9876 --num_processes=2 --process_id=0 \
        --local_devices=4 --shape=small

which runs ONE production train step over the 2-process global mesh and
prints the (replicated) loss. tests/test_multihost.py launches two of these
against a local coordinator to prove the cross-process path end to end.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict

__all__ = ['initialize', 'global_batch', 'replicate_state', 'run_one_step']


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """``jax.distributed.initialize`` with the local CPU/TPU backend.

    Must be called before any other JAX API touches the backend. On real
    multi-host TPU pods the three arguments are inferred from the TPU
    metadata and this reduces to ``jax.distributed.initialize()``.
    """
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch(batch: Dict, mesh) -> Dict:
    """Assemble a global data-sharded batch from per-process local batches.

    Each process passes only ITS shard (local batch); the result is a global
    ``jax.Array`` whose leading axis spans all processes — the multi-host
    generalisation of ``shard_batch``.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P('data'))
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in batch.items()}


def replicate_state(state, mesh):
    """Promote identically-initialised host-local state to global replicated
    arrays (every process must hold the same values, e.g. same PRNG seed)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), state)


def _worker_config(shape: str):
    """'small' = the dryrun toy config; 'road' = the production road-preset
    architecture (seresnet34 + SE heads, full feature widths) at reduced
    resolution."""
    if shape == 'road':
        from ..presets import road_project_config
        cfg = road_project_config()
        # keep NMS pools modest so the one-step proof compiles quickly;
        # the architecture (widths/depths/backbone) stays production
        cfg.detection.nms_max_output_size = 8
        cfg.loss.nms_max_output_size = 8
        cfg.compute.nms_candidates_per_class = 16
        return cfg, (128, 128)
    from ..config import ModelConfiguration
    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.num_features = 64
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 64
        g.num_depth = 1
    cfg.semantic.num_aspp_features = 64
    cfg.detection.nms_max_output_size = 8
    cfg.loss.nms_max_output_size = 8
    cfg.compute.nms_candidates_per_class = 16
    return cfg, (128, 128)


def check_nms_pool() -> None:
    """Prove the multi-process NMS candidate pool is sort-free AND exact.

    Round 2 fell back to the full-sort ``lax.top_k`` whenever
    ``jax.process_count() > 1``; the pool now runs under ``shard_local_nms``
    (shard-local certificate + branch, zero collectives). This compiles
    the pool at bench anchor count over the GLOBAL mesh, extends the
    single-process sort-free regression guard
    (tests/test_ops_parity.py:334) to the multi-process HLO, executes it
    across processes, and checks the gathered result against a host-side
    exact top-k reference.
    """
    import re
    import jax
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .mesh import make_mesh
    from ..ops.nms import candidate_pool, shard_local_nms

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    mesh = make_mesh(data=n_global, model=1)
    b, c, n = n_global, 6, 81840          # the 512 px bench anchor count
    k, floor = 256, 0.05
    rng = np.random.RandomState(7)
    # two-decimal quantization manufactures thousands of exact score ties
    # per row — the certificate must be tie-robust to stay on the fast path
    full = rng.rand(b, c, n).astype(np.float32).round(2)
    start = jax.process_index() * n_local
    sharding = NamedSharding(mesh, P('data'))
    garr = jax.make_array_from_process_local_data(
        sharding, full[start:start + n_local])
    fn = jax.jit(lambda s: candidate_pool(s, k, floor, sort_below=0),
                 in_shardings=sharding, out_shardings=(sharding, sharding))
    with shard_local_nms(mesh):
        txt = fn.lower(garr).compile().as_text()
        big = [ln for ln in txt.splitlines()
               if re.search(r'sort.*\[[^]]*81[0-9]{3}', ln)]
        assert not big, f'O(N) sort in multi-process NMS HLO: {big[:2]}'
        vals, idxs = fn(garr)
    vals = np.asarray(multihost_utils.process_allgather(
        vals, tiled=True)).reshape(b * c, k)
    idxs = np.asarray(multihost_utils.process_allgather(
        idxs, tiled=True)).reshape(b * c, k)
    # host-side exact reference: top-k by (value desc, index asc)
    flat = full.reshape(b * c, n)
    iota = np.broadcast_to(np.arange(n), flat.shape)
    order = np.lexsort((iota, -flat), axis=-1)[:, :k]
    ref_v = np.take_along_axis(flat, order, axis=-1)
    assert ref_v.min() >= floor, 'fixture: top-k must clear the floor'
    np.testing.assert_array_equal(vals, ref_v)
    np.testing.assert_array_equal(idxs.astype(np.int64), order)
    print(f'NMS_POOL_OK process={jax.process_index()} sort_free exact',
          flush=True)


def run_one_step(shape: str = 'small', batch_per_device: int = 1) -> float:
    """One data-parallel train step over the GLOBAL mesh; returns the loss.

    Call after ``initialize`` (or single-process for a local smoke run).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ..data.synthetic import make_random_batch
    from ..models import build_masklab
    from ..train import TrainState, cyclic_lr, rectified_adam
    from .mesh import make_mesh, make_parallel_train_step

    cfg, hw = _worker_config(shape)
    model = build_masklab(cfg)
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())

    # every process builds the SAME initial state (seed 0) …
    local_batch = make_random_batch(
        batch_per_device * n_local, hw, 3,
        num_det_classes=len(cfg.dataset.instance_labels),
        num_seg_classes=len(cfg.dataset.semantic_labels),
        seed=jax.process_index())
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(local_batch['images'][:1]))
    tx = rectified_adam(cyclic_lr(1e-4, 1e-3, 700))
    state = TrainState.create(variables, tx, box_beta=cfg.loss.box_loss_beta)

    mesh = make_mesh(data=n_global, model=1)
    # … then promotes it to replicated global arrays and shards its LOCAL
    # batch into the global data axis
    state = replicate_state(state, mesh)
    batch = global_batch(local_batch, mesh)
    step = make_parallel_train_step(model, mesh, with_metrics=False)
    with mesh:
        state, metrics = step(state, batch)
        loss = float(jax.block_until_ready(metrics['loss']))
    assert np.isfinite(loss), f'non-finite loss: {loss}'
    return loss


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument('--coordinator', required=True)
    p.add_argument('--num_processes', type=int, required=True)
    p.add_argument('--process_id', type=int, required=True)
    p.add_argument('--local_devices', type=int, default=4)
    p.add_argument('--shape', default='small', choices=('small', 'road'))
    args = p.parse_args(argv)

    # host-platform overrides must land before the backend initializes
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count='
            f'{args.local_devices}').strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/root/.jax_cache_cpu'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

    initialize(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    # establish the global collective communicator NOW, while the
    # processes are in lockstep right after initialize: gloo context
    # creation has a fixed 30 s key-value rendezvous deadline, and
    # creating it lazily at the first collective of the big train step
    # puts that deadline at the mercy of per-process trace/compile skew
    # (minutes apart on a contended single-core host). The train step's
    # collectives reuse the communicator built here.
    import jax.numpy as jnp
    warm = jax.pmap(lambda v: jax.lax.psum(v, 'i'), axis_name='i')(
        jnp.ones((len(jax.local_devices()), 1)))
    assert float(warm[0, 0]) == len(jax.devices())
    check_nms_pool()
    loss = run_one_step(args.shape)
    print(f'MULTIHOST_OK process={jax.process_index()}/'
          f'{jax.process_count()} devices={len(jax.devices())} '
          f'loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
