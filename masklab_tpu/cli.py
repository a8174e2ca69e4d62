"""Command-line entry points.

Replaces the reference's drivers:
  * ``train``   — road_project/train.py (config overrides via -group.attr
    flags, then the 3-phase trainer, then the mIoU eval loop);
  * ``eval``    — the quantitative eval alone (train.py:101-212);
  * ``serve``   — serving.py's `docker` command, minus Docker: hosts the
    jitted predictor over HTTP;
  * ``process`` — serving.py's `folder` command: batch-annotate a folder;
  * ``etl``     — road_project/setup/process.py's process_dataset.

Usage: python -m masklab_tpu.cli <command> [-group.attr value ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

from .config import ModelConfiguration


def _load_config(args) -> ModelConfiguration:
    """Build a config from optional ``--preset=<name>`` + -group.attr
    overrides (the preset plays the role of the reference driver's
    hard-coded project defaults, road_project/train.py:21-63)."""
    rest = []
    preset = None
    for a in args:
        if a.startswith('--preset='):
            preset = a.split('=', 1)[1]
        else:
            rest.append(a)
    if preset in (None, 'default'):
        cfg = ModelConfiguration()
    elif preset == 'road':
        from .presets import road_project_config
        cfg = road_project_config()
    else:
        raise SystemExit(f'unknown preset: {preset} (default|road)')
    ns = ModelConfiguration().get_arg_parser(args=rest)
    defaults = ModelConfiguration()
    # flags literally present on the command line are ALWAYS applied, even
    # when their value equals the library default — so a preset value can be
    # re-asserted back to the default (e.g. `--preset=road
    # -detection.use_squeeze_excite False`)
    explicit = set()
    for a in rest:
        if a.startswith('-'):
            key = a.lstrip('-').split('=', 1)[0]
            if key in vars(ns):
                explicit.add(key)
    for key, value in vars(ns).items():
        group, _, attr = key.partition('.')
        if attr and (key in explicit or
                     value != getattr(getattr(defaults, group), attr)):
            cfg.update(group, attr, value)
    return cfg


def cmd_train(args) -> None:
    from .train.trainer import train_masklab_model
    cfg = _load_config(args)
    stamp = time.strftime('%Y%m%d_%H%M%S')
    cfg.train.save_dir = os.path.join(cfg.train.save_dir, stamp)
    trainer = train_masklab_model(cfg)
    print(f'best checkpoint: {trainer.ckpt.best_checkpoint()}')
    cmd_eval(args, save_dir=cfg.train.save_dir)


def cmd_eval(args, save_dir: str = None) -> None:
    import jax
    import jax.numpy as jnp
    from .data.dataset import MaskLabDataset
    from .eval.miou import evaluate_dataset
    from .models.masklab import build_masklab
    from .serving.predictor import MaskLabPredictor
    from .train.checkpoints import CheckpointManager

    cfg = _load_config(args)
    save_dir = save_dir or cfg.train.save_dir
    ckpt = CheckpointManager(save_dir, None)
    # rebuild the model from the checkpoint's config snapshot — CLI flags
    # only override dataset/eval knobs, not the architecture
    saved_cfg = ckpt.load_config()
    if saved_cfg is not None:
        saved_cfg.dataset = cfg.dataset
        cfg = saved_cfg
    model = build_masklab(cfg)
    variables = ckpt.restore_variables()
    predictor = MaskLabPredictor(model, variables, cfg)
    valid_cases = cfg.dataset.valid_cases
    if not valid_cases and not cfg.dataset.train_cases:
        # mirror the reference driver: evaluate the ETL's held-out split
        # when one exists (road_project/train.py:26-27), not the train set
        from .data.process import load_split_cases
        _, valid_cases = load_split_cases(cfg.dataset.data_dir)
    validset = MaskLabDataset(valid_cases or None,
                              min_area=cfg.dataset.min_area,
                              data_dir=cfg.dataset.data_dir,
                              instance_labels=cfg.dataset.instance_labels,
                              semantic_labels=cfg.dataset.semantic_labels)
    metrics = evaluate_dataset(predictor, validset,
                               cfg.dataset.instance_labels,
                               cfg.dataset.semantic_labels)
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(save_dir, 'eval.json'), 'w') as f:
        json.dump(metrics, f, indent=2)


def _build_predictor(cfg, save_dir, mesh_data: int = 0):
    import jax
    from .models.masklab import build_masklab
    from .serving.predictor import MaskLabPredictor
    from .train.checkpoints import CheckpointManager

    if save_dir and os.path.isdir(save_dir):
        ckpt = CheckpointManager(save_dir, None)
        serving_cfg_path = os.path.join(save_dir, 'serving_config.json')
        if os.path.exists(serving_cfg_path):
            # exported serving config (cmd_export) takes precedence
            from .config import ModelConfiguration as _MC
            cfg = _MC.load_json(serving_cfg_path)
        else:
            saved_cfg = ckpt.load_config()
            if saved_cfg is not None:
                saved_cfg.postprocess = cfg.postprocess  # serving knobs
                cfg = saved_cfg
        model = build_masklab(cfg)
        variables = ckpt.restore_variables()
    else:
        model = build_masklab(cfg)
        import jax.numpy as jnp
        print('WARNING: no checkpoint dir, serving randomly-initialized '
              'weights (smoke mode)')
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    mesh = None
    if mesh_data and mesh_data > 1:
        from .parallel import make_mesh
        n = len(jax.devices())
        if n < mesh_data:
            print(f'WARNING: --mesh-data={mesh_data} but only {n} '
                  f'device(s); serving single-device')
        else:
            mesh = make_mesh(data=mesh_data)
    return MaskLabPredictor(model, variables, cfg, visualization=True,
                            mesh=mesh)


def cmd_serve(args) -> None:
    from .serving.server import MaskLabServer
    flags = ('--port', '--max-batch', '--no-watch', '--warmup',
             '--mesh-data')
    cfg = _load_config([a for a in args
                        if not a.startswith(flags)])
    port, max_batch, watch, warmup = 8501, 8, True, False
    mesh_data = 0
    warmup_sizes = []
    for a in args:
        if a.startswith('--port='):
            port = int(a.split('=', 1)[1])
        elif a.startswith('--max-batch='):
            max_batch = int(a.split('=', 1)[1])
        elif a.startswith('--mesh-data='):
            # data-parallel serving: shard micro-batches over N chips
            mesh_data = int(a.split('=', 1)[1])
        elif a == '--no-watch':
            watch = False
        elif a.startswith('--warmup-sizes='):
            # e.g. --warmup-sizes=1080x1920,720x1280 — CLIENT image sizes
            # (the jit cache is keyed by what clients actually send, which
            # need not equal postprocess.resolution — ADVICE r3)
            warmup = True
            for tok in a.split('=', 1)[1].split(','):
                if tok:
                    h, w = tok.lower().split('x')
                    warmup_sizes.append((int(h), int(w)))
        elif a == '--warmup':
            warmup = True
    if warmup and not warmup_sizes:
        warmup_sizes = [tuple(cfg.postprocess.resolution)]
    predictor = _build_predictor(cfg, cfg.train.save_dir, mesh_data)
    if warmup:
        # pre-compile every (client size, batch bucket, mode) combination
        # so the first concurrent burst never pays a remote compile
        from .serving.batching import default_buckets
        buckets = default_buckets(max_batch)
        sizes = [(h, w, bb, mode)
                 for (h, w) in warmup_sizes for bb in buckets
                 for mode in ('visualize', 'summarize')]
        print(f'warming {len(sizes)} pipelines...')
        predictor.warmup(sizes)
    watch_dir = cfg.train.save_dir if (
        watch and cfg.train.save_dir
        and os.path.isdir(cfg.train.save_dir)) else None
    server = MaskLabServer(predictor, port=port,
                           instance_labels=cfg.dataset.instance_labels,
                           max_batch=max_batch, watch_dir=watch_dir)
    print(f'serving on :{port} (POST /predict, GET /healthz, '
          f'POST /reload; micro-batch<={max_batch}, '
          f'hot-reload={"on" if watch_dir else "off"})')
    server.start(background=False)


def cmd_process(args) -> None:
    """``process <src> <dst> [--batch=N] [overrides]``.

    ``--batch=N`` (N>1) selects the big-batch THROUGHPUT regime for
    offline, latency-insensitive runs — measured 1614.8 img/s sparse
    @ b32 on v5e vs 1405.8 @ b16 (docs/PERFORMANCE.md). Default stays
    per-image (lowest compile footprint, first-result latency).
    """
    from .serving.server import process_folder
    paths = [a for a in args if not a.startswith('-')]
    if len(paths) < 2:
        raise SystemExit(
            'usage: process <src_dir> <dst_dir> [--batch=N] [overrides]')
    src, dst = paths[0], paths[1]
    batch = 1
    overrides = []
    for a in args:
        if a.startswith('--batch='):
            batch = int(a.split('=', 1)[1])
        elif a.startswith('-') and a not in (src, dst):
            overrides.append(a)
    cfg = _load_config(overrides)
    predictor = _build_predictor(cfg, cfg.train.save_dir)
    results = process_folder(predictor, src, dst,
                             cfg.dataset.instance_labels, batch_size=batch)
    print(f'processed {len(results)} images -> {dst} (batch={batch})')


def cmd_export(args) -> None:
    """Export a trained checkpoint as a deployable serving artifact.

    Two forms:

    * ``export <save_dir> [-postprocess.* ...]`` — refresh the
      serving_config.json next to the weights (the reference's
      ``save_hyundai_model_with_visualization`` role, serving.py:112-151:
      rebuild the export with custom colors/alphas/smoothing/road-size).
    * ``export <save_dir> --dest=<bundle_root> [--h5] [-postprocess.*]``
      — write a SELF-CONTAINED versioned bundle
      ``<bundle_root>/<version>/`` (the reference's deployment contract:
      road_project/setup/serving.py:56-84 writes ``model/{version}/``
      SavedModels a stock TF-Serving container loads with zero Python
      context). The bundle carries the best checkpoint (orbax), the
      architecture config.json, the serving_config.json, and — with
      ``--h5``, when the reference's TF code is importable — the weights
      in the reference's own h5 format.
      ``serve -train.save_dir <bundle_root>/<version>`` loads it as-is.
    """
    if not args or args[0].startswith('-'):
        raise SystemExit('usage: export <save_dir> [--dest=<bundle_root>] '
                         '[--h5] [-postprocess.* ...]')
    save_dir = args[0]
    dest = None
    want_h5 = False
    rest = []
    for a in args[1:]:
        if a.startswith('--dest='):
            dest = a.split('=', 1)[1]
        elif a == '--h5':
            want_h5 = True
        else:
            rest.append(a)
    from .train.checkpoints import CheckpointManager
    ckpt = CheckpointManager(save_dir, None)
    cfg = ckpt.load_config() or ModelConfiguration()
    # parse overrides WITH cfg as the defaults source: flags not passed
    # keep the run's saved values (a fresh-defaults parse here used to
    # silently reset every postprocess knob the run had saved/tuned)
    cfg.apply_namespace(cfg.get_arg_parser(args=rest))

    if dest is None:
        cfg.save_json(os.path.join(save_dir, 'serving_config.json'))
        print(f'serving config exported to {save_dir}/serving_config.json')
        return

    import shutil
    best = ckpt.best_checkpoint()
    if best is None:
        raise SystemExit(f'no checkpoints in {save_dir}')
    os.makedirs(dest, exist_ok=True)
    existing = [int(n) for n in os.listdir(dest) if n.isdigit()]
    version = max(existing, default=0) + 1
    bundle = os.path.join(dest, str(version))
    os.makedirs(bundle)
    shutil.copytree(best, os.path.join(bundle, os.path.basename(best)))
    cfg.save_json(os.path.join(bundle, 'config.json'))
    cfg.save_json(os.path.join(bundle, 'serving_config.json'))
    if want_h5:
        _export_reference_h5(cfg, bundle)
    print(f'bundle exported to {bundle} '
          f'(serve with: -train.save_dir {bundle})')


def _export_reference_h5(cfg, bundle: str) -> None:
    """Best-effort reference-format h5 into the bundle (flax -> reference
    transplant, utils/keras_export.py). Needs the reference checkout + TF
    importable; failure must not void the bundle itself."""
    try:
        from .train.checkpoints import CheckpointManager
        from .utils import keras_export as ke
        variables = CheckpointManager(bundle, None).restore_variables()
        net = ke.build_reference_inference_network(cfg)
        ke.transplant_into_reference(variables, cfg, net)
        ke.save_reference_h5(net, os.path.join(bundle, 'model.h5'))
        print(f'reference-format weights: {bundle}/model.h5')
    except Exception as exc:  # noqa: BLE001 — optional interchange artifact
        print(f'WARNING: --h5 export skipped ({type(exc).__name__}: '
              f'{str(exc)[:200]})', file=sys.stderr)


def cmd_etl(args) -> None:
    from .data.process import process_dataset
    cfg = _load_config([a for a in args if a.startswith('-')])
    process_dataset(cfg.dataset.data_dir,
                    except_semantic_labels=cfg.dataset.except_semantic_labels)
    print(f'ETL complete: {cfg.dataset.data_dir}/processed')


COMMANDS = {'train': cmd_train, 'eval': cmd_eval, 'serve': cmd_serve,
            'process': cmd_process, 'etl': cmd_etl, 'export': cmd_export}


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in COMMANDS:
        raise SystemExit(
            f'usage: python -m masklab_tpu.cli {{{"|".join(COMMANDS)}}} '
            '[-group.attr value ...]')
    COMMANDS[argv[0]](argv[1:])


if __name__ == '__main__':
    main()
