"""The canonical training driver: 3-phase progressive unfreezing.

Functional re-design of ``train_masklab_model`` (engine/train.py:21-239):
  * config snapshot to config.json (train.py:31-32);
  * datasets + generators (valid batch = 4x train batch, train.py:50);
  * smoke check: one tiny-LR step at max scale proves the graph trains and
    memory fits before real training (train.py:77-110);
  * three phases — head-tune (freeze <= C5), waist-tune (freeze <= C2),
    all-tune (C0) — each re-masking the optimizer for the phase's freeze
    depth, with its own CyclicLR(base, max, step) schedule and
    steps_per_epoch = step_size // 2 (train.py:117-238);
  * per-epoch checkpointing named "{loss:.5f}-{epoch}" (SaveInferenceModel);
  * data parallelism over the mesh 'data' axis replaces ParallelModel.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfiguration
from ..data.dataset import MaskLabDataset
from ..data.generator import (MaskLabGenerator, MultiprocessLoader,
                              PrefetchIterator, pad_boxes_to)
from ..models.masklab import MaskLab, build_masklab
from ..parallel.mesh import (batch_sharding, make_mesh,
                             make_parallel_eval_step,
                             make_parallel_train_step, replicate_sharding,
                             shard_batch)
from .checkpoints import CheckpointManager
from .optimizers import cyclic_lr, masked_updates, rectified_adam
from .state import TrainState, trainable_mask
from .steps import make_eval_step, make_train_step
from ..losses import BoxLossState
from ..utils.loggers import (CSVLogger, MLflowLogger, MultiLogger,
                             TensorBoardLogger)


def construct_masklab_datasets(config: ModelConfiguration):
    """MaskLabDataset pair from config (retinamasklab.py:398-417).

    When the config names no explicit cases, the ETL's seed-777 90/10
    split CSVs are used if present — the reference driver loads them into
    train_cases/valid_cases itself (road_project/train.py:24-27); without
    them, training-on-everything silently made validation an overfit echo.
    Datasets too small for a held-out row (valid.csv empty) fall back to
    all-images for both, preserving the tiny-fixture behavior.
    """
    d = config.dataset
    if not d.train_cases and not d.valid_cases:
        from ..data.process import load_split_cases
        train_cases, valid_cases = load_split_cases(d.data_dir)
        if train_cases is not None:
            d.train_cases = train_cases
            d.valid_cases = valid_cases
    trainset = MaskLabDataset(d.train_cases or None, min_area=d.min_area,
                              data_dir=d.data_dir,
                              instance_labels=d.instance_labels,
                              semantic_labels=d.semantic_labels)
    validset = MaskLabDataset(d.valid_cases or None, min_area=d.min_area,
                              data_dir=d.data_dir,
                              instance_labels=d.instance_labels,
                              semantic_labels=d.semantic_labels)
    return trainset, validset


class MaskLabTrainer:
    """Owns model/state and runs the progressive-unfreeze schedule."""

    def __init__(self, config: ModelConfiguration,
                 max_gt_boxes: int = 16, log_fn: Callable = print):
        self.config = config
        self.model = build_masklab(config)
        self.max_gt_boxes = max_gt_boxes
        self.log = log_fn
        self.mesh = make_mesh(data=max(1, min(
            config.compute.mesh_data or len(jax.devices()),
            len(jax.devices()))))
        self.state: Optional[TrainState] = None
        self.ckpt = CheckpointManager(config.train.save_dir, config)
        self.history: Dict[str, list] = {}
        self.mlflow = MLflowLogger(
            run_name=os.path.basename(config.train.save_dir.rstrip('/')))
        self.metrics_logger = MultiLogger(
            CSVLogger(os.path.join(config.train.save_dir, 'metrics.csv')),
            TensorBoardLogger(os.path.join(config.train.save_dir, 'tb')),
            self.mlflow)
        # param logging at run start (road_project/train.py:68-87 logged the
        # driver's config into MLflow before fitting)
        self.mlflow.log_params({
            f'{group}.{key}': value
            for group, attrs in config.to_dict().items()
            for key, value in attrs.items()})
        self._global_epoch = 0

    # ---- setup ----

    def init_state(self, sample_batch: Dict) -> None:
        variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(0),
            jnp.asarray(sample_batch['images'][:1]))
        # placeholder optimizer; re-built per phase
        tx = rectified_adam(1e-10)
        self.state = TrainState.create(
            variables, tx, box_beta=self.config.loss.box_loss_beta)

    def _phase_tx(self, base_lr, max_lr, step_size, freeze_depth):
        """-> (tx, schedule): one schedule object serves both the
        optimizer and the epoch lr log, so they cannot diverge."""
        schedule = cyclic_lr(base_lr, max_lr, step_size)
        mask = trainable_mask(self.state.params,
                              self.config.backbone.backbone_type,
                              freeze_depth)
        tx = optax.chain(rectified_adam(schedule), masked_updates(mask))
        return tx, schedule

    def _rebuild_state_for_phase(self, tx) -> None:
        """New optimizer per phase (the reference recompiled each phase,
        resetting optimizer state — train.py:117-238)."""
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=self.state.params,
            batch_stats=self.state.batch_stats, opt_state=tx.init(
                self.state.params),
            box_loss_state=self.state.box_loss_state, tx=tx)

    # ---- running ----

    def _prepare(self, batch: Dict) -> Dict:
        batch = pad_boxes_to(batch, self.max_gt_boxes)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def run_phase(self, name: str, generator: MaskLabGenerator,
                  valid_generator: Optional[MaskLabGenerator],
                  epochs: int, base_lr: float, max_lr: float,
                  step_size: int, freeze_depth: str,
                  steps_per_epoch: Optional[int] = None) -> None:
        tx, schedule = self._phase_tx(base_lr, max_lr, step_size,
                                      freeze_depth)
        self._rebuild_state_for_phase(tx)
        multi = self.mesh.devices.size > 1
        seed = self.config.train.seed
        if multi:
            step_fn = make_parallel_train_step(self.model, self.mesh,
                                               donate=True, seed=seed)
            self.state = jax.device_put(self.state,
                                        replicate_sharding(self.mesh))
        else:
            step_fn = make_train_step(self.model, donate=True, seed=seed)
        # validation rides the mesh like training when the valid batch
        # divides across it; otherwise (or single-device) plain jit
        eval_fn = None
        eval_sharded = False
        if valid_generator:
            if multi and valid_generator.batch_size \
                    % self.mesh.devices.size == 0:
                eval_fn = make_parallel_eval_step(self.model, self.mesh)
                eval_sharded = True
            else:
                eval_fn = make_eval_step(self.model)
        steps = steps_per_epoch if steps_per_epoch is not None \
            else max(1, step_size // 2)
        # worker-process batch building (fit_generator's worker pool) when
        # configured; otherwise the in-process thread prefetch
        t = self.config.train
        loader = None
        if t.use_multiprocessing and t.data_workers > 0:
            loader = MultiprocessLoader(
                generator.dataset.get_config(),
                num_workers=t.data_workers,
                batch_size=generator.batch_size,
                scale_ratio=generator.scale_ratio,
                scale_buckets=tuple(generator.scale_buckets),
                shuffle=generator.shuffle, seed=seed)
        source = loader if loader is not None else generator

        try:
            self._run_epochs(name, source, valid_generator, epochs,
                             schedule, step_fn, eval_fn, steps, multi,
                             eval_sharded)
        finally:
            # the spawned worker pool must not leak even if a step raises
            if loader is not None:
                loader.close()

    def _run_epochs(self, name, source, valid_generator, epochs, schedule,
                    step_fn, eval_fn, steps, multi,
                    eval_sharded: bool = False) -> None:
        # ONE prefetcher continues across the phase's epoch boundaries,
        # exactly like the reference's OrderedEnqueuer under
        # steps_per_epoch < len(sequence): batches keep advancing through
        # the dataset and the generator's end-of-iteration shuffle fires
        # at the TRUE end of the data. The old per-epoch recreation (a)
        # abandoned a fill thread blocked on q.put each epoch (leaking
        # prefetch-many full batches per abandonment), (b) restarted at
        # index 0 so every epoch retrained on the same leading `steps`
        # batches, and (c) never reached the generator's shuffle
        # (round-4 review finding).
        prefetcher = PrefetchIterator(source, prefetch=4)
        it = iter(prefetcher)
        try:
            self._run_epochs_inner(name, source, valid_generator, epochs,
                                   schedule, step_fn, eval_fn, steps,
                                   multi, eval_sharded, prefetcher, it)
        finally:
            # self._prefetcher tracks rotation on dataset exhaustion
            getattr(self, '_prefetcher', prefetcher).close()

    def _run_epochs_inner(self, name, source, valid_generator, epochs,
                          schedule, step_fn, eval_fn, steps, multi,
                          eval_sharded, prefetcher, it) -> None:
        self._prefetcher = prefetcher
        for epoch in range(epochs):
            t0 = time.time()
            step_metrics = []
            for step_idx in range(steps):
                try:
                    batch = next(it)
                except StopIteration:
                    # dataset exhausted: the source just ran its epoch-end
                    # shuffle; rotate to a fresh pass
                    self._prefetcher.close()
                    self._prefetcher = PrefetchIterator(source, prefetch=4)
                    it = iter(self._prefetcher)
                    batch = next(it)
                batch = self._prepare(batch)
                if multi:
                    batch = shard_batch(batch, self.mesh)
                self.state, metrics = step_fn(self.state, batch)
                # keep the DEVICE scalars; float() here would block the
                # dispatch pipeline on every step's completion (~80 ms
                # tunnel round trip per step on the dev setup)
                step_metrics.append(metrics)
            # every logged metric is the epoch MEAN over steps (the
            # reference's fit_generator averaged losses/metrics per epoch)
            epoch_metrics = {
                k: float(np.mean([float(m[k]) for m in step_metrics]))
                for k in (step_metrics[0] if step_metrics else {})}
            train_loss = epoch_metrics.get('loss', float('nan'))
            log_line = (f'[{name}] epoch {epoch + 1}/{epochs} '
                        f'loss={train_loss:.5f} '
                        f'({time.time() - t0:.1f}s)')
            val_loss = None
            if eval_fn is not None and len(valid_generator) > 0:
                # full pass over the valid generator each epoch (the
                # reference validates on the whole validation_data iterator,
                # engine/train.py:106-153), not a single batch
                vrows = []
                for vi in range(len(valid_generator)):
                    vb = self._prepare(valid_generator[vi])
                    if eval_sharded:
                        vb = shard_batch(vb, self.mesh)
                    vm = eval_fn(self.state, vb)
                    vrows.append({k: float(v) for k, v in vm.items()})
                for k in vrows[0]:
                    epoch_metrics[f'val_{k}'] = float(
                        np.mean([r[k] for r in vrows]))
                val_loss = epoch_metrics['val_loss']
                log_line += f' val_loss={val_loss:.5f}'
            self.log(log_line)
            self.history.setdefault(f'{name}_loss', []).append(train_loss)
            epoch_metrics['train_loss'] = train_loss
            # lr history (the reference CyclicLR callback's history dict)
            epoch_metrics['lr'] = float(schedule(int(self.state.step)))
            self.metrics_logger.log(self._global_epoch, epoch_metrics)
            self._global_epoch += 1
            self.ckpt.save_epoch(self.state,
                                 val_loss if val_loss is not None
                                 else train_loss, epoch)

    def smoke_check(self, generator: MaskLabGenerator,
                    num_steps: int = 1) -> None:
        """Tiny-LR fit proving the graph compiles/trains (train.py:77-110).

        Rides the SAME mesh shardings as the real phases — an unsharded
        step would place the full global batch on one device and could
        OOM-abort a run whose per-device shards actually fit (round-4
        review finding)."""
        if num_steps <= 0:
            self.log('smoke check skipped (num_steps=0)')
            return
        tx = optax.chain(
            rectified_adam(1e-10),
            masked_updates(trainable_mask(
                self.state.params, self.config.backbone.backbone_type,
                'C0')))
        self._rebuild_state_for_phase(tx)
        multi = self.mesh.devices.size > 1
        if multi:
            step_fn = make_parallel_train_step(self.model, self.mesh,
                                               with_metrics=False)
            self.state = jax.device_put(self.state,
                                        replicate_sharding(self.mesh))
        else:
            step_fn = make_train_step(self.model, with_metrics=False)
        for i in range(num_steps):
            batch = self._prepare(generator[i % max(1, len(generator))])
            if multi:
                batch = shard_batch(batch, self.mesh)
            self.state, metrics = step_fn(self.state, batch)
            loss = float(metrics['loss'])
            if not np.isfinite(loss):
                raise FloatingPointError(f'smoke check loss={loss}')
        self.log(f'smoke check OK — loss={loss:.5f}')


def train_masklab_model(config: ModelConfiguration,
                        max_gt_boxes: int = 16,
                        steps_per_epoch: Optional[int] = None,
                        smoke_steps: int = 1) -> MaskLabTrainer:
    """The canonical train() entry (engine/train.py:21-239)."""
    t = config.train
    os.makedirs(t.save_dir, exist_ok=True)

    trainset, validset = construct_masklab_datasets(config)
    train_gen = MaskLabGenerator(
        trainset.get_config(), scale_ratio=t.scale_ratio,
        batch_size=t.batch_size,
        scale_buckets=config.compute.scale_buckets, seed=t.seed)
    # valid batch = 4x train batch (engine/train.py:50), clamped so small
    # validation sets still yield at least one full batch
    valid_gen = MaskLabGenerator(
        validset.get_config(), scale_ratio=t.scale_ratio,
        batch_size=min(t.batch_size * 4, t.max_batch_size,
                       max(1, len(validset))),
        scale_buckets=config.compute.scale_buckets) \
        if len(validset) else None

    trainer = MaskLabTrainer(config, max_gt_boxes=max_gt_boxes)
    trainer.init_state(train_gen[0])
    # smoke check at the LARGEST scale bucket — proves the training graph
    # compiles and the worst-case memory fits before real training, like
    # the reference's max-scale 1+10-step fit (engine/train.py:84-110)
    max_scale = max(train_gen.scale_buckets)
    smoke_gen = MaskLabGenerator(
        trainset.get_config(), scale_ratio=(max_scale, max_scale),
        batch_size=t.batch_size, scale_buckets=(max_scale,), shuffle=False)
    trainer.smoke_check(smoke_gen, num_steps=smoke_steps)

    if t.train_head_tune:
        trainer.run_phase('head', train_gen, valid_gen,
                          t.train_head_tune_epoch, t.head_base_lr,
                          t.head_max_lr, t.head_step_size,
                          t.train_head_level, steps_per_epoch)
    if t.train_waist_tune:
        trainer.run_phase('waist', train_gen, valid_gen,
                          t.train_waist_tune_epoch, t.waist_base_lr,
                          t.waist_max_lr, t.waist_step_size,
                          t.train_waist_level, steps_per_epoch)
    if t.train_all:
        trainer.run_phase('all', train_gen, valid_gen, t.train_all_epoch,
                          t.all_base_lr, t.all_max_lr, t.all_step_size,
                          'C0', steps_per_epoch)
    with open(os.path.join(t.save_dir, 'history.json'), 'w') as f:
        json.dump(trainer.history, f, indent=2)
    # artifact logging at run end (road_project/train.py:211-212 pushed the
    # trained model + metrics into MLflow); no-op when mlflow is absent
    for artifact in ('history.json', 'metrics.csv', 'config.json'):
        path = os.path.join(t.save_dir, artifact)
        if os.path.exists(path):
            trainer.mlflow.log_artifact(path)
    # the best WEIGHTS travel to MLflow too (the reference logged the best
    # h5 into the run, road_project/train.py:86-87)
    best = trainer.ckpt.best_checkpoint()
    if best is not None:
        trainer.mlflow.log_artifact_dir(best, os.path.basename(best))
    trainer.metrics_logger.close()
    return trainer
