"""Parallelism over a TPU device mesh."""
from .mesh import (batch_sharding, make_mesh, make_parallel_eval_step,
                   make_parallel_train_step, replicate_sharding,
                   shard_batch, spatial_batch_sharding, spatial_shard_batch)

__all__ = ['make_mesh', 'batch_sharding', 'replicate_sharding',
           'shard_batch', 'spatial_batch_sharding', 'spatial_shard_batch',
           'make_parallel_train_step', 'make_parallel_eval_step']
