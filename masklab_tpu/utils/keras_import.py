"""Keras .h5 checkpoint import for parity testing.

The reference checkpoints whole inference models to h5 and rebuilds them by
layer-name regex (engine/callbacks.py:152-158, retinamasklab.py:528-584).
For numeric-parity testing against reference-trained weights, this module
reads an h5 weight file (h5py) and maps Keras conv/dense/GN weights onto
the flax parameter tree.

Conventions handled:
  * Conv2D kernel [kh, kw, in, out] — identical layout in flax;
  * DepthwiseConv2D kernel [kh, kw, in, mult] -> flax grouped-conv kernel
    [kh, kw, 1, in*mult];
  * Dense [in, out] — identical;
  * GroupNormalization gamma/beta -> flax GroupNorm scale/bias;
  * BatchNorm gamma/beta/moving_mean/moving_var -> params + batch_stats.

Full-model import requires a per-backbone layer-name map; this round ships
the generic machinery plus an ordered-assignment fallback
(``assign_in_order``) that fills a flax subtree from the h5 file's
creation-ordered weight list — sufficient for like-for-like architectures.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def read_h5_weights(path: str) -> List[Tuple[str, np.ndarray]]:
    """Flatten an h5 weight file into [(path, array)] in storage order."""
    import h5py
    out: List[Tuple[str, np.ndarray]] = []

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out.append((name, np.asarray(obj)))

    with h5py.File(path, 'r') as f:
        root = f['model_weights'] if 'model_weights' in f else f
        root.visititems(visit)
    return out


def keras_kernel_to_flax(name: str, value: np.ndarray) -> np.ndarray:
    """Convert a Keras weight array to the flax layout."""
    lname = name.lower()
    if 'depthwise_kernel' in lname and value.ndim == 4:
        kh, kw, cin, mult = value.shape
        return value.reshape(kh, kw, 1, cin * mult)
    return value


def assign_in_order(params, h5_weights: List[Tuple[str, np.ndarray]],
                    strict: bool = False):
    """Fill a flax params tree from an ordered Keras weight list.

    Matches arrays by shape in sequence; leaves that find no shape-matching
    candidate keep their initialization. Returns (new_params, report).
    """
    import jax

    available = [(n, keras_kernel_to_flax(n, v)) for n, v in h5_weights]
    used = [False] * len(available)
    report = {'assigned': 0, 'skipped': 0}

    def fill(path, leaf):
        leaf_np = np.asarray(leaf)
        for i, (name, value) in enumerate(available):
            if used[i]:
                continue
            if value.shape == leaf_np.shape:
                used[i] = True
                report['assigned'] += 1
                return leaf_np.__class__(value) if False else value.astype(
                    leaf_np.dtype)
        report['skipped'] += 1
        if strict:
            raise ValueError(
                f'no weight for {jax.tree_util.keystr(path)} '
                f'shape {leaf_np.shape}')
        return leaf_np

    new_params = jax.tree_util.tree_map_with_path(fill, params)
    return new_params, report
