"""Offline ETL: imglab polygons -> tensors-on-disk.

Re-implementation of road_project/setup/process.py:
  * scan ``labels/<label_name>/*.json`` into a per-image label-existence
    table + annotation table (process.py:20-79);
  * rasterize semantic polygons per label minus the except-labels (car)
    regions (process.py:82-123) — cv2.fillPoly replaces skimage.draw.polygon
    (same even-odd fill; fillPoly also paints boundary pixels, a <=1-px
    rasterization difference documented here);
  * rasterize each instance polygon cropped to its bbox (process.py:126-168);
  * write label_exists.tsv, seed-777 90/10 train/valid CSVs, and boxes.tsv
    with a global mask_index (process.py:171-247); rasterization fans out
    over a multiprocessing pool.
"""
from __future__ import annotations

import json
import os
import random
from functools import partial
from multiprocessing import Pool, cpu_count
from typing import List, Sequence, Tuple

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this env
    cv2 = None
import numpy as np
import pandas as pd

from .imglab import imglabformat_to_dataframe

IMAGE_FORMATS = ('.jpg', '.jpeg', '.png')


def load_split_cases(data_dir: str):
    """(train_cases, valid_cases) from the ETL's seed-777 split CSVs.

    The reference's experiment driver loads processed/{train,valid}.csv
    into config.dataset.{train,valid}_cases (road_project/train.py:24-27);
    this is its loader. Returns (None, None) when the dataset has not been
    processed (or has no held-out rows) so callers can fall back to
    all-images behavior.
    """
    processed = os.path.join(data_dir, 'processed')
    out = []
    for name in ('train.csv', 'valid.csv'):
        path = os.path.join(processed, name)
        if not os.path.isfile(path):
            return None, None
        with open(path) as f:
            cases = [line.strip() for line in f if line.strip()]
        out.append(cases)
    if not out[0] or not out[1]:
        return None, None
    return out[0], out[1]


def get_image_cases(image_dir: str) -> List[str]:
    out = []
    for root, _, files in os.walk(image_dir):
        for f in files:
            if os.path.splitext(f)[1].lower() in IMAGE_FORMATS:
                out.append(f)
    return sorted(out)


def load_label_dataframes_from_imglab_files(label_dir: str):
    """labels/<label_name>/*.json -> (label_exists df, annotations df)."""
    df_dict = {}
    for label_name in sorted(os.listdir(label_dir)):
        sub = os.path.join(label_dir, label_name)
        if not os.path.isdir(sub):
            continue
        dfs = []
        for file_name in sorted(os.listdir(sub)):
            if os.path.splitext(file_name)[1].lower() != '.json':
                continue
            with open(os.path.join(sub, file_name)) as f:
                dfs.append(imglabformat_to_dataframe(json.load(f)))
        if not dfs:
            continue
        file_names = set()
        for df in dfs:
            file_names |= set(df.file_name.cat.categories.values)
        df = pd.concat(dfs)
        df.file_name = pd.Categorical(df.file_name,
                                      categories=sorted(file_names))
        df.name = label_name
        df_dict[label_name] = df

    filenames = set()
    for value in df_dict.values():
        filenames |= set(value.file_name.unique())

    label_exists = pd.DataFrame(data=sorted(filenames),
                                columns=['file_name'])
    for key, value in df_dict.items():
        label_exists[key] = label_exists.file_name.isin(
            set(value.file_name.cat.categories))

    df = pd.concat(df_dict.values())
    annotations = pd.DataFrame({
        'file_name': df.file_name,
        'cx': df.bbox.apply(lambda x: x[0]),
        'cy': df.bbox.apply(lambda x: x[1]),
        'w': df.bbox.apply(lambda x: x[2]),
        'h': df.bbox.apply(lambda x: x[3]),
        'label': df.name,
        'annotation': df.segmentation.apply(
            lambda x: np.asarray(x, dtype=np.float64).reshape(-1, 2)),
    })
    annotations = annotations[(annotations.w * annotations.h) > 0]
    annotations = annotations.sort_values('file_name')
    return label_exists, annotations


def _fill_polygon(mask: np.ndarray, points: np.ndarray) -> None:
    h, w = mask.shape[:2]
    pts = points.copy()
    pts[:, 0] = np.clip(pts[:, 0], 0, w - 1)
    pts[:, 1] = np.clip(pts[:, 1], 0, h - 1)
    # the per-polygon fill is the ETL hot loop (SURVEY.md §3.5). cv2's
    # SIMD fillPoly is fastest (measured 14.5ms vs 21.9ms for the native
    # scanline filler over 200 polys @1080p); masklab_tpu/native covers
    # cv2-less deployments.
    if cv2 is not None:
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
        return
    from ..native import fill_polygon_native
    if not fill_polygon_native(mask, pts, 1):
        raise RuntimeError('no polygon rasterizer available '
                           '(need cv2 or a C++ toolchain)')


def process_semantic(inputs, data_dir: str, semantic_labels: Sequence[str],
                     except_semantic_labels: Sequence[str]) -> None:
    """Rasterize + save 1-bit semantic PNGs for one image."""
    image_dir = os.path.join(data_dir, 'images')
    processed_dir = os.path.join(data_dir, 'processed')
    file_name, df = inputs
    save_dir = os.path.join(processed_dir, f'semantic/{file_name}')
    os.makedirs(save_dir, exist_ok=True)

    shape = None
    except_mask = None
    for label in semantic_labels:
        save_path = os.path.join(save_dir, f'{label}.png')
        if os.path.exists(save_path) or np.sum(df.label == label) == 0:
            continue
        if shape is None:
            shape = cv2.imread(os.path.join(image_dir, file_name)).shape[:2]
            except_mask = np.zeros(shape, np.uint8)
            for except_label in except_semantic_labels:
                for point in df.loc[df.label == except_label, 'annotation']:
                    _fill_polygon(except_mask, point)
        mask = np.zeros(shape, np.uint8)
        for point in df.loc[df.label == label, 'annotation']:
            _fill_polygon(mask, point)
        label_mask = ((mask.astype(np.int32)
                       - except_mask.astype(np.int32)) > 0).astype(np.uint8)
        cv2.imwrite(save_path, label_mask, [cv2.IMWRITE_PNG_COMPRESSION, 9])


def process_instance(inputs, data_dir: str,
                     instance_labels: Sequence[str]) -> None:
    """Rasterize + save per-instance bbox-cropped PNGs for one image."""
    image_dir = os.path.join(data_dir, 'images')
    processed_dir = os.path.join(data_dir, 'processed')
    file_name, df = inputs
    save_dir = os.path.join(processed_dir, f'instance/{file_name}')
    os.makedirs(save_dir, exist_ok=True)

    target_df = df[df.label.isin(instance_labels)]
    shape = None
    for _, row in target_df.iterrows():
        save_path = os.path.join(save_dir, f'{row.mask_index}.png')
        if os.path.exists(save_path):
            continue
        if shape is None:
            shape = cv2.imread(os.path.join(image_dir, file_name)).shape[:2]
        blank = np.zeros(shape, np.uint8)
        _fill_polygon(blank, row.annotation)
        bbox = np.asarray((row.cx - row.w / 2, row.cy - row.h / 2,
                           row.cx + row.w / 2, row.cy + row.h / 2), np.int64)
        bbox = np.maximum(bbox, 0)
        x1, y1, x2, y2 = bbox
        cv2.imwrite(save_path, blank[y1:y2 + 1, x1:x2 + 1],
                    [cv2.IMWRITE_PNG_COMPRESSION, 9])


def process_dataset(data_dir: str,
                    except_semantic_labels: Sequence[str] = ('car',),
                    num_workers: int = None) -> None:
    """Full ETL entry (process.py:171-247)."""
    image_dir = os.path.join(data_dir, 'images/')
    label_dir = os.path.join(data_dir, 'labels/')
    processed_dir = os.path.join(data_dir, 'processed/')
    os.makedirs(processed_dir, exist_ok=True)

    label_exists, annotations = \
        load_label_dataframes_from_imglab_files(label_dir)
    labels = list(label_exists.columns[1:])

    existing = set(os.listdir(image_dir))
    label_exists = label_exists[label_exists.file_name.isin(existing)]
    label_exists.to_csv(os.path.join(processed_dir, 'label_exists.tsv'),
                        sep='\t', index=False)

    fnames = get_image_cases(image_dir)
    random.seed(777)
    random.shuffle(fnames)
    valid_n = int(len(fnames) * 0.1)
    pd.DataFrame(fnames[valid_n:]).to_csv(
        os.path.join(processed_dir, 'train.csv'), index=False, header=None)
    pd.DataFrame(fnames[:valid_n]).to_csv(
        os.path.join(processed_dir, 'valid.csv'), index=False, header=None)

    annotations = annotations[annotations.file_name.isin(existing)]
    parts = [g.reset_index(drop=True)
             for _, g in annotations.groupby('file_name', observed=True)]
    annotations = pd.concat(parts).reset_index(drop=True).reset_index()
    annotations = annotations.rename({'index': 'mask_index'}, axis=1)
    annotations[['file_name', 'cx', 'cy', 'w', 'h', 'label',
                 'mask_index']].to_csv(
        os.path.join(processed_dir, 'boxes.tsv'), sep='\t', index=False)

    groups = list(annotations.groupby('file_name', observed=True))
    workers = num_workers if num_workers is not None else cpu_count()
    sem_work = partial(process_semantic, data_dir=data_dir,
                       semantic_labels=labels,
                       except_semantic_labels=except_semantic_labels)
    ins_work = partial(process_instance, data_dir=data_dir,
                       instance_labels=labels)
    if workers <= 1:
        for g in groups:
            sem_work(g)
        for g in groups:
            ins_work(g)
    else:
        with Pool(workers) as pool:
            list(pool.imap_unordered(sem_work, groups))
        with Pool(workers) as pool:
            list(pool.imap_unordered(ins_work, groups))
