"""imglab (COCO-style) label format <-> DataFrame adapters.

Re-implementation of road_project/setup/imglab.py. The imglab tool emits a
COCO-ish json where ``bbox`` is (center_x, center_y, w, h) — NOT the COCO
(x, y, w, h) corner convention (imglab.py:38-45).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd


def imglabformat_to_dataframe(imglab: Dict) -> pd.DataFrame:
    """json dict -> DataFrame [file_name, segmentation, name, bbox]."""
    file_df = pd.DataFrame(imglab['images'])[['file_name', 'id']]
    anno_df = pd.DataFrame(imglab['annotations'])[
        ['image_id', 'category_id', 'id', 'bbox', 'segmentation']]
    cate_df = pd.DataFrame(imglab['categories'])[['name', 'id']]
    merged = anno_df.copy()
    merged['name'] = anno_df.category_id.map(cate_df.set_index('id')['name'])
    merged['file_name'] = pd.Categorical(
        anno_df.image_id.map(file_df.set_index('id')['file_name']),
        categories=file_df.file_name.unique())
    return merged[['file_name', 'segmentation', 'name', 'bbox']]


def dataframe_to_imglabformat(df: pd.DataFrame,
                              image_wh=(1920, 1080)) -> Dict:
    """Inverse adapter: DataFrame -> imglab json dict (imglab.py:8-59)."""
    df = df.copy()
    df.file_name = df.file_name.astype('category')
    df.name = df.name.astype('category')

    file_df = pd.DataFrame(df.file_name.cat.categories,
                           columns=['file_name']).reset_index()
    file_df['index'] += 1
    file_df = file_df.rename({'index': 'id'}, axis=1)
    file_df['width'] = image_wh[0]
    file_df['height'] = image_wh[1]

    cate_df = pd.DataFrame(df.name.cat.categories,
                           columns=['name']).reset_index()
    cate_df['index'] += 1
    cate_df = cate_df.rename({'index': 'id'}, axis=1)
    cate_df['supercategory'] = 'none'

    anno_df = df.copy()
    anno_df['image_id'] = df.file_name.cat.codes + 1
    anno_df['category_id'] = df.name.cat.codes + 1
    anno_df = anno_df.drop(['file_name', 'name'], axis=1)

    min_x = anno_df.segmentation.apply(lambda x: min(x[0][::2]))
    min_y = anno_df.segmentation.apply(lambda x: min(x[0][1::2]))
    max_x = anno_df.segmentation.apply(lambda x: max(x[0][::2]))
    max_y = anno_df.segmentation.apply(lambda x: max(x[0][1::2]))
    w, h = max_x - min_x, max_y - min_y
    anno_df['ignore'] = 0
    anno_df['iscrowd'] = 0
    anno_df['bbox'] = [list(p) for p in zip((min_x + max_x) / 2,
                                            (min_y + max_y) / 2, w, h)]
    anno_df['area'] = (w * h).astype(float)
    parts = [g.sort_values('area', ascending=False).reset_index(drop=True)
             for _, g in anno_df.groupby('image_id')]
    anno_df = pd.concat(parts).reset_index(drop=True).reset_index()
    anno_df = anno_df.rename({'index': 'id'}, axis=1)
    anno_df['id'] += 1

    return {'images': file_df.to_dict(orient='records'),
            'annotations': anno_df.to_dict(orient='records'),
            'categories': cate_df.to_dict(orient='records'),
            'type': 'instances'}
