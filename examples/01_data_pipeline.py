"""Walkthrough 1 — data pipeline (reference scripts/"1. Data Pipeline").

Builds a synthetic imglab-format dataset, runs the ETL, inspects one
sample, and draws the gt overlays to disk.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from masklab_tpu.data import (MaskLabDataset, MaskLabGenerator,
                              make_synthetic_dataset, process_dataset)


def main(data_dir='/tmp/masklab_demo'):
    if not os.path.isdir(os.path.join(data_dir, 'images')):
        print('creating synthetic dataset...')
        make_synthetic_dataset(data_dir, num_images=8)
    process_dataset(data_dir, num_workers=1)

    ds = MaskLabDataset(data_dir=data_dir, min_area=100.0)
    print(f'{len(ds)} images')
    sample = ds[0]
    for key, value in sample.items():
        print(f'  {key}: {np.asarray(value).shape}')

    gen = MaskLabGenerator(ds.get_config(), batch_size=2, shuffle=False)
    batch = gen[0]
    print('generator batch:')
    for key, value in batch.items():
        print(f'  {key}: {value.shape} {value.dtype}')


if __name__ == '__main__':
    main(*sys.argv[1:])
