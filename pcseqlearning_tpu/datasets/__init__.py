"""Data layer: dataset template, Waymo sequence dataset, processors,
augmentors, loaders.

Mirrors /root/reference/pcdet/datasets/: build_dataloader composes a
DatasetTemplate subclass with PointFeatureEncoder, DataAugmentor (train
only), and DataProcessor; collation pads boxes and concatenates point arrays
with a batch-index prefix (dataset.py:194-298).
"""

from __future__ import annotations

import numpy as np

from .dataset import DatasetTemplate, collate_batch
from .waymo_dataset import WaymoDataset

__all__ = ["DatasetTemplate", "WaymoDataset", "collate_batch", "build_dataloader"]

DATASETS = {"WaymoDataset": WaymoDataset}


class SimpleLoader:
    """Single-process loader with shuffling and collation (the reference
    wraps torch DataLoader + DistributedSampler, datasets/__init__.py:70-106;
    host input pipelines feed jit-compiled steps here, so a plain Python
    iterator with numpy collation suffices — sharding happens per host)."""

    def __init__(self, dataset, batch_size=1, shuffle=False, seed=0, drop_last=False,
                 rank=0, world_size=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        per_rank = (n + self.world_size - 1) // self.world_size
        if self.drop_last:
            return per_rank // self.batch_size
        return (per_rank + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        # shard across ranks (DistributedSampler-style padding to world size)
        order = order[self.rank :: self.world_size]
        nb = len(order) // self.batch_size if self.drop_last else (len(order) + self.batch_size - 1) // self.batch_size
        for i in range(nb):
            idxs = order[i * self.batch_size : (i + 1) * self.batch_size]
            samples = [self.dataset[j] for j in idxs]
            yield collate_batch(samples)


def build_dataloader(dataset_cfg, class_names, batch_size, root_path=None, training=True,
                     seed=0, rank=0, world_size=1, **kwargs):
    dataset = DATASETS[dataset_cfg["DATASET"]](
        dataset_cfg=dataset_cfg, class_names=class_names,
        root_path=root_path, training=training,
    )
    loader = SimpleLoader(
        dataset, batch_size=batch_size, shuffle=training, seed=seed,
        drop_last=training, rank=rank, world_size=world_size,
    )
    return dataset, loader
