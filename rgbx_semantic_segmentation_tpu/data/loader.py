"""Threaded host data pipeline feeding device-sharded batches.

Replaces the reference's torch DataLoader + DistributedSampler
(dataloader.py:129-166): worker threads run the numpy augmentation pipeline and a
bounded queue overlaps host preprocessing with the device step (the reference
gets this from num_workers=16 worker processes + pin_memory).

Epoch length oversampling (batch_size * niters_per_epoch) matches the reference's
train_dataset construction (dataloader.py:147).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from rgbx_semantic_segmentation_tpu.config import Config
from rgbx_semantic_segmentation_tpu.data.dataset import RGBXDataset
from rgbx_semantic_segmentation_tpu.data.preprocess import TrainPre, ValPre


def _collate(samples) -> Dict[str, np.ndarray]:
    return {
        "rgb": np.stack([s["rgb"] for s in samples]),
        "modal_x": np.stack([s["modal_x"] for s in samples]),
        "label": np.stack([s["label"] for s in samples]),
    }


class TrainLoader:
    """Shuffled, drop-last batch iterator with threaded prefetch."""

    def __init__(self, cfg: Config, root: Optional[str] = None,
                 num_workers: Optional[int] = None, seed: Optional[int] = None,
                 prefetch: int = 4, device_normalize: bool = True):
        self.cfg = cfg
        seed = cfg.train.seed if seed is None else seed
        self.seed = seed
        self._rng = np.random.RandomState(seed)
        self.device_normalize = device_normalize
        pre = TrainPre(
            norm_mean=cfg.dataset.norm_mean, norm_std=cfg.dataset.norm_std,
            image_hw=(cfg.dataset.image_height, cfg.dataset.image_width),
            num_classes=cfg.dataset.num_classes,
            background=cfg.dataset.background,
            train_scale_array=cfg.train.train_scale_array,
            rng=np.random.RandomState(seed + 1),
            normalize=not device_normalize)
        file_length = cfg.train.batch_size * cfg.train.niters_per_epoch
        self.dataset = RGBXDataset(cfg.dataset, "train", pre,
                                   file_length=file_length, root=root)
        self.batch_size = cfg.train.batch_size
        self.num_workers = (num_workers if num_workers is not None
                            else min(cfg.train.num_workers, 8))
        self.prefetch = prefetch
        self.niters = len(self.dataset) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield `niters` batches for one epoch."""
        self.dataset.set_epoch(epoch)
        # Deterministic per-(seed, epoch) batch order: the config seed folds in
        # so two runs with different seeds see different batch orders, like the
        # reference's set_epoch'd DistributedSampler (dataloader.py:153-156).
        order = np.random.RandomState(
            (999983 * (epoch + 1) + self.seed) % (2 ** 31)).permutation(
            len(self.dataset))
        n_batches = self.niters
        idx_batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(n_batches)]

        if self.num_workers <= 0:
            for idxs in idx_batches:
                yield _collate([self.dataset[i] for i in idxs])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        task_q: "queue.Queue" = queue.Queue()
        results = {}
        for bi, idxs in enumerate(idx_batches):
            task_q.put((bi, idxs))

        def worker():
            while True:
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                batch = _collate([self.dataset[i] for i in idxs])
                out_q.put((bi, batch))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        next_bi = 0
        while next_bi < n_batches:
            bi, batch = out_q.get()
            results[bi] = batch
            while next_bi in results:
                yield results.pop(next_bi)
                next_bi += 1

    def __iter__(self):
        epoch = 0
        while True:
            yield from self.epoch(epoch)
            epoch += 1


class ValLoader:
    """Sequential eval iterator yielding single preprocessed samples with the raw
    (unnormalised) images kept for the sliding-window evaluator."""

    def __init__(self, cfg: Config, root: Optional[str] = None,
                 preprocess: bool = False):
        pre = None
        if preprocess:
            pre = ValPre(cfg.dataset.norm_mean, cfg.dataset.norm_std,
                         (cfg.dataset.image_height, cfg.dataset.image_width))
        self.dataset = RGBXDataset(cfg.dataset, "val", pre, root=root)

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        for i in range(len(self.dataset)):
            yield self.dataset[i]
