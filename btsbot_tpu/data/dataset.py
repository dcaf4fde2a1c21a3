"""In-memory alert dataset + batch pipeline.

Keeps the reference's on-disk file convention so existing training sets load
unchanged (`{base}/data/{split}_cand_{version}_N{N}.csv` +
`{split}_triplets_{version}_N{N}.npy` — reference train.py:133-140,
val.py:82-101), but the runtime side is TPU-first:

* triplets stay NHWC as stored (the reference transposes to NCHW,
  train.py:154 — we never do);
* NaN-triplet rows are dropped with the aligned cand/label rows
  (train.py:143-153); NaN metadata is a hard failure (train.py:159-171);
* batches are yielded as numpy views and device-put with an explicit
  sharding; augmentation happens on device inside the train step, so the
  host loop does no per-sample Python work (replacing DataLoader workers,
  train.py:201-209).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import numpy as np


@dataclasses.dataclass
class AlertDataset:
    labels: np.ndarray                      # (N,) float32 0/1
    images: np.ndarray | None = None        # (N, H, W, 3) float32 NHWC
    metadata: np.ndarray | None = None      # (N, M) float32
    candidates: "object | None" = None      # pandas DataFrame (full cand table)

    def __post_init__(self):
        n = len(self.labels)
        if self.images is not None:
            assert len(self.images) == n
        if self.metadata is not None:
            assert len(self.metadata) == n

    def __len__(self) -> int:
        return len(self.labels)

    @property
    def num_pos(self) -> int:
        return int(np.sum(self.labels == 1))

    @property
    def num_neg(self) -> int:
        return int(np.sum(self.labels == 0))

    @property
    def pos_weight(self) -> float:
        """num_notbts / num_bts (reference train.py:211)."""
        return self.num_neg / max(1, self.num_pos)


def split_paths(data_dir: str, split: str, version: str, n_max: int = 100):
    n_str = f"_N{n_max}"
    cand = os.path.join(data_dir, f"{split}_cand_{version}{n_str}.csv")
    trip = os.path.join(data_dir, f"{split}_triplets_{version}{n_str}.npy")
    return cand, trip


def load_split(
    config,
    split: str,
    data_dir: str,
    drop_nan_triplets: bool | None = None,
) -> AlertDataset:
    """Load one split per the reference's conventions.  NaN-row filtering
    defaults to on for "train" (train.py:143-153) and off otherwise."""
    import pandas as pd

    cand_path, trip_path = split_paths(
        data_dir, split, config["train_data_version"],
        config.get("N_max", 100))
    cand = pd.read_csv(cand_path, index_col=None)
    labels = cand["label"].to_numpy().astype(np.float32)

    images = None
    if config.need_triplets:
        images = np.load(trip_path).astype(np.float32)
        if drop_nan_triplets is None:
            drop_nan_triplets = split == "train"
        if drop_nan_triplets and np.any(np.isnan(images)):
            bad = np.isnan(images).any(axis=(1, 2, 3))
            images = images[~bad]
            cand = cand.loc[~bad].reset_index(drop=True)
            labels = cand["label"].to_numpy().astype(np.float32)

    metadata = None
    if config.need_metadata:
        cols = config.get("metadata_cols")
        if not cols:
            raise ValueError("Metadata columns not found in config.")
        metadata = cand[cols].to_numpy().astype(np.float32)
        if np.isnan(metadata).any():
            nan_cols = cand[cols].isnull().sum()
            raise ValueError(
                "NaNs found in metadata columns: "
                f"{nan_cols[nan_cols > 0].to_dict()}")

    return AlertDataset(labels=labels, images=images, metadata=metadata,
                        candidates=cand)


def filter_dataset(dataset: AlertDataset, mask: np.ndarray) -> AlertDataset:
    """Row-subset an AlertDataset (mask: (N,) bool), keeping cand aligned."""
    mask = np.asarray(mask, dtype=bool)
    cand = dataset.candidates
    if cand is not None:
        cand = cand[mask].reset_index(drop=True)
    return AlertDataset(
        labels=dataset.labels[mask],
        images=None if dataset.images is None else dataset.images[mask],
        metadata=None if dataset.metadata is None else dataset.metadata[mask],
        candidates=cand,
    )


def apply_val_cuts(dataset: AlertDataset, config) -> AlertDataset:
    """Honor the ``val_sne_only`` / ``val_keep_near_threshold`` /
    ``val_rise_only`` config flags (present in reference configs,
    prod_config.json:63-65, but dead in the torch trainer — SURVEY.md §2).
    Requires the is_SN/near_threshold/is_rise columns from the split engine;
    flags referencing absent columns are ignored."""
    cand = dataset.candidates
    if cand is None:
        return dataset
    mask = np.ones(len(dataset), dtype=bool)
    if config.get("val_sne_only") and "is_SN" in cand:
        mask &= cand["is_SN"].to_numpy().astype(bool)
    if (not config.get("val_keep_near_threshold", True)
            and "near_threshold" in cand):
        mask &= ~cand["near_threshold"].to_numpy().astype(bool)
    if config.get("val_rise_only") and "is_rise" in cand:
        mask &= cand["is_rise"].to_numpy().astype(bool)
    if mask.all():
        return dataset
    return filter_dataset(dataset, mask)


def iterate_batches(
    dataset: AlertDataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    drop_last: bool = False,
    seed: int | None = None,
) -> Iterator[tuple[np.ndarray | None, np.ndarray | None, np.ndarray]]:
    """Yield (images, metadata, labels) numpy batches."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start:start + batch_size]
        yield (
            None if dataset.images is None else dataset.images[idx],
            None if dataset.metadata is None else dataset.metadata[idx],
            dataset.labels[idx],
        )


def num_batches(dataset: AlertDataset, batch_size: int,
                drop_last: bool = False) -> int:
    n = len(dataset)
    return n // batch_size if drop_last else -(-n // batch_size)
