"""Penultimate-layer embeddings + 2-D projection.

The reference trainer optionally generates UMAP embeddings of trained models
via a ``generate_embeddings`` module that is NOT shipped in the package
(train.py:20,449-469 imports it from the external repo — SURVEY.md §2 wart).
This module provides the capability natively: extract the model's combined
penultimate features for a dataset, then project to 2-D with UMAP when
installed, else PCA.

Feature definitions per model family (the inputs to the final Dense(1)):

* mm_* / frozen_fusion — the combined head's second hidden activation;
* um_cnn / ConvNeXt / MaxViT — the image head's second hidden activation;
* um_nn — the metadata branch output.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import normalize_config
from ..data.dataset import AlertDataset, iterate_batches


def _penultimate(model, config, params, batch_stats, images, metadata):
    """The activation feeding the final Dense(1), sown by the head modules
    as the "penultimate" intermediate (models.common / models.mlp)."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    _, state = model.apply(
        variables,
        image_input=images,
        metadata_input=metadata,
        train=False,
        mutable=["intermediates"],
    )

    found = []

    def walk(tree):
        for k, v in tree.items():
            if k == "penultimate":
                found.append(v[0])
            elif isinstance(v, dict):
                walk(v)

    walk(state["intermediates"])
    if not found:
        raise ValueError("No penultimate features captured")
    return found[0]


def extract_features(model, config, params, batch_stats,
                     dataset: AlertDataset, batch_size: int | None = None
                     ) -> np.ndarray:
    """(N, D) penultimate features for every alert, in dataset order."""
    config = normalize_config(config)
    batch_size = batch_size or int(config.get("batch_size", 256))

    @jax.jit
    def step(images, metadata):
        return _penultimate(model, config, params, batch_stats, images,
                            metadata)

    out = []
    for images, metadata, labels in iterate_batches(dataset, batch_size):
        n = len(labels)
        if n < batch_size:
            pad = batch_size - n
            if images is not None:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:],
                                      images.dtype)])
            if metadata is not None:
                metadata = np.concatenate(
                    [metadata, np.zeros((pad,) + metadata.shape[1:],
                                        metadata.dtype)])
        feats = step(None if images is None else jnp.asarray(images),
                     None if metadata is None else jnp.asarray(metadata))
        out.append(np.asarray(feats)[:n])
    return np.concatenate(out) if out else np.zeros((0, 0))


def project_2d(features: np.ndarray, seed: int = 0,
               method: str = "auto") -> np.ndarray:
    """(N, 2) projection: UMAP when installed (the reference's choice),
    PCA otherwise."""
    if method in ("auto", "umap"):
        try:
            import umap  # optional

            return umap.UMAP(random_state=seed).fit_transform(features)
        except ImportError:
            if method == "umap":
                raise
    centered = features - features.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:2].T


def generate_embeddings(model, config, params, batch_stats,
                        dataset: AlertDataset, candids=None,
                        seed: int = 0):
    """(N, 3) array of [emb_1, emb_2, candid] matching the reference's
    embeddings CSV schema (train.py:464-465)."""
    feats = extract_features(model, config, params, batch_stats, dataset)
    emb = project_2d(feats, seed=seed)
    if candids is None:
        candids = np.arange(len(emb))
    return np.column_stack([emb, np.asarray(candids)[:len(emb)]])
