"""Batched alert-stream serving.

Replacement for the reference's deployment path (Keras-predict loop /
ONNX-runtime export — to_onnx.py, inference_example.py:47-95): a single
jit-compiled scoring program (optional on-device ingest + forward + sigmoid)
with padded fixed-size batches so one compiled executable serves any stream
length, bf16 compute by default, and a throughput meter.

Cross-runtime parity verification equivalent to ``verify_pth_vs_onnx``
(to_onnx.py:110-143) is ``verify_serving_parity``: the bf16 serving graph is
checked against the f32 reference graph on example data.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import normalize_config
from ..models.factory import build_model
from ..ops.preprocess import l2_normalize_cutouts


class AlertScorer:
    """Fixed-batch scorer: pads the tail, returns scores in input order.

    normalize=True applies the per-cutout L2-norm ingest on device (for raw
    cutout stacks); leave False for pre-normalized training .npy data.
    """

    def __init__(self, config, variables, batch_size: int = 3072,
                 dtype=jnp.bfloat16, normalize: bool = False, mesh=None):
        """batch_size 3072 is the measured single-chip sweet spot on v5e
        (~15% over the 2^n sizes at BTSbot stage shapes — see bench.py).
        mesh: optional jax.sharding.Mesh — batches are split on the "data"
        axis across chips (multi-chip serving; params replicated or
        tensor-sharded per parallel.sharding rules)."""
        self.config = normalize_config(config)
        self.batch_size = batch_size
        self.dtype = dtype
        self.model = build_model(self.config, dtype=dtype)
        self.mesh = mesh
        self._data_shard = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding
            from ..parallel.sharding import shard_variables

            variables = shard_variables(variables, mesh)
            self._data_shard = batch_sharding(mesh)
        self.variables = variables
        need_triplets = self.config.need_triplets
        need_metadata = self.config.need_metadata

        def score(variables, images, metadata):
            if images is not None:
                images = images.astype(dtype)
                if normalize:
                    images = l2_normalize_cutouts(images)
            if metadata is not None:
                metadata = metadata.astype(dtype)
            logits = self.model.apply(
                variables,
                image_input=images if need_triplets else None,
                metadata_input=metadata if need_metadata else None,
                train=False)
            return jax.nn.sigmoid(logits.reshape(-1).astype(jnp.float32))

        self._score = jax.jit(score)

    def __call__(self, triplets=None, metadata=None) -> np.ndarray:
        n = len(triplets) if triplets is not None else len(metadata)
        bs = self.batch_size
        out = np.empty(n, np.float32)
        for start in range(0, n, bs):
            stop = min(start + bs, n)
            m = stop - start
            img = meta = None
            if triplets is not None:
                img = np.zeros((bs,) + triplets.shape[1:], np.float32)
                img[:m] = triplets[start:stop]
                img = jnp.asarray(img)
                if self._data_shard is not None:
                    img = jax.device_put(img, self._data_shard)
            if metadata is not None:
                meta = np.zeros((bs,) + metadata.shape[1:], np.float32)
                meta[:m] = metadata[start:stop]
                meta = jnp.asarray(meta)
                if self._data_shard is not None:
                    meta = jax.device_put(meta, self._data_shard)
            out[start:stop] = np.asarray(
                self._score(self.variables, img, meta))[:m]
        return out

    def throughput(self, iters: int = 50) -> float:
        """alerts/sec on synthetic device-resident data (scan-chained, see
        bench.py methodology)."""
        rng = np.random.default_rng(0)
        images = None
        metadata = None
        if self.config.need_triplets:
            s = self.config.get("image_size", 63)
            images = jax.device_put(jnp.asarray(
                rng.normal(size=(self.batch_size, s, s, 3)), self.dtype))
        if self.config.need_metadata:
            ncols = len(self.config["metadata_cols"])
            metadata = jax.device_put(jnp.asarray(
                rng.normal(size=(self.batch_size, ncols)), self.dtype))

        score = self._score
        variables = self.variables

        @jax.jit
        def chained(variables, images, metadata):
            def body(carry, _):
                img = None if images is None else images + carry
                meta = metadata if metadata is None else metadata + carry
                s = score(variables, img, meta)
                return (jnp.mean(s) * 1e-20).astype(
                    self.dtype), jnp.mean(s)
            _, means = jax.lax.scan(
                body, jnp.zeros((), self.dtype), None, length=iters)
            return jnp.mean(means)

        float(chained(variables, images, metadata))  # compile
        t0 = time.perf_counter()
        float(chained(variables, images, metadata))
        dt = time.perf_counter() - t0
        return self.batch_size * iters / dt


class AlertStreamScorer:
    """Raw-packet serving: gzip FITS cutout blobs → score, end to end.

    Chains the native batched stamp decoder (btsbot_tpu.native), the fused
    on-device ingest (NaN-clean + per-cutout L2 norm + corrupt detection),
    and the batched model forward — the full production path from an alert
    broker's packet stream to BTS scores (replacing the reference's
    make_triplet → DataLoader → model chain, alert_utils.py:110-196 +
    inference_example.py:47-95).
    """

    def __init__(self, config, variables, batch_size: int = 3072,
                 dtype=jnp.bfloat16, num_threads: int = 0):
        self.scorer = AlertScorer(config, variables, batch_size=batch_size,
                                  dtype=dtype, normalize=True)
        self.num_threads = num_threads

    def __call__(self, packets: list[dict]) -> tuple[np.ndarray, np.ndarray]:
        """packets: alert dicts with cutout{Science,Template,Difference}
        stampData blobs and (for multi-modal models) a ``candidate`` dict
        carrying the configured metadata columns.

        Returns (scores (N,), drop_mask (N,)) — scores are NaN where the
        alert was dropped as corrupt/undecodable.
        """
        from ..native import decode_stamps
        from ..ops.preprocess import corrupt_mask

        config = self.scorer.config
        n = len(packets)
        blobs: list[bytes] = []
        for p in packets:
            for key in ("cutoutScience", "cutoutTemplate",
                        "cutoutDifference"):
                blobs.append(p[key]["stampData"])
        stamps, status = decode_stamps(blobs, num_threads=self.num_threads)
        triplets = stamps.reshape(n, 3, 63, 63).transpose(0, 2, 3, 1)
        decode_bad = status.reshape(n, 3).any(axis=1)

        drop = np.asarray(corrupt_mask(jnp.asarray(triplets))) | decode_bad

        metadata = None
        if config.need_metadata:
            cols = config["metadata_cols"]
            metadata = np.asarray(
                [[float(p["candidate"].get(c, 0.0)) for c in cols]
                 for p in packets], dtype=np.float32)

        scores = self.scorer(triplets, metadata)
        scores = np.where(drop, np.nan, scores)
        return scores, drop


def verify_serving_parity(config, variables, triplets=None, metadata=None,
                          rtol: float = 1e-2, atol: float = 5e-3) -> dict:
    """Compare the bf16 serving graph against the f32 reference graph
    (the JAX analog of to_onnx.verify_pth_vs_onnx, to_onnx.py:110-143).
    Returns {'close': bool, 'max_diff': float}."""
    serving = AlertScorer(config, variables, batch_size=max(
        1, len(triplets) if triplets is not None else len(metadata)))
    reference = AlertScorer(config, variables, batch_size=serving.batch_size,
                            dtype=jnp.float32)
    s_bf16 = serving(triplets, metadata)
    s_f32 = reference(triplets, metadata)
    max_diff = float(np.max(np.abs(s_bf16 - s_f32))) if len(s_f32) else 0.0
    return {"close": bool(np.allclose(s_bf16, s_f32, rtol=rtol, atol=atol)),
            "max_diff": max_diff}
