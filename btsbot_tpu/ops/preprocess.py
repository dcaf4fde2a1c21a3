"""On-device alert-triplet ingest ops.

The reference preprocesses cutouts on the host with numpy, one image at a time
(`/root/reference/btsbot/alert_utils.py:110-196` ``make_triplet`` and
``:54-107`` ``crop_norm_cutout``/``crop_triplets`` — a Python double loop).
Here the whole pipeline is a single batched, jit-compiled function operating
on (N, 63, 63, 3) NHWC stacks so XLA fuses the NaN-clean, norm and mask
computations into one pass over HBM.

Semantics preserved exactly:

* NaN/±inf cleanup matches ``np.nan_to_num`` defaults (nan→0, ±inf→dtype
  min/max) — reference alert_utils.py:160;
* per-cutout (per sample, per channel) L2 / Frobenius normalization —
  reference alert_utils.py:163-164 and :76;
* corruption detection: non-finite median of the *raw* cutout, or an all-zero
  cutout after cleaning — reference alert_utils.py:147-173.  (The reference's
  ``median == np.nan`` comparison at :151 is always-False; we implement the
  evident intent with ``isfinite``.)
* center crop + renormalize — reference alert_utils.py:54-78.

The reference's label/NaN row filtering at training time
(`/root/reference/btsbot/train.py:143-153`) is covered by ``nan_row_mask``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CUTOUT_SIZE = 63


def clean_nonfinite(x: jnp.ndarray) -> jnp.ndarray:
    """np.nan_to_num semantics: nan→0, +inf→dtype max, −inf→dtype min."""
    finfo = jnp.finfo(x.dtype)
    x = jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)
    x = jnp.where(jnp.isposinf(x), jnp.full_like(x, finfo.max), x)
    x = jnp.where(jnp.isneginf(x), jnp.full_like(x, finfo.min), x)
    return x


def l2_normalize_cutouts(triplets: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Divide each (sample, channel) cutout by its Frobenius norm.

    Matches ``cutout /= np.linalg.norm(cutout)`` (alert_utils.py:164).  A zero
    norm (all-zero image) yields NaN in numpy; those images are flagged as
    corrupt by ``corrupt_mask`` and dropped, so here we guard the division to
    keep the kernel NaN-free.
    """
    sq = jnp.sum(jnp.square(triplets), axis=(1, 2), keepdims=True)
    norm = jnp.sqrt(sq)
    safe = jnp.where(norm > eps, norm, jnp.ones_like(norm))
    return triplets / safe


def corrupt_mask(raw_triplets: jnp.ndarray) -> jnp.ndarray:
    """True for alerts whose any cutout is corrupted.

    A cutout is corrupt when the median of its raw pixels is non-finite or
    when it is all-zero after NaN-cleaning (alert_utils.py:147-173).
    Input: (N, H, W, 3) raw float array. Output: (N,) bool.
    """
    med = jnp.nanmedian(raw_triplets, axis=(1, 2))  # (N, 3)
    bad_median = ~jnp.isfinite(med)
    cleaned = clean_nonfinite(raw_triplets)
    all_zero = jnp.all(cleaned == 0, axis=(1, 2))  # (N, 3)
    # norm-overflow path (alert_utils.py:158-173): a cutout with a few ±inf
    # pixels has a FINITE median, survives nan_to_num as ±3.4e38, overflows
    # the float32 norm to inf, and normalizes to all zeros — which the
    # reference's POST-normalize all-zero check then drops.  Our all-zero
    # check runs pre-normalize, so detect the overflow on the squared sum.
    sq = jnp.sum(jnp.square(cleaned), axis=(1, 2))  # (N, 3)
    bad_norm = ~jnp.isfinite(sq)
    return jnp.any(bad_median | all_zero | bad_norm, axis=-1)


@functools.partial(jax.jit, static_argnames=("normalize",))
def preprocess_triplets(
    raw_triplets: jnp.ndarray, normalize: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused batched equivalent of ``make_triplet`` (alert_utils.py:110-196).

    Takes raw stacked cutouts (N, 63, 63, 3) = (science, template, difference)
    on the channel axis; returns (processed triplets, drop mask).  Padding of
    undersized stamps to 63×63 is ragged and therefore handled host-side at
    packet-decode time (see btsbot_tpu.data.alerts.pad_stamp).

    Documented divergence (undersized stamps only): the reference normalizes
    the small cutout FIRST and pads with exactly 1e-9 after
    (alert_utils.py:163-188), while this pipeline receives already-padded
    63×63 stamps, so the ~1e-9 pad pixels participate in the norm and end up
    at 1e-9/norm.  The norm contribution of ≤125 pad pixels at 1e-9 is
    ~1e-16 relative and the pad-pixel values differ at the 1e-9 scale —
    orders below the 1e-5 score-parity tolerance — accepted to keep the
    batched path static-shaped (ragged sizes would force per-shape
    recompiles).
    """
    drop = corrupt_mask(raw_triplets)
    out = clean_nonfinite(raw_triplets)
    if normalize:
        out = l2_normalize_cutouts(out)
    return out, drop


def center_crop(triplets: jnp.ndarray, crop_to_size: int) -> jnp.ndarray:
    """Center crop on H/W with the reference's margin convention
    ``margin = (63 - size) // 2`` (alert_utils.py:73-75)."""
    src = triplets.shape[1]
    margin = (src - crop_to_size) // 2
    return triplets[:, margin:margin + crop_to_size, margin:margin + crop_to_size, :]


@functools.partial(jax.jit, static_argnames=("crop_to_size",))
def crop_triplets(triplets: jnp.ndarray, crop_to_size: int) -> jnp.ndarray:
    """Batched ``crop_triplets`` (alert_utils.py:81-107): center crop each
    cutout then renormalize by its Frobenius norm."""
    return l2_normalize_cutouts(center_crop(triplets, crop_to_size))


def nan_row_mask(triplets: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool — True where any pixel of the alert's triplet is NaN.

    Mirrors the training-time row filter (reference train.py:143-153).
    """
    return jnp.isnan(triplets).any(axis=(1, 2, 3))
