"""Ingest / augmentation / resize op semantics vs independent numpy + torch
oracles (reference alert_utils.py behaviors per SURVEY.md §2)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from btsbot_tpu.ops.augment import augment_triplets
from btsbot_tpu.ops.preprocess import (
    center_crop,
    clean_nonfinite,
    corrupt_mask,
    crop_triplets,
    l2_normalize_cutouts,
    nan_row_mask,
    preprocess_triplets,
)
from btsbot_tpu.ops.resize import resize_bilinear


def _raw_triplets(seed=0, n=6):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 63, 63, 3)).astype(np.float32) * 10


def test_clean_nonfinite_matches_nan_to_num():
    x = np.array([1.0, np.nan, np.inf, -np.inf, -2.5], dtype=np.float32)
    got = np.asarray(clean_nonfinite(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.nan_to_num(x))


def test_l2_normalize_matches_numpy_per_cutout():
    trips = _raw_triplets()
    got = np.asarray(l2_normalize_cutouts(jnp.asarray(trips)))
    for i in range(trips.shape[0]):
        for c in range(3):
            expected = trips[i, :, :, c] / np.linalg.norm(trips[i, :, :, c])
            np.testing.assert_allclose(got[i, :, :, c], expected, rtol=1e-6)


def test_preprocess_drops_corrupt_alerts():
    trips = _raw_triplets(n=5)
    trips[1, :, :, 0] = np.nan          # bad median in science cutout
    trips[2, :, :, 2] = 0.0             # all-zero difference cutout
    trips[3, 5, 5, 1] = np.nan          # a single NaN: cleaned, not corrupt
    out, drop = preprocess_triplets(jnp.asarray(trips))
    np.testing.assert_array_equal(
        np.asarray(drop), [False, True, True, False, False])
    assert np.all(np.isfinite(np.asarray(out)))
    # normalization applied per cutout
    norms = np.linalg.norm(np.asarray(out)[0], axis=(0, 1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_crop_triplets_matches_reference_margin_math():
    trips = _raw_triplets(n=2)
    size = 49
    got = np.asarray(crop_triplets(jnp.asarray(trips), size))
    margin = (63 - size) // 2
    for i in range(2):
        for c in range(3):
            ref = trips[i, margin:margin + size, margin:margin + size, c]
            ref = ref / np.linalg.norm(ref)
            np.testing.assert_allclose(got[i, :, :, c], ref, rtol=1e-6)
    assert center_crop(jnp.asarray(trips), 63).shape == trips.shape


def test_nan_row_mask():
    trips = _raw_triplets(n=4)
    trips[2, 0, 0, 0] = np.nan
    np.testing.assert_array_equal(
        np.asarray(nan_row_mask(jnp.asarray(trips))),
        [False, False, True, False])


def test_resize_matches_torch_align_corners_false():
    img = _raw_triplets(n=2)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 224))
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
        size=(224, 224), mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_resize_noop_at_native_size():
    img = jnp.asarray(_raw_triplets(n=1))
    assert resize_bilinear(img, 63) is img


@pytest.mark.parametrize("flags", [
    dict(h_flip=True, v_flip=False, rot=False),
    dict(h_flip=False, v_flip=True, rot=False),
    dict(h_flip=False, v_flip=False, rot=True),
    dict(h_flip=True, v_flip=True, rot=True),
])
def test_augment_is_pixel_preserving_and_seeded(flags):
    trips = jnp.asarray(_raw_triplets(n=16))
    rng = jax.random.key(0)
    out1 = augment_triplets(rng, trips, **flags)
    out2 = augment_triplets(rng, trips, **flags)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # flips/rot90 permute pixels within each cutout: sorted pixel multisets
    # are invariant per (sample, channel)
    a = np.sort(np.asarray(out1).reshape(16, -1, 3), axis=1)
    b = np.sort(np.asarray(trips).reshape(16, -1, 3), axis=1)
    np.testing.assert_array_equal(a, b)
    # and a different key produces a different augmentation somewhere
    out3 = augment_triplets(jax.random.key(1), trips, **flags)
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_augment_outputs_are_exact_dihedral_transforms():
    """Each augmented sample must equal one of the 8 dihedral transforms of
    its input, applied IDENTICALLY to all 3 channels — a stronger oracle
    than pixel-multiset invariance, which any per-cutout permutation
    (wrong-axis flip, transpose, per-channel inconsistency) also satisfies
    (r3 review)."""
    from btsbot_tpu.ops.augment import augment_triplets

    trips = np.asarray(_raw_triplets(n=32))
    out = np.asarray(augment_triplets(jax.random.key(7),
                                      jnp.asarray(trips),
                                      h_flip=True, v_flip=True, rot=True))
    non_identity = 0
    for i in range(len(trips)):
        x = trips[i]  # (H, W, 3)
        dihedral = []
        for k in range(4):
            r = np.rot90(x, k, axes=(0, 1))
            dihedral.append(r)
            dihedral.append(np.flip(r, axis=1))
        matches = [np.array_equal(out[i], d) for d in dihedral]
        assert any(matches), f"sample {i} is not a dihedral transform"
        if not np.array_equal(out[i], x):
            non_identity += 1
    assert non_identity > 8  # the augmentation actually does something


def test_augment_disabled_is_identity():
    trips = jnp.asarray(_raw_triplets(n=4))
    out = augment_triplets(jax.random.key(0), trips,
                           h_flip=False, v_flip=False, rot=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(trips))


def test_corrupt_mask_median_inf():
    trips = _raw_triplets(n=2)
    trips[0, :, :, 1] = np.inf
    got = np.asarray(corrupt_mask(jnp.asarray(trips)))
    np.testing.assert_array_equal(got, [True, False])


def test_corrupt_mask_few_inf_pixels_norm_overflow():
    """A cutout with only a FEW ±inf pixels has a finite median but its f32
    norm overflows; the reference's post-normalize all-zero check drops it
    (alert_utils.py:158-173) — ours must too, or an all-zero image gets
    scored (r3 review finding)."""
    from btsbot_tpu.ops.preprocess import preprocess_triplets

    trips = _raw_triplets(n=3)
    trips[0, 5, 5, 0] = np.inf       # one +inf pixel, science cutout
    trips[1, 10, 10, 2] = -np.inf    # one -inf pixel, difference cutout
    got = np.asarray(corrupt_mask(jnp.asarray(trips)))
    np.testing.assert_array_equal(got, [True, True, False])

    out, drop = preprocess_triplets(jnp.asarray(trips))
    np.testing.assert_array_equal(np.asarray(drop), [True, True, False])
    assert np.all(np.isfinite(np.asarray(out)))
