"""Native (C++) stamp decoder: parity vs the Python path, error statuses,
and the ctypes batch interface."""

import gzip

import numpy as np
import pytest

from btsbot_tpu.data.fits import write_fits_image
from btsbot_tpu.native import decode_stamps, native_available


def _blob(data: np.ndarray) -> bytes:
    return gzip.compress(write_fits_image(data))


def test_decode_batch_parity():
    rng = np.random.default_rng(0)
    blobs = []
    expected = []
    for i in range(50):
        size = 63 if i % 4 else 58
        dtype = [np.float32, np.float64, np.int16][i % 3]
        data = (rng.normal(size=(size, size)) * 100).astype(dtype)
        blobs.append(_blob(data))
        pad = np.full((63, 63), 1e-9, np.float32)
        pad[:size, :size] = data.astype(np.float32)
        expected.append(pad)
    out, status = decode_stamps(blobs)
    assert (status == 0).all()
    np.testing.assert_allclose(out, np.stack(expected), rtol=1e-6)


def test_decode_error_statuses():
    good = _blob(np.ones((63, 63), np.float32))
    bad_gzip = b"not gzip at all"
    bad_fits = gzip.compress(b"NOTFITS " * 400)
    oversize = _blob(np.ones((80, 80), np.float32))
    out, status = decode_stamps([good, bad_gzip, bad_fits, oversize])
    assert status[0] == 0
    assert status[1] != 0
    assert status[2] != 0
    assert status[3] == 3
    np.testing.assert_allclose(out[0], 1.0)


def test_decode_bitpix64_matches_python_reader():
    """BITPIX=64 (int64) is part of the fits.py subset — native and Python
    decoders must agree, not split into status-2 vs decoded (r3 review)."""
    rng = np.random.default_rng(5)
    data = (rng.normal(size=(63, 63)) * 1000).astype(np.int64)
    out, status = decode_stamps([_blob(data)])
    assert status[0] == 0
    np.testing.assert_allclose(out[0], data.astype(np.float32), rtol=1e-6)


def test_gzip_bomb_fails_cleanly():
    """A blob that decompresses to far beyond any valid stamp must come back
    as a per-stamp error status, not unbounded allocation (a bad_alloc in a
    worker thread would terminate the serving process)."""
    bomb = gzip.compress(b"\0" * (64 << 20))  # 64 MiB of zeros, tiny wire size
    good = _blob(np.ones((63, 63), np.float32))
    out, status = decode_stamps([bomb, good])
    assert status[0] != 0
    assert status[1] == 0
    np.testing.assert_allclose(out[1], 1.0)


@pytest.mark.skipif(not native_available(),
                    reason="native library not built (no toolchain)")
def test_native_library_loaded():
    # On CI hosts with a toolchain the native path must actually be in use.
    from btsbot_tpu.native import load_library
    assert load_library() is not None


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_decoder_survives_mutated_blobs():
    """The decoder parses untrusted broker bytes: random truncations and
    byte flips of a valid gzip+FITS blob must produce status codes, never
    crashes or out-of-bounds reads."""
    rng = np.random.default_rng(7)
    good = gzip.compress(write_fits_image(
        rng.normal(size=(63, 63)).astype(np.float32)))

    blobs = [good]
    for _ in range(200):
        b = bytearray(good)
        kind = rng.integers(0, 3)
        if kind == 0:  # truncate
            b = b[:rng.integers(0, len(b))]
        elif kind == 1:  # flip random bytes
            for _ in range(rng.integers(1, 16)):
                b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
        else:  # garbage prefix/suffix
            b = bytes(rng.integers(0, 256, rng.integers(1, 64),
                                   dtype=np.uint8)) + bytes(b)
        blobs.append(bytes(b))

    out, status = decode_stamps(blobs)
    assert out.shape == (len(blobs), 63, 63)
    assert status[0] == 0
    assert set(np.unique(status)) <= {0, 1, 2, 3}
    # successfully decoded outputs are always finite-or-nan floats with no
    # uninitialized memory (every failed decode leaves deterministic zeros)
    assert np.all(out[status != 0] == 0)
