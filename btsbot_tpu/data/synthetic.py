"""Synthetic alert-packet generation for benches, examples, and demos.

Produces packets with the exact shape AlertStreamScorer consumes
(``cutout{Science,Template,Difference}.stampData`` gzip+FITS blobs plus a
``candidate`` dict carrying the configured metadata columns), so the bench
(bench.py), the serving-daemon example (examples/serving_daemon.py), and
any demo exercise the same packet contract from one definition.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import numpy as np

CUTOUT_KEYS = ("cutoutScience", "cutoutTemplate", "cutoutDifference")


def synthetic_packets(n: int, meta_cols, seed: int = 0,
                      unique_stamps: bool = False) -> Iterator[dict]:
    """Yield n alert packets with gzip+FITS cutout blobs.

    unique_stamps=False (default) reuses one encoded blob for speed — the
    decode path does identical work per blob either way; set True when the
    *values* must differ per packet (e.g. score-diversity demos).
    """
    from .fits import write_fits_image

    rng = np.random.default_rng(seed)

    def blob():
        return gzip.compress(write_fits_image(
            rng.normal(size=(63, 63)).astype(np.float32)))

    shared = None if unique_stamps else blob()
    for i in range(n):
        yield {
            "candid": i,
            "candidate": {c: float(rng.normal()) for c in meta_cols},
            **{k: {"stampData": shared if shared is not None else blob()}
               for k in CUTOUT_KEYS},
        }
