"""Alert-packet decoding and feature engineering.

Host-side complement to the on-device ingest kernels
(btsbot_tpu.ops.preprocess).  Covers the reference's
`/root/reference/btsbot/alert_utils.py` surface:

* ``decode_stamp``/``make_triplet`` — gunzip + FITS-parse the three cutouts
  of a ZTF alert packet, pad undersized stamps to 63×63 with 1e-9
  (alert_utils.py:110-196); the NaN-clean/normalize/corrupt logic runs
  batched on device via ``ops.preprocess.preprocess_triplets``;
* ``prep_alerts`` — candidate-table assembly with the engineered per-object
  time-series features (peakmag, maxmag, *_so_far, age, days_since_peak,
  days_to_peak, nnotdet — alert_utils.py:333-441), vectorized with pandas
  groupby/cummin instead of the reference's O(objects·alerts²) loops;
* ``plot_triplet`` — the three-panel cutout figure (alert_utils.py:32-51).
"""

from __future__ import annotations

import gzip
import io

import numpy as np

CUTOUT_KEYS = ("science", "template", "difference")
STAMP_SIZE = 63
PAD_VALUE = 1e-9


def decode_stamp(stamp_data: bytes) -> np.ndarray:
    """Gunzip + FITS-parse one cutout's ``stampData`` blob → 2D float array
    (alert_utils.py:141-145).  Uses the built-in minimal FITS reader
    (data.fits); astropy, when installed, is the fallback for files outside
    the stamp subset."""
    with gzip.open(io.BytesIO(stamp_data), "rb") as f:
        buf = f.read()
    try:
        from .fits import read_fits_image
        return read_fits_image(buf).astype(np.float32)
    except Exception:
        from astropy.io import fits
        with fits.open(io.BytesIO(buf), ignore_missing_simple=True) as hdu:
            return np.asarray(hdu[0].data, dtype=np.float32)


def pad_stamp(stamp: np.ndarray, size: int = STAMP_SIZE) -> np.ndarray:
    """Pad an undersized stamp to size×size with 1e-9 on the bottom/right
    edges (alert_utils.py:175-188)."""
    h, w = stamp.shape
    if (h, w) == (size, size):
        return stamp
    return np.pad(stamp, [(0, size - h), (0, size - w)],
                  mode="constant", constant_values=PAD_VALUE)


def triplet_from_packet(alert: dict) -> np.ndarray:
    """Raw (un-normalized) 63×63×3 stack (science, template, difference)
    from an alert packet's cutout blobs.  Feed batches of these to
    ``ops.preprocess.preprocess_triplets`` for the NaN-clean / L2-norm /
    corrupt-drop pass on device."""
    planes = []
    for key in CUTOUT_KEYS:
        blob = alert[f"cutout{key.capitalize()}"]["stampData"]
        if isinstance(blob, dict) and "$binary" in blob:  # bson json form
            import base64
            blob = base64.b64decode(blob["$binary"]["base64"]
                                    if isinstance(blob["$binary"], dict)
                                    else blob["$binary"])
        planes.append(pad_stamp(decode_stamp(blob)))
    return np.stack(planes, axis=-1)


def make_triplet(alert: dict, normalize: bool = True):
    """Single-packet convenience path matching the reference's
    ``make_triplet(alert, normalize)`` → (triplet, drop) contract
    (alert_utils.py:110-196).  Batch pipelines should use
    ``triplet_from_packet`` + the batched device op instead."""
    import jax.numpy as jnp

    from ..ops.preprocess import preprocess_triplets

    raw = triplet_from_packet(alert)[None]
    out, drop = preprocess_triplets(jnp.asarray(raw), normalize=normalize)
    return np.asarray(out[0], dtype=np.float64), bool(drop[0])


def engineered_features(alert_df):
    """Add the per-object time-series features, vectorized
    (alert_utils.py:374-419).  Requires columns: objectId, jd, magpsf,
    jdstarthist, ncovhist, ndethist.  Modifies and returns the frame sorted
    back to its original index order."""
    df = alert_df.copy()
    df["nnotdet"] = df["ncovhist"] - df["ndethist"]

    order = np.lexsort((df["jd"].to_numpy(),
                        df["objectId"].astype("category").cat.codes))
    sdf = df.iloc[order]
    g = sdf.groupby("objectId", sort=False)

    peak = g["magpsf"].transform("min")
    df.loc[sdf.index, "peakmag"] = peak
    df.loc[sdf.index, "maxmag"] = g["magpsf"].transform("max")

    cummin = g["magpsf"].cummin()
    cummax = g["magpsf"].cummax()
    df.loc[sdf.index, "peakmag_so_far"] = cummin
    df.loc[sdf.index, "maxmag_so_far"] = cummax

    # jd of the earliest alert attaining the running-min magnitude: the
    # reference resolves ties to the object's first alert with that value
    # (alert_utils.py:413-415), so map value → first jd per object.
    first_jd = (
        sdf.drop_duplicates(["objectId", "magpsf"], keep="first")
        .set_index(["objectId", "magpsf"])["jd"]
    )
    keys = list(zip(sdf["objectId"], cummin))
    jd_peak = first_jd.reindex(keys).to_numpy()

    jd_min = g["jd"].transform("min")
    jd_first = np.minimum(sdf["jdstarthist"].to_numpy(), jd_min.to_numpy())
    df.loc[sdf.index, "age"] = sdf["jd"].to_numpy() - jd_first
    df.loc[sdf.index, "days_since_peak"] = sdf["jd"].to_numpy() - jd_peak
    df.loc[sdf.index, "days_to_peak"] = jd_peak - jd_first
    return df


def prep_alerts(alerts: list[dict], label, new_drb=None, nondet_fn=None):
    """Candidate-table assembly (alert_utils.py:333-441): flatten
    candidate|classifications dicts, insert labels and new_drb, add the
    engineered features, and (optionally) per-object last-non-detection
    columns via ``nondet_fn(objectId, first_jd) -> (jd, diffmaglim)``."""
    import pandas as pd

    rows = [dict(a["candidate"]) | dict(a.get("classifications", {}))
            for a in alerts]
    df = pd.DataFrame(rows)
    df.insert(0, "objectId", [a["objectId"] for a in alerts])

    if isinstance(label, (list, np.ndarray)):
        assert len(label) == len(alerts)
        df.insert(2, "label", np.asarray(label, dtype=int))
    elif isinstance(label, (int, np.integer)):
        df.insert(2, "label", np.full(len(alerts), label, dtype=int))

    if new_drb is not None:
        df["new_drb"] = np.asarray(new_drb)

    df = engineered_features(df)

    if nondet_fn is not None:
        firsts = df.groupby("objectId")["jd"].min()
        for objid, first_jd in firsts.items():
            jd, lim = nondet_fn(objid, first_jd)
            df.loc[df["objectId"] == objid, "last_nondet_jd"] = jd
            df.loc[df["objectId"] == objid, "last_nondet_diffmaglim"] = lim
    return df


def plot_triplet(trip: np.ndarray):
    """Science / reference / difference three-panel figure
    (alert_utils.py:32-51)."""
    import matplotlib.pyplot as plt
    from matplotlib.colors import LogNorm

    fig, axes = plt.subplots(1, 3, figsize=(8, 2), dpi=120)
    titles = ("Science", "Reference", "Difference")
    for i, (ax, title) in enumerate(zip(axes, titles)):
        ax.axis("off")
        norm = LogNorm() if i < 2 else None
        ax.imshow(trip[:, :, i], origin="upper", cmap=plt.cm.bone, norm=norm)
        ax.set_title(title)
    return fig
