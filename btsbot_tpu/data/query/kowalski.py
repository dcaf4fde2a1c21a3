"""Kowalski (ZTF alert archive) acquisition layer.

Covers the reference's `/root/reference/btsbot/query_data/query_train_data.py`
and the Kowalski pieces of ``alert_utils`` (client setup :13-29,
``query_nondet`` :258-330): per-object alert queries with cutouts, raw-result
disk cache, corrupt-cutout dropping, label assignment, and the
triplets+candidates file outputs.

Design differences from the reference:

* the client is injected (any object with ``.query(dict)`` — penquins'
  Kowalski, or a fake in tests) instead of a module-level global built from
  env vars at import time; ``client_from_env()`` reproduces the env-var
  setup (KOWALSKI_USER/KOWALSKI_PASS);
* cutout decoding + NaN-clean/normalize/corrupt-drop run batched on device
  (ops.preprocess) rather than per-image numpy;
* the reference's latent ImportError (``rerun_braai`` imported from a
  commented-out definition, query_train_data.py:6 vs alert_utils.py:229-255)
  is replaced by an optional ``drb_fn`` scoring hook — by default the
  existing ``drb`` field is carried through.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np

# Projection of candidate/classification fields requested per alert —
# the ZTF avro schema subset BTSbot trains on (query_train_data.py:103-203).
CANDIDATE_FIELDS = (
    "candid", "programid", "fid", "isdiffpos", "ndethist", "ncovhist", "sky",
    "fwhm", "seeratio", "mindtoedge", "nneg", "nbad", "scorr", "dsnrms",
    "ssnrms", "exptime", "field", "jd", "ra", "dec", "magpsf", "sigmapsf",
    "diffmaglim", "magap", "sigmagap", "magapbig", "sigmagapbig", "magdiff",
    "magzpsci", "magzpsciunc", "magzpscirms", "distnr", "magnr", "sigmanr",
    "chinr", "sharpnr", "neargaia", "neargaiabright", "maggaia",
    "maggaiabright", "drb", "classtar", "sgscore1", "distpsnr1", "sgscore2",
    "distpsnr2", "sgscore3", "distpsnr3", "jdstarthist", "jdstartref",
    "sgmag1", "srmag1", "simag1", "szmag1", "sgmag2", "srmag2", "simag2",
    "szmag2", "sgmag3", "srmag3", "simag3", "szmag3", "nmtchps", "clrcoeff",
    "clrcounc", "chipsf",
)
CLASSIFICATION_FIELDS = ("acai_h", "acai_v", "acai_o", "acai_n", "acai_b",
                         "bts")
CUTOUT_FIELDS = ("cutoutScience", "cutoutTemplate", "cutoutDifference")


def alert_projection(include_cutouts: bool = True) -> dict:
    proj: dict[str, int] = {"_id": 0, "objectId": 1}
    proj.update({f"candidate.{f}": 1 for f in CANDIDATE_FIELDS})
    proj.update({f"classifications.{f}": 1 for f in CLASSIFICATION_FIELDS})
    if include_cutouts:
        proj.update({f: 1 for f in CUTOUT_FIELDS})
    return proj


def alerts_query(ztfid: str, programid: int,
                 include_cutouts: bool = True) -> dict:
    """MongoDB-style find on the ZTF_alerts catalog for one object
    (query_train_data.py:100-203)."""
    return {
        "query_type": "find",
        "query": {
            "catalog": "ZTF_alerts",
            "filter": {"objectId": ztfid, "candidate.programid": programid},
            "projection": alert_projection(include_cutouts),
        },
    }


def client_from_env():
    """penquins Kowalski client from KOWALSKI_USER/KOWALSKI_PASS env vars
    (alert_utils.py:13-29); None when creds or penquins are absent."""
    user = os.environ.get("KOWALSKI_USER")
    password = os.environ.get("KOWALSKI_PASS")
    if user is None or password is None:
        return None
    try:
        from penquins import Kowalski
    except ImportError:
        return None
    return Kowalski(instances={"kowalski": {
        "protocol": "https", "port": 443, "host": "kowalski.caltech.edu",
        "username": user, "password": password}})


def query_alerts(
    ztfids: str | Sequence[str],
    client,
    programid: int,
    include_cutouts: bool = True,
    normalize: bool = True,
    save_raw: str | None = None,
    load_raw: str | None = None,
    verbose: bool = False,
) -> list[dict]:
    """Fetch alert packets per object×programid with an optional raw cache
    (``{ZTFID}_prog{programid}.npy`` files — query_train_data.py:208-243),
    decode cutouts into a ``triplet`` entry, and drop corrupt alerts."""
    import jax.numpy as jnp

    from ...ops.preprocess import preprocess_triplets
    from ..alerts import triplet_from_packet

    if isinstance(ztfids, str):
        ztfids = [ztfids]

    alerts: list[dict] = []
    for ztfid in ztfids:
        object_alerts = None
        cache_file = None
        if load_raw:
            cache_file = os.path.join(load_raw, f"{ztfid}_prog{programid}.npy")
            if os.path.exists(cache_file):
                object_alerts = list(np.load(cache_file, allow_pickle=True))
            else:
                cache_file = None

        if object_alerts is None:
            r = client.query(alerts_query(ztfid, programid, include_cutouts))
            object_alerts = r["kowalski"]["data"]
            if not object_alerts:
                if verbose:
                    print(f"  No programid={programid} data for {ztfid}")
                continue
            if save_raw and cache_file is None:
                os.makedirs(save_raw, exist_ok=True)
                np.save(os.path.join(save_raw, f"{ztfid}_prog{programid}"),
                        object_alerts)

        if include_cutouts:
            raw = np.stack([triplet_from_packet(a) for a in object_alerts])
            trips, drop = preprocess_triplets(jnp.asarray(raw),
                                              normalize=normalize)
            trips = np.asarray(trips, dtype=np.float64)
            drop = np.asarray(drop)
            object_alerts = [a for a, d in zip(object_alerts, drop) if not d]
            for alert, triplet in zip(object_alerts, trips[~drop]):
                alert["triplet"] = triplet

        alerts.extend(object_alerts)
        if verbose:
            print(f"  Finished {ztfid} (prog {programid})")
    return alerts


def extract_triplets(alerts: list[dict]):
    """Split ``triplet`` arrays out of alert dicts (alert_utils.py:199-226)."""
    triplets = np.empty((len(alerts), 63, 63, 3))
    for i, alert in enumerate(alerts):
        triplets[i] = alert.pop("triplet")
        for key in CUTOUT_FIELDS:
            alert.pop(key, None)
    return alerts, triplets


def compute_labels(alerts: list[dict], label) -> np.ndarray:
    """Label policy (query_train_data.py:350-366): int → constant; array →
    verbatim; "compute" → 1 for objects with any alert brighter than 18.5."""
    n = len(alerts)
    if isinstance(label, (int, np.integer)):
        return np.full(n, int(label), dtype=int)
    if isinstance(label, (list, np.ndarray)):
        label = np.asarray(label, dtype=int)
        assert len(label) == n
        return label
    if label == "compute":
        true_objs = {a["objectId"] for a in alerts
                     if a["candidate"]["magpsf"] < 18.5}
        return np.asarray([1 if a["objectId"] in true_objs else 0
                           for a in alerts])
    raise ValueError(f"Could not understand label: {label}")


def query_nondet(client, objid: str, first_alert_jd: float):
    """Last non-detection before first detection
    (alert_utils.py:258-330) → (jd, diffmaglim) or (nan, nan)."""
    import pandas as pd

    if client is None:
        return np.nan, np.nan
    r = client.query({
        "query_type": "find",
        "query": {
            "catalog": "ZTF_alerts_aux",
            "filter": {"_id": objid},
            "projection": {"_id": 0, "prv_candidates.jd": 1,
                           "prv_candidates.diffmaglim": 1,
                           "prv_candidates.magpsf": 1},
        },
    })
    data = r["kowalski"]["data"]
    if not data:
        return np.nan, np.nan
    prv = pd.DataFrame(data[0]["prv_candidates"])
    if "jd" not in prv.columns:
        return np.nan, np.nan
    if "magpsf" not in prv.columns:
        prv["magpsf"] = np.nan
    leading = prv[np.isnan(prv["magpsf"]) & (prv["jd"] < first_alert_jd)]
    if len(leading) == 0:
        return np.nan, np.nan
    last = leading.sort_values("jd", ascending=False).iloc[0]
    return last["jd"], last["diffmaglim"]


def download_training_data(
    query_df,
    query_name: str,
    label,
    client=None,
    out_dir: str = "data/base_data",
    include_cutouts: bool = True,
    normalize_cutouts: bool = True,
    cutout_size: int = 63,
    drb_fn: Callable[[np.ndarray], np.ndarray] | None = None,
    save_raw: str | None = None,
    load_raw: str | None = None,
    verbose: bool = False,
) -> None:
    """Full acquisition pipeline for one source list
    (query_train_data.py:281-394): query programid 1+2 alerts, build
    triplets + candidate table, save ``{query_name}_triplets.npy`` and
    ``{query_name}_candidates.csv``."""
    from ..alerts import prep_alerts

    client = client or client_from_env()
    if client is None:
        raise RuntimeError(
            "Kowalski credentials not found (KOWALSKI_USER/KOWALSKI_PASS) "
            "and no client provided.")

    ztfids = query_df["ZTFID"].to_list()
    alerts = []
    for programid in (1, 2):
        alerts += query_alerts(
            ztfids, client, programid, include_cutouts=include_cutouts,
            normalize=normalize_cutouts, save_raw=save_raw,
            load_raw=load_raw, verbose=verbose)

    labels = compute_labels(alerts, label)
    os.makedirs(out_dir, exist_ok=True)

    new_drb = None
    if include_cutouts:
        alerts, triplets = extract_triplets(alerts)
        if drb_fn is not None:
            new_drb = drb_fn(triplets)
        if cutout_size != 63:
            import jax.numpy as jnp

            from ...ops.preprocess import crop_triplets
            triplets = np.asarray(
                crop_triplets(jnp.asarray(triplets), cutout_size))
        suffix = str(cutout_size) if cutout_size != 63 else ""
        np.save(os.path.join(out_dir, f"{query_name}_triplets{suffix}.npy"),
                triplets)
        del triplets

    cand = prep_alerts(
        alerts, labels, new_drb,
        nondet_fn=lambda oid, jd: query_nondet(client, oid, jd))
    cand.to_csv(os.path.join(out_dir, f"{query_name}_candidates.csv"),
                index=False)
