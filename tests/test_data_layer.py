"""Data layer: alert decoding, engineered features (vs a literal slow-loop
oracle of alert_utils.py:374-419), split/subset engine semantics, and the
Kowalski pipeline against a fake client."""

import gzip
import io
import os

import numpy as np
import pandas as pd
import pytest

from btsbot_tpu.data.alerts import (
    engineered_features,
    make_triplet,
    pad_stamp,
    prep_alerts,
    triplet_from_packet,
)
from btsbot_tpu.data.splits import (
    assign_splits,
    create_cuts_str,
    create_subset,
    merge_sets,
    only_pd_gr,
    only_pd_gr_ps,
    split_apart,
    subsample_objects,
)


from btsbot_tpu.data.fits import read_fits_image, write_fits_image


def _fits_stamp_blob(data: np.ndarray) -> bytes:
    """Gzip-compressed FITS file like ZTF stampData blobs."""
    return gzip.compress(write_fits_image(data.astype(np.float32)))


def test_fits_reader_against_hand_built_file():
    """Reader validated against a FITS blob constructed by hand from the
    standard (not via write_fits_image), plus a round trip."""
    arr = np.arange(12, dtype=">f4").reshape(3, 4)
    cards = [
        b"SIMPLE  =                    T".ljust(80),
        b"BITPIX  =                  -32".ljust(80),
        b"NAXIS   =                    2".ljust(80),
        b"NAXIS1  =                    4".ljust(80),
        b"NAXIS2  =                    3".ljust(80),
        b"COMMENT hand-built for test".ljust(80),
        b"END".ljust(80),
    ]
    header = b"".join(cards)
    header += b" " * (-len(header) % 2880)
    data = arr.tobytes()
    data += b"\0" * (-len(data) % 2880)
    got = read_fits_image(header + data)
    np.testing.assert_array_equal(got, np.arange(12).reshape(3, 4))

    # round trip through the writer, several dtypes
    for dtype in (np.float32, np.float64, np.int16, np.int32):
        a = (np.arange(20).reshape(4, 5) - 7).astype(dtype)
        np.testing.assert_array_equal(read_fits_image(write_fits_image(a)), a)


def _packet(seed=0, size=63, objid="ZTF21abcdefg"):
    rng = np.random.default_rng(seed)
    cutouts = {}
    for key in ("Science", "Template", "Difference"):
        data = rng.normal(size=(size, size)).astype(np.float32)
        cutouts[f"cutout{key}"] = {"stampData": _fits_stamp_blob(data)}
    return {
        "objectId": objid,
        "candidate": {"candid": 1, "jd": 2459300.5, "magpsf": 18.0,
                      "jdstarthist": 2459290.0, "ncovhist": 10,
                      "ndethist": 4},
        "classifications": {"acai_h": 0.1},
        **cutouts,
    }


def test_make_triplet_decode_and_normalize():
    trip, drop = make_triplet(_packet())
    assert trip.shape == (63, 63, 3)
    assert not drop
    # per-cutout L2 norm = 1 after preprocessing
    np.testing.assert_allclose(np.linalg.norm(trip, axis=(0, 1)), 1.0,
                               rtol=1e-5)


def test_undersized_stamp_padded_with_1e9():
    packet = _packet(size=60)
    trip = triplet_from_packet(packet)
    assert trip.shape == (63, 63, 3)
    np.testing.assert_allclose(trip[61:, :, 0], 1e-9)
    np.testing.assert_allclose(trip[:, 61:, 1], 1e-9)
    assert pad_stamp(np.ones((63, 63), np.float32)).shape == (63, 63)


def _oracle_features(df):
    """Literal per-object prefix loop per alert_utils.py:391-419."""
    df = df.copy()
    df["nnotdet"] = df["ncovhist"] - df["ndethist"]
    for col in ("peakmag", "maxmag", "peakmag_so_far", "maxmag_so_far",
                "age", "days_since_peak", "days_to_peak"):
        df[col] = np.nan
    for objid in pd.unique(df["objectId"]):
        obj = df[df["objectId"] == objid].sort_values("jd")
        df.loc[df["objectId"] == objid, "peakmag"] = obj["magpsf"].min()
        df.loc[df["objectId"] == objid, "maxmag"] = obj["magpsf"].max()
        for i in range(len(obj)):
            cur = obj.index[i]
            sofar = obj.index[: i + 1]
            jd_first = min(df.loc[cur, "jdstarthist"], obj["jd"].min())
            pk = df.loc[sofar, "magpsf"].min()
            mx = df.loc[sofar, "magpsf"].max()
            df.loc[cur, "peakmag_so_far"] = pk
            df.loc[cur, "maxmag_so_far"] = mx
            jd_peak = obj.loc[obj["magpsf"] == pk, "jd"].to_numpy()[0]
            df.loc[cur, "age"] = df.loc[cur, "jd"] - jd_first
            df.loc[cur, "days_since_peak"] = df.loc[cur, "jd"] - jd_peak
            df.loc[cur, "days_to_peak"] = jd_peak - jd_first
    return df


def test_engineered_features_match_oracle():
    rng = np.random.default_rng(0)
    rows = []
    for o in range(12):
        for i in range(rng.integers(1, 7)):
            rows.append((f"ZTF{o:04d}", 2459000 + o + i * 1.3 + rng.random(),
                         rng.uniform(16, 21),
                         2458990.0 + o, 20 + i, 5 + i))
    df = pd.DataFrame(rows, columns=["objectId", "jd", "magpsf",
                                     "jdstarthist", "ncovhist", "ndethist"])
    # include an exact duplicate magnitude to exercise tie resolution
    df.loc[1, "magpsf"] = df.loc[0, "magpsf"]

    got = engineered_features(df)
    expected = _oracle_features(df)
    for col in ("nnotdet", "peakmag", "maxmag", "peakmag_so_far",
                "maxmag_so_far", "age", "days_since_peak", "days_to_peak"):
        np.testing.assert_allclose(
            got[col].to_numpy().astype(float),
            expected[col].to_numpy().astype(float),
            err_msg=col, rtol=1e-12, atol=1e-9)


def test_prep_alerts_labels_and_columns():
    alerts = []
    for o in range(3):
        for i in range(2):
            a = {"objectId": f"ZTF{o}", "candidate": {
                "jd": 2459000 + i, "magpsf": 18 + o, "jdstarthist": 2458999.0,
                "ncovhist": 5, "ndethist": 2, "candid": o * 10 + i},
                "classifications": {"acai_h": 0.5}}
            alerts.append(a)
    df = prep_alerts(alerts, label=1, new_drb=np.full(6, 0.9))
    assert (df["label"] == 1).all()
    assert (df["new_drb"] == 0.9).all()
    assert "acai_h" in df.columns and "nnotdet" in df.columns
    df2 = prep_alerts(alerts, label=[0, 1] * 3)
    assert df2["label"].tolist() == [0, 1] * 3


# ------------------------------ splits ------------------------------------

def _set_frame(n_obj=30, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    trips = []
    for o in range(n_obj):
        n = rng.integers(2, 8)
        peak = rng.uniform(17, 20)
        for i in range(n):
            rows.append({
                "objectId": f"ZTF{o:04d}",
                "jd": 2459000 + o + i,
                "magpsf": peak + abs(rng.normal(0, 0.7)) * (i > 0),
                "peakmag": peak,
                "isdiffpos": "t" if rng.random() < 0.9 else "f",
                "fid": int(rng.integers(1, 4)),
                "sgscore1": rng.uniform(-1, 1),
                "sgscore2": rng.uniform(-1, 1),
                "label": int(peak < 18.5),
            })
            trips.append(np.full((4, 4, 3), len(rows), dtype=np.float32))
    return np.stack(trips), pd.DataFrame(rows)


def test_cuts_filters():
    trips, cand = _set_frame()
    t2, c2 = only_pd_gr(trips, cand)
    assert (c2["fid"].isin([1, 2])).all() and c2["isdiffpos"].all()
    assert len(t2) == len(c2)
    t3, c3 = only_pd_gr_ps(trips, cand)
    assert ((c3["sgscore1"] >= 0) | (c3["sgscore2"] >= 0)).all()


def test_cuts_str_naming():
    assert create_cuts_str(100, 100, False, True, False) == "_N100"
    assert create_cuts_str(50, 100, False, True, False) == "_Np50n100"
    assert create_cuts_str(100, 100, True, False, True) == "_N100_sne_nnt_rt"


def test_assign_splits_properties():
    trips, cand = _set_frame(n_obj=40)
    trips, out = assign_splits(trips, cand, "trues", cuts=only_pd_gr, seed=2)
    # split is constant per object; N is a permutation of 1..N_tot
    for _, obj in out.groupby("objectId"):
        assert obj["split"].nunique() == 1
        assert sorted(obj["N"].tolist()) == list(range(1, len(obj) + 1))
        # rise flag: all alerts at or before jd of min magpsf
        jd_peak = obj["jd"].iloc[int(np.argmin(obj["magpsf"].to_numpy()))]
        np.testing.assert_array_equal(obj["is_rise"], obj["jd"] <= jd_peak)
    assert out["is_SN"].all()  # trues are SNe
    assert set(out["split"]).issubset({"train", "val", "test"})
    # near_threshold flag window
    nt = out[out["near_threshold"]]
    assert ((nt["peakmag"] > 18.4) & (nt["peakmag"] < 18.6)).all()
    # deterministic under the same seed
    t2, c2 = _set_frame(n_obj=40)
    _, out2 = assign_splits(t2, c2, "trues", cuts=only_pd_gr, seed=2)
    np.testing.assert_array_equal(out["split"], out2["split"])


def test_dims_label_noise_cut():
    trips, cand = _set_frame(n_obj=30, seed=3)
    trips2, out = assign_splits(trips, cand, "dims", seed=2)
    assert (out["peakmag"] > 18.5).all()
    assert len(trips2) == len(out)


def test_create_subset_caps():
    trips, cand = _set_frame(n_obj=40, seed=4)
    trips, out = assign_splits(trips, cand, "trues", seed=2)
    parts = split_apart(trips, out)
    tr_trips, tr_cand = parts["train"]
    s_trips, s_cand, cuts_str = create_subset(
        tr_trips, tr_cand, "train", N_max_p=3, N_max_n=3)
    assert cuts_str == "_N3"
    assert s_cand.groupby("objectId").size().max() <= 3
    assert len(s_trips) == len(s_cand)
    # val: all trues alerts kept
    v_trips, v_cand = parts["val"]
    sv_trips, sv_cand, _ = create_subset(v_trips, v_cand, "val", N_max_p=3)
    assert len(sv_cand) == len(v_cand)


def test_vars_latest_n_and_merge_and_subsample():
    trips, cand = _set_frame(n_obj=20, seed=5)
    trips, out = assign_splits(trips, cand, "vars", seed=2)
    parts = split_apart(trips, out)
    tr_trips, tr_cand = parts["train"]
    s_trips, s_cand, _ = create_subset(tr_trips, tr_cand, "train",
                                       N_max_p=2, N_max_n=2)
    for _, obj in s_cand.groupby("objectId"):
        assert len(obj) <= 2
        src = tr_cand[tr_cand["objectId"] == obj["objectId"].iloc[0]]
        # kept alerts are the LATEST by jd
        assert set(obj["jd"]) == set(src.sort_values("jd")["jd"].iloc[-2:])

    m_trips, m_cand = merge_sets([(s_trips, s_cand), (s_trips, s_cand)],
                                 seed=2)
    assert len(m_trips) == 2 * len(s_trips) == len(m_cand)
    # triplets stay aligned with cand rows through the shuffle
    # (trips were filled with a row marker in channel 0)
    ss_trips, ss_cand = subsample_objects(m_trips, m_cand, 50, seed=2)
    assert len(ss_trips) == len(ss_cand)
    assert ss_cand["objectId"].nunique() <= m_cand["objectId"].nunique()


# ------------------------------ kowalski fake ------------------------------

class FakeKowalski:
    """Offline stand-in for penquins' client."""

    def __init__(self, packets_by_obj):
        self.packets = packets_by_obj

    def query(self, q):
        flt = q["query"]["filter"]
        if q["query"]["catalog"] == "ZTF_alerts":
            data = [p for p in self.packets.get(flt["objectId"], [])
                    if p["candidate"]["programid"] == flt["candidate.programid"]]
        else:  # aux catalog: no non-detections in the fake
            data = []
        return {"kowalski": {"data": data}}


def test_kowalski_pipeline_offline(tmp_path):
    from btsbot_tpu.data.query.kowalski import (
        compute_labels,
        download_training_data,
        query_alerts,
    )

    packets = {}
    for o in range(3):
        oid = f"ZTF2{o:04d}"
        plist = []
        for i in range(2):
            p = _packet(seed=o * 10 + i, objid=oid)
            p["candidate"].update({"programid": 1 + (i % 2), "candid": o * 10 + i,
                                   "magpsf": 18.0 + o})
            plist.append(p)
        packets[oid] = plist
    client = FakeKowalski(packets)

    alerts = query_alerts(list(packets), client, programid=1)
    assert all("triplet" in a for a in alerts)
    assert all(a["triplet"].shape == (63, 63, 3) for a in alerts)

    labels = compute_labels(alerts, "compute")
    # magpsf < 18.5 only for the o=0 object
    assert set(labels) == {0, 1}

    df = pd.DataFrame({"ZTFID": list(packets)})
    download_training_data(df, "faketest", label=1, client=client,
                           out_dir=str(tmp_path), verbose=False)
    assert os.path.exists(tmp_path / "faketest_triplets.npy")
    cand = pd.read_csv(tmp_path / "faketest_candidates.csv")
    trips = np.load(tmp_path / "faketest_triplets.npy")
    assert len(cand) == len(trips) == 6
    assert (cand["label"] == 1).all()
    assert "peakmag_so_far" in cand.columns


def test_hf_dataset_conversion():
    from btsbot_tpu.data.hf_dataset import dataset_from_arrays

    trips, cand = _set_frame(n_obj=3, seed=6)
    trips63 = np.zeros((len(cand), 63, 63, 3), np.float32)
    cand = cand.assign(candid=np.arange(len(cand)))
    ds = dataset_from_arrays(trips63, cand)
    assert len(ds) == len(cand)
    assert ds.features["triplet"].shape == (63, 63, 3)
    assert ds.features["candid"].dtype == "string"
