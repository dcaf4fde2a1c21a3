"""Metrics: vectorized implementations vs sklearn and vs a literal
slow-loop oracle of the reference's policy replay semantics
(val.py:400-537)."""

import numpy as np
import pandas as pd
import pytest
from sklearn.metrics import auc as sk_auc, roc_curve as sk_roc_curve

from btsbot_tpu.metrics.classification import alert_metrics, f1, roc_auc, roc_curve
from btsbot_tpu.metrics.policy import (
    BRIGHT_NARROW_BINS,
    policy_performance,
    replay_policies,
)


def test_roc_matches_sklearn():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 500)
    scores = np.clip(labels * 0.3 + rng.normal(0.4, 0.25, 500), 0, 1)
    fpr, tpr, _ = roc_curve(labels, scores)
    sk_fpr, sk_tpr, _ = sk_roc_curve(labels, scores, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr)
    np.testing.assert_allclose(tpr, sk_tpr)
    assert abs(roc_auc(labels, scores) - sk_auc(sk_fpr, sk_tpr)) < 1e-12


def test_alert_metrics_basic():
    labels = np.array([1, 1, 0, 0, 1, 0])
    scores = np.array([0.9, 0.4, 0.2, 0.7, 0.8, 0.1])
    m = alert_metrics(labels, scores)
    assert m["confusion"] == {"TP": 2, "FP": 1, "TN": 2, "FN": 1}
    assert m["bts_acc"] == pytest.approx(2 / 3)
    assert m["notbts_acc"] == pytest.approx(2 / 3)
    assert m["alert_precision"] == pytest.approx(2 / 3)
    assert 0 < m["roc_auc"] < 1
    assert f1(1.0, 1.0) == pytest.approx(1.0, rel=1e-6)


def test_alert_metrics_degenerate_sentinels():
    m = alert_metrics(np.zeros(5), np.full(5, 0.1))
    assert m["alert_precision"] == -999.0 and m["alert_recall"] == -999.0


# ------------------------- policy replay oracle (reference semantics) ------

def _oracle_policies(cand: pd.DataFrame):
    """Literal prefix-loop replay of val.py:400-500."""
    def bts_p1(a):
        return len(a[(a.preds == 1) & (a.magpsf < 19)]) >= 2

    def bts_p2(a):
        return bts_p1(a) if np.min(a.magpsf) <= 18.5 else False

    def prod_p1(a):
        return len(a[(a.raw_preds > 0.85) & (a.magpsf < 19)]) >= 1

    def prod_p2(a):
        return prod_p1(a) if np.min(a.magpsf) <= 18.5 else False

    funcs = {"bts_p1": bts_p1, "bts_p2": bts_p2,
             "prod_p1": prod_p1, "prod_p2": prod_p2}
    out = {}
    for name, func in funcs.items():
        preds, jds = {}, {}
        for oid in pd.unique(cand.objectId):
            oa = cand[cand.objectId == oid].sort_values("jd")
            pred = 0
            jd = -1.0
            for i in range(len(oa)):
                p = int(func(oa.iloc[:i + 1]))
                if p and not pred:
                    jd = oa.iloc[i].jd
                pred = p
            preds[oid] = pred
            jds[oid] = jd
        out[name] = (preds, jds)
    return out


def _synthetic_cand(seed=0, n_obj=40):
    rng = np.random.default_rng(seed)
    rows = []
    for o in range(n_obj):
        n_alerts = rng.integers(1, 9)
        label = int(rng.random() < 0.5)
        base_jd = 2459300 + o
        mags = rng.uniform(16.5, 20.5, n_alerts)
        for i in range(n_alerts):
            score = np.clip(
                label * 0.5 + rng.normal(0.3, 0.3), 0.001, 0.999)
            rows.append((f"ZTF{o:05d}", base_jd + i * 0.7, mags[i],
                         score, label))
    df = pd.DataFrame(rows, columns=["objectId", "jd", "magpsf",
                                     "raw_preds", "label"])
    df["preds"] = np.rint(df.raw_preds).astype(int)
    return df


def test_policy_replay_matches_oracle():
    cand = _synthetic_cand()
    oracle = _oracle_policies(cand)
    replay = replay_policies(
        cand.objectId.to_numpy(), cand.jd.to_numpy(), cand.magpsf.to_numpy(),
        cand.raw_preds.to_numpy(), cand.label.to_numpy())

    for name in ("bts_p1", "bts_p2", "prod_p1", "prod_p2"):
        opreds, ojds = oracle[name]
        for i, oid in enumerate(replay.object_ids):
            assert replay.preds[name][i] == opreds[oid], (name, oid)
            assert replay.trigger_jd[name][i] == pytest.approx(ojds[oid]), \
                (name, oid)


def test_policy_object_filtering():
    cand = _synthetic_cand(seed=1)
    # coverage: objects with a single alert must be filtered out
    counts = cand.groupby("objectId").size()
    single = set(counts[counts < 2].index)
    # BTS-peak-thinned: label 1 with min mag > 18.5 filtered out
    thinned = {
        oid for oid, g in cand.groupby("objectId")
        if g.label.iloc[0] == 1 and g.magpsf.min() > 18.5
    }
    junk = {cand.objectId.iloc[0]}
    replay = replay_policies(
        cand.objectId.to_numpy(), cand.jd.to_numpy(), cand.magpsf.to_numpy(),
        cand.raw_preds.to_numpy(), cand.label.to_numpy(), junk_ids=junk)
    kept = set(replay.object_ids)
    assert not (kept & single)
    assert not (kept & thinned)
    assert not (kept & junk)


def test_policy_performance_shapes():
    cand = _synthetic_cand(seed=2, n_obj=80)
    replay = replay_policies(
        cand.objectId.to_numpy(), cand.jd.to_numpy(), cand.magpsf.to_numpy(),
        cand.raw_preds.to_numpy(), cand.label.to_numpy())
    save_times = {oid: 2459300.0 for oid in replay.object_ids[:10]}
    perf = policy_performance(replay, save_times=save_times,
                              trigger_times=save_times)
    for name, p in perf.items():
        assert set(p) == {"policy_precision", "policy_recall",
                          "binned_precision", "binned_recall",
                          "peakmag_bins", "med_save_dt", "med_trigger_dt"}
        if p["policy_precision"] > -999:
            assert len(p["binned_precision"]) == BRIGHT_NARROW_BINS.size - 1
            assert 0 <= p["policy_recall"] <= 1
