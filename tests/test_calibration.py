"""Temperature-scaling calibration: recovery of a known temperature, NLL
convexity, and ECE improvement on overconfident scores."""

import numpy as np

from btsbot_tpu.metrics.calibration import (
    calibrate_scores,
    calibration_report,
    expected_calibration_error,
    fit_temperature,
    nll,
    scores_to_logits,
)


def _overconfident(n=20000, true_t=3.0, seed=0):
    """Well-calibrated latent logits, reported at true_t× overconfidence."""
    rng = np.random.default_rng(seed)
    z = rng.normal(0.0, 1.5, n)  # calibrated logits
    labels = (rng.random(n) < 1.0 / (1.0 + np.exp(-z))).astype(np.float32)
    scores = 1.0 / (1.0 + np.exp(-z * true_t))  # overconfident reports
    return scores, labels


def test_logit_round_trip():
    s = np.array([0.001, 0.25, 0.5, 0.97], np.float64)
    back = 1.0 / (1.0 + np.exp(-scores_to_logits(s)))
    np.testing.assert_allclose(back, s, rtol=1e-6)


def test_fit_recovers_known_temperature():
    scores, labels = _overconfident(true_t=3.0)
    t = fit_temperature(scores_to_logits(scores), labels)
    assert 2.7 < t < 3.3, t
    # and fitting already-calibrated scores yields T ~ 1
    calibrated = calibrate_scores(scores, t)
    t2 = fit_temperature(scores_to_logits(calibrated), labels)
    assert 0.9 < t2 < 1.1, t2


def test_fitted_temperature_is_nll_optimal():
    scores, labels = _overconfident(true_t=2.0, seed=1)
    logits = scores_to_logits(scores)
    t = fit_temperature(logits, labels)
    best = nll(logits, labels, t)
    for other in (0.5, 1.0, t * 0.9, t * 1.1, 4.0):
        assert best <= nll(logits, labels, other) + 1e-9


def test_report_improves_ece_and_nll():
    scores, labels = _overconfident(true_t=3.0, seed=2)
    rep = calibration_report(scores, labels)
    assert rep["ece_after"] < rep["ece_before"] * 0.5
    assert rep["nll_after"] < rep["nll_before"]
    assert rep["ece_after"] < 0.02
    # perfect scores on separable labels keep a tiny ECE
    clean = np.where(labels > 0.5, 0.99, 0.01).astype(np.float64)
    assert expected_calibration_error(clean, labels) < 0.02


def test_calibrated_serving_matches_posthoc():
    """AlertScorer/AlertStreamScorer(temperature=T) serve exactly
    calibrate_scores(raw, T) — the in-graph form of the post-hoc fix."""
    import jax.numpy as jnp

    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.engine.serve import AlertScorer
    from test_engine import SMALL_CFG, synthetic_dataset

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    ds = synthetic_dataset(16, seed=3)

    raw = AlertScorer(config, variables, batch_size=16, dtype=jnp.float32)
    calibrated = AlertScorer(config, variables, batch_size=16,
                             dtype=jnp.float32, temperature=2.5)
    s_raw = raw(ds.images, ds.metadata)
    s_cal = calibrated(ds.images, ds.metadata)
    np.testing.assert_allclose(s_cal, calibrate_scores(s_raw, 2.5),
                               rtol=1e-5, atol=1e-6)
