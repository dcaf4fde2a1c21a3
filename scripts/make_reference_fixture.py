"""Create a permanent REFERENCE-TRAINED torch checkpoint fixture.

Every converter/scorer/export test so far exercises either random-init or
builder-mirror-initialized state dicts; a state dict that the reference's own
trainer PRODUCED (optimizer trajectory, BN running stats, early-stop choice)
is a categorically better fixture (VERDICT r4 #7).  This script:

* trains the reference's own ``mm_cnn`` via its executable ``run_training``
  (/root/reference/btsbot/train.py:75-478; wandb/timm/torchvision stubbed
  exactly as scripts/trainer_parity.py does) on the hard synthetic fixture;
* copies the resulting ``best_model.pth`` + ``report.json`` (~1 MB) into
  ``tests/fixtures/ref_trained_mm_cnn/``;
* scores the reference's real 39-alert example data
  (example_data/usage_{triplets.npy,candidates.csv}) with the reference's
  own ``mm_cnn`` class loading that checkpoint, and stores the scores as
  ``expected_scores.npy`` — so the regression test
  (tests/test_reference_trained_fixture.py) asserts converted-flax scores
  against REFERENCE-EXECUTED output without needing the reference checkout.

Run:  python scripts/make_reference_fixture.py  (CPU, ~2 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_run import META_COLS, make_dataset  # noqa: E402
from trainer_parity import (_ref_run_dir, reference_trainer,  # noqa: E402
                            run_reference, write_reference_files)

REF_DATA = "/root/reference/btsbot/example_data"
FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "ref_trained_mm_cnn")


def score_with_reference(run_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """The reference's own mm_cnn class + trained state dict on the real
    39-alert fixture (the preprocessing contract matches usage: triplets are
    already normalized, metadata taken column-wise).  Returns (scores,
    logits) — the real-data metadata is far out of the synthetic training
    distribution, so sigmoid scores saturate at 1.0 exactly and only the
    LOGITS carry a meaningful parity signal."""
    import pandas as pd
    import torch

    with open(os.path.join(run_dir, "report.json")) as f:
        config = json.load(f)["train_config"]

    triplets = np.load(os.path.join(REF_DATA, "usage_triplets.npy"))
    cand = pd.read_csv(os.path.join(REF_DATA, "usage_candidates.csv"))
    meta = cand[config["metadata_cols"]].to_numpy(np.float32)
    imgs = np.transpose(triplets.astype(np.float32), (0, 3, 1, 2))

    with reference_trainer() as train:  # noqa: F841 — imports architectures
        import architectures

        model = architectures.mm_cnn(dict(config))
        model.load_state_dict(torch.load(
            os.path.join(run_dir, "best_model.pth")))
        model.eval()
        with torch.no_grad():
            logits = model(torch.from_numpy(np.ascontiguousarray(imgs)),
                           torch.from_numpy(meta)).numpy().reshape(-1)
            scores = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    return scores.astype(np.float32), logits


def score_in_distribution(run_dir: str, n: int = 39,
                          seed: int = 5) -> tuple[np.ndarray, np.ndarray,
                                                  np.ndarray]:
    """Reference-executed scores on IN-distribution alerts (fresh draw from
    the same hard-fixture generator the model trained on).  The real
    39-alert metadata is far outside the synthetic training distribution
    (BN1d blows logits to ~1.5e4 and scores saturate at 1.0), so this leg
    provides the non-saturated SCORE-space parity target; inputs are saved
    into the fixture so the test needs no reference checkout."""
    import torch

    ds = make_dataset(40, (4, 12), seed=seed, hard=True)
    imgs_nhwc = np.asarray(ds.images, np.float32)[:n]
    meta = ds.candidates[META_COLS].to_numpy(np.float32)[:n]

    with open(os.path.join(run_dir, "report.json")) as f:
        config = json.load(f)["train_config"]
    with reference_trainer() as train:  # noqa: F841
        import architectures

        model = architectures.mm_cnn(dict(config))
        model.load_state_dict(torch.load(
            os.path.join(run_dir, "best_model.pth")))
        model.eval()
        with torch.no_grad():
            logits = model(
                torch.from_numpy(np.ascontiguousarray(
                    np.transpose(imgs_nhwc, (0, 3, 1, 2)))),
                torch.from_numpy(meta)).numpy().reshape(-1)
    scores = (1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
              ).astype(np.float32)
    return imgs_nhwc, meta, scores


def main():
    epochs = int(os.environ.get("FIXTURE_EPOCHS", "6"))
    workdir = tempfile.mkdtemp(prefix="ref_fixture_")
    try:
        splits = {
            "train": make_dataset(300, (4, 12), seed=0, hard=True),
            "val": make_dataset(80, (4, 12), seed=1, hard=True),
        }
        write_reference_files(workdir, splits, "vp", META_COLS)
        metrics = run_reference(workdir, "mm_cnn", seed=0, epochs=epochs)
        print(f"reference mm_cnn trained: {json.dumps(metrics)}", flush=True)

        run_dir = _ref_run_dir(workdir, "mm_cnn")
        scores, logits = score_with_reference(run_dir)
        assert scores.shape == logits.shape == (39,)
        assert np.all(np.isfinite(logits))

        os.makedirs(FIXTURE_DIR, exist_ok=True)
        for name in ("best_model.pth", "report.json"):
            shutil.copy2(os.path.join(run_dir, name),
                         os.path.join(FIXTURE_DIR, name))
        np.save(os.path.join(FIXTURE_DIR, "expected_scores.npy"), scores)
        np.save(os.path.join(FIXTURE_DIR, "expected_logits.npy"), logits)

        imgs_id, meta_id, scores_id = score_in_distribution(run_dir)
        assert 0.02 < scores_id.mean() < 0.98 and scores_id.std() > 0.05, \
            "in-distribution leg must not saturate"
        np.savez_compressed(
            os.path.join(FIXTURE_DIR, "in_distribution.npz"),
            images=imgs_id, metadata=meta_id, expected_scores=scores_id)
        with open(os.path.join(FIXTURE_DIR, "PROVENANCE.md"), "w") as f:
            f.write(
                "# ref_trained_mm_cnn\n\n"
                "Produced by scripts/make_reference_fixture.py: the "
                "REFERENCE's own `run_training` (train.py:75-478) trained "
                f"mm_cnn for {epochs} epochs (seed 0) on the hard synthetic "
                "fixture (quality_run.make_dataset); best_model.pth + "
                "report.json are byte-for-byte the reference trainer's "
                "outputs.  expected_scores.npy is the reference's own "
                "mm_cnn class executing this checkpoint on the real "
                "39-alert example_data fixture (loading contract "
                "architectures.py:322-338).  Val metrics at creation: "
                f"{json.dumps(metrics)}\n")
        print(f"fixture written to {FIXTURE_DIR}", flush=True)
        print("logits[:5] =", logits[:5], flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
