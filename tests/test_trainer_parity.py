"""Head-to-head trainer-quality harness (scripts/trainer_parity.py) on a
micro fixture: the reference's OWN run_training (train.py:75-478, executed
with stubbed absent deps) and engine/train.run_training train on identical
data and both reach the fixture's achievable quality.

The committed evidence artifact (docs/trainer_parity.json) comes from the
full run (400 objects x 15 epochs x 3 seeds); this test keeps the harness
itself executable in CI at ~2 min.  Skipped without the reference checkout.
"""

import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir("/root/reference/btsbot"),
                       reason="reference checkout not present"),
]


def test_reference_and_our_trainer_reach_quality_on_same_fixture(tmp_path):
    import trainer_parity as tp
    from quality_run import make_dataset

    splits = {
        "train": make_dataset(120, (4, 10), seed=0, hard=True),
        "val": make_dataset(40, (4, 10), seed=1, hard=True),
    }
    workdir = str(tmp_path / "work")
    os.makedirs(workdir)
    tp.write_reference_files(workdir, splits,
                             tp.COMMON_HP["train_data_version"],
                             tp.META_COLS)

    # um_nn: converges in a few CPU epochs on the metadata signal
    ref = tp.run_reference(workdir, "um_nn", seed=0, epochs=6)
    ours = tp.run_ours(str(tmp_path / "ours"), "um_nn", seed=0, epochs=6,
                       splits=splits)

    for r in (ref, ours):
        assert np.isfinite(r["val_loss"])
        assert 1 <= r["epochs_ran"] <= 6
        # both trainers must clearly learn the fixture (hard-benchmark
        # metadata ceiling ~0.95; untrained = 0.5)
        assert r["roc_auc"] > 0.80, r
    # trainer parity within a generous single-seed micro-fixture band; the
    # tight statistical claim lives in docs/trainer_parity.json
    assert abs(ref["roc_auc"] - ours["roc_auc"]) < 0.10, (ref, ours)

def test_fusion_two_stage_parity_harness(tmp_path):
    """The r5 frozen_fusion leg: both sides train um_cnn + um_nn branches,
    then fuse each side's OWN run dirs and train only the combined head
    (reference freeze logic train.py:224-231 vs our masked optimizer)."""
    import trainer_parity as tp
    from quality_run import make_dataset

    splits = {
        "train": make_dataset(80, (4, 10), seed=0, hard=True),
        "val": make_dataset(30, (4, 10), seed=1, hard=True),
    }
    workdir = str(tmp_path / "work")
    os.makedirs(workdir)
    tp.write_reference_files(workdir, splits,
                             tp.COMMON_HP["train_data_version"],
                             tp.META_COLS)

    # 6 epochs: warmup_epochs=2 on a ~15-step micro fixture means a
    # 3-epoch run never leaves warmup (measured chance-level at 3)
    ref = tp.run_reference_fusion(workdir, seed=0, epochs=6)
    ours = tp.run_ours_fusion(str(tmp_path / "ours"), seed=0, epochs=6,
                              splits=splits)
    for r in (ref, ours):
        assert np.isfinite(r["val_loss"])
        # fused head on a 6-epoch metadata branch clearly beats chance
        # (measured: ref 0.866, ours 0.900 on this fixture/seed)
        assert r["roc_auc"] > 0.6, r


def test_timm_backed_reference_trainer_runs_on_mirror_backbone(tmp_path):
    """The r5 mm_ConvNeXt leg's enabling trick: the reference's run_training
    executes end to end with the torch ConvNeXt mirror installed as the
    stub timm.create_model (2 epochs, micro fixture)."""
    import trainer_parity as tp
    from quality_run import make_dataset

    splits = {
        "train": make_dataset(40, (4, 8), seed=0, hard=True),
        "val": make_dataset(20, (4, 8), seed=1, hard=True),
    }
    workdir = str(tmp_path / "work")
    os.makedirs(workdir)
    tp.write_reference_files(workdir, splits,
                             tp.COMMON_HP["train_data_version"],
                             tp.META_COLS)
    ref = tp.run_reference(workdir, "mm_ConvNeXt", seed=0, epochs=2)
    assert np.isfinite(ref["val_loss"]) and 1 <= ref["epochs_ran"] <= 2
