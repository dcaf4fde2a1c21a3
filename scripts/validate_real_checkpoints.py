"""One-command closure harness for REAL published checkpoints.

This environment has no egress, so the headline `load_HF_model` promise
(reference from_HF.py:59-81, README.md:31-43) and the timm "rw"-variant
manifests (interop/manifests.py:26-32) have only ever been exercised against
fake snapshots.  THIS IS THE FIRST COMMAND TO RUN THE MOMENT NETWORK EXISTS:

    python scripts/validate_real_checkpoints.py            # everything
    python scripts/validate_real_checkpoints.py --timm-only
    python scripts/validate_real_checkpoints.py --btsbot convnext:imagenet:mm

It closes, per artifact class:

* **timm backbones** (`timm/convnext_pico.d1_in1k`,
  `timm/maxvit_tiny_rw_224.sw_in1k`): fetch the state dict (via timm when
  importable, else a huggingface_hub snapshot), run
  ``manifests.validate_state_dict`` (the drift report must be clean — this
  is what proves or corrects the paper-derived "rw" structural details),
  convert with ``pretrained.backbone_variables``, run a forward pass, and —
  when timm is importable — assert flax-vs-torch backbone feature parity.
* **published BTSbot models** (`nabeelr/BTSbot-*`): download via
  ``interop.hf.download_HF_model``, convert via ``load_model_dir``, score
  the reference's real 39-alert fixture
  (/root/reference/btsbot/example_data/usage_{triplets.npy,candidates.csv})
  and compare against its golden ``expected_scores`` column at the
  reference's own torch-vs-onnx tolerance (to_onnx.py:135-137: rtol=1e-4,
  atol=1e-5).  ``expected_scores`` was produced by ONE of the published
  models (the README default is convnext/galaxyzoo/multi-modal); the
  harness records per-repo max deviation and requires at least one
  multimodal repo to match within tolerance.

Results land in docs/real_checkpoint_validation.json.  Every fetch is
injectable, so tests/test_validate_real_checkpoints.py drives the full flow
offline against fake snapshots (proving the harness itself; the real
artifacts still require network).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Overridable so CI runners (which clone the public upstream themselves)
# can point at their own checkout — see .github/workflows/ci.yml
# `real-checkpoints:` job.
REF_DATA = os.environ.get("BTSBOT_REF_DATA",
                          "/root/reference/btsbot/example_data")

TIMM_KINDS = ("convnext_pico.d1_in1k", "maxvit_tiny_rw_224.sw_in1k")

# (architecture, multi_modal, pretrain) per the reference's public matrix
# (from_HF.py:16-29).  expected_scores provenance: README.md usage defaults.
BTSBOT_REPOS = [
    ("convnext", True, "galaxyzoo"), ("convnext", True, "imagenet"),
    ("convnext", True, "randinit"), ("convnext", False, "galaxyzoo"),
    ("convnext", False, "imagenet"), ("convnext", False, "randinit"),
    ("maxvit", True, "galaxyzoo"), ("maxvit", True, "imagenet"),
    ("maxvit", True, "randinit"), ("maxvit", False, "galaxyzoo"),
    ("maxvit", False, "imagenet"), ("maxvit", False, "randinit"),
]

RTOL, ATOL = 1e-4, 1e-5  # reference verify tolerance (to_onnx.py:135-137)

# The repo that produced example_data's expected_scores column (README.md
# usage defaults: multi-modal ConvNeXt, galaxyzoo pretraining).  Closing
# expected_scores is only demanded when this repo is in the validated set —
# other repos are different trained models and legitimately score
# differently.
EXPECTED_SCORES_REPO = ("convnext", True, "galaxyzoo")


# --------------------------------------------------------------------------
# Fetchers (each injectable for the offline harness test)
# --------------------------------------------------------------------------

def fetch_timm_state_dict(model_kind: str) -> dict[str, np.ndarray]:
    """Real pretrained backbone weights: timm when importable, else the
    raw HF snapshot of the timm repo."""
    try:
        import timm  # noqa: F401  (absent offline)
    except ImportError:
        timm = None
    if timm is not None:
        import torch  # noqa: F401

        model = timm.create_model(model_kind, pretrained=True)
        return {k: v.numpy() for k, v in model.state_dict().items()}
    from huggingface_hub import snapshot_download

    snap = snapshot_download(repo_id=f"timm/{model_kind}")
    for name in ("model.safetensors", "pytorch_model.bin"):
        path = os.path.join(snap, name)
        if os.path.isfile(path):
            if name.endswith(".safetensors"):
                from safetensors.numpy import load_file

                return dict(load_file(path))
            from btsbot_tpu.interop.hf import load_torch_checkpoint

            return load_torch_checkpoint(path)
    raise FileNotFoundError(f"no weights file in snapshot {snap}")


def fetch_timm_torch_model(model_kind: str):
    """The torch oracle for feature parity — None when timm is absent."""
    try:
        import timm
    except ImportError:
        return None
    return timm.create_model(model_kind, pretrained=True, num_classes=0)


# --------------------------------------------------------------------------
# timm backbone closure
# --------------------------------------------------------------------------

def validate_timm_backbone(model_kind: str,
                           state_dict: dict | None = None,
                           torch_oracle="fetch",
                           log=print) -> dict:
    """Manifest drift check + conversion + forward (+ torch feature parity
    when an oracle is available) for one timm backbone kind."""
    import jax
    import jax.numpy as jnp

    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.interop.manifests import validate_state_dict
    from btsbot_tpu.interop.pretrained import (apply_backbone,
                                               backbone_variables)

    if state_dict is None:
        state_dict = fetch_timm_state_dict(model_kind)
    result: dict = {"model_kind": model_kind, "n_keys": len(state_dict)}

    report = validate_state_dict(state_dict, model_kind, num_classes=None)
    # classifier layout varies by corpus; conversion discards head.* anyway
    report["unexpected"] = [k for k in report["unexpected"]
                            if not k.startswith("head.")]
    report["ok"] = not (report["missing"] or report["unexpected"]
                        or report["mismatched"])
    result["manifest_report"] = {
        "ok": report["ok"], "missing": report["missing"],
        "unexpected": report["unexpected"],
        "mismatched": [[k, list(a), list(b)]
                       for k, a, b in report["mismatched"]],
    }
    log(f"{model_kind}: manifest {'CLEAN' if report['ok'] else 'DRIFT'}")
    if not report["ok"]:
        log(json.dumps(result["manifest_report"], indent=1))
        result["ok"] = False
        return result  # correct manifests.py + converter from this report

    family = "mm_ConvNeXt" if "convnext" in model_kind else "mm_MaxViT"
    config = normalize_config({
        "model_name": family, "model_kind": model_kind,
        "train_data_version": "v10",
        "metadata_cols": [f"m{i}" for i in range(25)],
        "meta_fc1_neurons": 8, "meta_fc2_neurons": 8, "meta_dropout": 0.1,
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
    })
    fragment = backbone_variables(config, state_dict)
    model, variables = init_model(config, rng=0)
    variables = apply_backbone(variables, fragment)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(2, 25)).astype(np.float32)
    scores = np.asarray(jax.nn.sigmoid(model.apply(
        variables, image_input=jnp.asarray(img),
        metadata_input=jnp.asarray(meta), train=False)).reshape(-1))
    result["forward_finite"] = bool(np.all(np.isfinite(scores)))
    log(f"{model_kind}: converted forward finite="
        f"{result['forward_finite']}")

    if torch_oracle == "fetch":
        torch_oracle = fetch_timm_torch_model(model_kind)
    if torch_oracle is not None:
        import torch

        from btsbot_tpu.models.maxvit import get_model_image_size

        size = get_model_image_size(model_kind) \
            if "maxvit" in model_kind else 63
        x = rng.normal(size=(2, size, size, 3)).astype(np.float32)
        with torch.no_grad():
            # unpooled feature map: exactly what the converter maps, with
            # no head-norm/pool ambiguity between corpora
            want = torch_oracle.eval().forward_features(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
            ).numpy()
        got = np.transpose(np.asarray(_backbone_feature_map(
            config, fragment, jnp.asarray(x))), (0, 3, 1, 2))
        result["torch_feature_maxdiff"] = float(np.max(np.abs(got - want)))
        result["torch_feature_parity"] = bool(np.allclose(
            got, want, rtol=RTOL, atol=ATOL))
        log(f"{model_kind}: torch feature parity="
            f"{result['torch_feature_parity']} "
            f"(max diff {result['torch_feature_maxdiff']:.2e})")
    else:
        result["torch_feature_parity"] = None
        log(f"{model_kind}: timm not importable — feature-parity oracle "
            f"skipped (conversion + manifest still closed)")
    result["ok"] = result["forward_finite"] and \
        result["torch_feature_parity"] is not False
    return result


def _backbone_feature_map(config, fragment, img_nhwc):
    """Run the bare backbone module with the converted fragment: NHWC
    feature map matching timm's forward_features (as NCHW after transpose)."""
    import jax.numpy as jnp

    if "ConvNeXt" in config["model_name"]:
        from btsbot_tpu.models.convnext import _backbone_from_config

        backbone = _backbone_from_config(config, jnp.float32)
        return backbone.apply(
            {"params": fragment["params"]["backbone"]}, img_nhwc)
    from btsbot_tpu.models.maxvit import _backbone_and_size

    backbone, _ = _backbone_and_size(config, jnp.float32)
    return backbone.apply(
        {"params": fragment["params"]["backbone"],
         "batch_stats": fragment["batch_stats"]["backbone"]},
        img_nhwc, train=False)


# --------------------------------------------------------------------------
# BTSbot published-model closure
# --------------------------------------------------------------------------

def _fixture():
    import pandas as pd

    triplets = np.load(os.path.join(REF_DATA, "usage_triplets.npy")
                       ).astype(np.float32)
    cand = pd.read_csv(os.path.join(REF_DATA, "usage_candidates.csv"))
    return triplets, cand


def validate_btsbot_repo(architecture: str, multi_modal: bool, pretrain: str,
                         models_root: str = "models",
                         fixture=None, log=print) -> dict:
    """Download/convert one published model and score the golden fixture."""
    import jax
    import jax.numpy as jnp

    from btsbot_tpu.interop.hf import (get_HF_model_link,
                                       get_local_model_dir, load_HF_model)

    name = get_HF_model_link(architecture, multi_modal, pretrain)
    result: dict = {"repo": name, "multi_modal": multi_modal}
    model, variables, config = load_HF_model(
        architecture, multi_modal, pretrain, models_root=models_root)
    result["model_dir"] = get_local_model_dir(
        architecture, multi_modal, pretrain, models_root)

    triplets, cand = fixture if fixture is not None else _fixture()
    meta = None
    if multi_modal:
        meta = jnp.asarray(np.stack(
            [np.asarray(cand[c], np.float32)
             for c in config["metadata_cols"]], axis=1))
    scores = np.asarray(jax.nn.sigmoid(model.apply(
        variables, image_input=jnp.asarray(triplets),
        metadata_input=meta, train=False)).reshape(-1))
    result["scores_finite"] = bool(np.all(np.isfinite(scores)))
    result["scores"] = [float(s) for s in scores]

    if "expected_scores" in cand.columns:
        want = np.asarray(cand["expected_scores"], np.float32)
        result["expected_maxdiff"] = float(np.max(np.abs(scores - want)))
        result["matches_expected"] = bool(np.allclose(
            scores, want, rtol=RTOL, atol=ATOL))
    else:
        result["matches_expected"] = None
    log(f"{name}: finite={result['scores_finite']} "
        f"matches_expected={result.get('matches_expected')} "
        f"maxdiff={result.get('expected_maxdiff', float('nan')):.2e}")
    result["ok"] = result["scores_finite"]
    return result


# --------------------------------------------------------------------------

def run_all(timm_kinds=TIMM_KINDS, btsbot_repos=BTSBOT_REPOS,
            models_root: str = "models", out: str = "docs",
            state_dict_fetcher=None, torch_oracle="fetch",
            fixture=None, log=print) -> dict:
    results: dict = {"timm": [], "btsbot": []}
    for kind in timm_kinds:
        try:
            sd = state_dict_fetcher(kind) if state_dict_fetcher else None
            results["timm"].append(validate_timm_backbone(
                kind, state_dict=sd, torch_oracle=torch_oracle, log=log))
        except Exception as e:  # keep going: each artifact closes separately
            log(f"{kind}: FAILED — {type(e).__name__}: {e}")
            results["timm"].append({"model_kind": kind, "ok": False,
                                    "error": f"{type(e).__name__}: {e}"})
    for arch, mm, pre in btsbot_repos:
        try:
            results["btsbot"].append(validate_btsbot_repo(
                arch, mm, pre, models_root=models_root, fixture=fixture,
                log=log))
        except Exception as e:
            # a combo absent from the Hub is not a conversion failure: the
            # published matrix (README collection) may not span all 12
            missing = "RepositoryNotFound" in type(e).__name__ or \
                "404" in str(e)
            log(f"{arch}/{pre}/mm={mm}: "
                f"{'MISSING ON HUB' if missing else 'FAILED'} — "
                f"{type(e).__name__}: {e}")
            results["btsbot"].append({
                "repo": f"{arch}-{pre}-mm={mm}", "ok": False,
                "missing_on_hub": missing,
                "error": f"{type(e).__name__}: {e}"})

    matched = [r["repo"] for r in results["btsbot"]
               if r.get("matches_expected")]
    present = [r for r in results["btsbot"] if not r.get("missing_on_hub")]
    results["expected_scores_matched_by"] = matched
    results["closure"] = {
        "timm_ok": all(r.get("ok") for r in results["timm"]),
        "btsbot_ok": bool(present) and all(r.get("ok") for r in present),
        # a match anywhere closes expected_scores; absence of a match only
        # fails the run when the provenance repo was in the validated set —
        # other repos are different trained models and legitimately score
        # differently (None = not applicable to this run's subset)
        "expected_scores_closed": True if matched else (
            False if EXPECTED_SCORES_REPO in list(btsbot_repos) else None),
    }
    if out:
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, "real_checkpoint_validation.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        log(f"wrote {path}")
    log(f"CLOSURE: {json.dumps(results['closure'])}")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--timm-only", action="store_true")
    p.add_argument("--btsbot",
                   help="single repo as arch:pretrain:mm|um "
                        "(e.g. convnext:galaxyzoo:mm)")
    p.add_argument("--models-root", default="models")
    p.add_argument("--out", default="docs")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion work, not compute

    repos = BTSBOT_REPOS
    if args.timm_only:
        repos = []
    elif args.btsbot:
        arch, pre, modal = args.btsbot.split(":")
        repos = [(arch, modal == "mm", pre)]
    results = run_all(btsbot_repos=repos, models_root=args.models_root,
                      out=args.out)
    ok = all(v for v in results["closure"].values()
             if v is not None) if not args.timm_only \
        else results["closure"]["timm_ok"]
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
