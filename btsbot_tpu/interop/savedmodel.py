"""Direct deployment artifact: TF SavedModel export via jax2tf.

The reference's broker-deployable artifact is an ONNX graph emitted with
``torch.onnx.export`` and verified cross-runtime at rtol 1e-4 / atol 1e-5
(`/root/reference/btsbot/to_onnx.py:68-143`).  This module is the TPU-native
equivalent that needs no torch hop: the f32 JAX scoring graph is lowered
with ``jax2tf`` (StableHLO embedded in a TF function, dynamic batch axis)
and written as a TF SavedModel that TF-Serving / any TF runtime can load.

Parity contract preserved: :func:`verify_saved_model` loads the artifact
back in TensorFlow and compares it against the native JAX f32 graph on the
given data with ``allclose(rtol=1e-4, atol=1e-5)`` — the reference's exact
tolerance — and reports max |diff|.  A second, fully independent ONNX
artifact (no TF dependency at the broker) lives in interop/onnx_export.py.

Signature convention (matching to_onnx.py:78-106): inputs named ``image``
(NHWC float32 — the TPU-native layout; the reference used NCHW) and/or
``metadata``, output ``logits`` with a dynamic leading batch dimension.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import Config, normalize_config
from ..models.factory import build_model

DEFAULT_TOLERANCE = {"rtol": 1e-4, "atol": 1e-5}


def scoring_fn(config, variables: Mapping[str, Any], dtype=jnp.float32):
    """(image?, metadata?) → logits (N,) — the deployable forward graph.

    Returns (fn, input_names): fn takes only the inputs the model category
    needs, in (image, metadata) order.
    """
    config = config if isinstance(config, Config) else normalize_config(config)
    model = build_model(config, dtype=dtype)
    need_img, need_meta = config.need_triplets, config.need_metadata

    def f(*args):
        it = iter(args)
        img = next(it) if need_img else None
        meta = next(it) if need_meta else None
        logits = model.apply(variables, image_input=img, metadata_input=meta,
                             train=False)
        return logits.reshape(-1)

    names = [n for n, used in (("image", need_img), ("metadata", need_meta))
             if used]
    return f, names


def _input_specs(config):
    """(tf.TensorSpec list, polymorphic-shape list) for the model category."""
    import tensorflow as tf

    specs, poly = [], []
    if config.need_triplets:
        s = int(config.get("image_size", 63))
        specs.append(tf.TensorSpec([None, s, s, 3], tf.float32, name="image"))
        poly.append(f"(b, {s}, {s}, 3)")
    if config.need_metadata:
        n = len(config["metadata_cols"])
        specs.append(tf.TensorSpec([None, n], tf.float32, name="metadata"))
        poly.append(f"(b, {n})")
    return specs, poly


def export_saved_model(config, variables: Mapping[str, Any],
                       out_dir: str) -> str:
    """Write a TF SavedModel of the f32 scoring graph with a dynamic batch
    axis.  Loadable with ``tf.saved_model.load(out_dir)``; call ``.logits``
    (or the default serving signature)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    config = config if isinstance(config, Config) else normalize_config(config)
    f, names = scoring_fn(config, variables)
    specs, poly = _input_specs(config)

    tf_fn = jax2tf.convert(f, polymorphic_shapes=poly,
                           with_gradient=False)
    module = tf.Module()
    module.logits = tf.function(tf_fn, autograph=False,
                                input_signature=specs)
    # concrete serving signature so `saved_model_cli` / TF-Serving see
    # named inputs (image/metadata) and the named `logits` output
    concrete = module.logits.get_concrete_function(*specs)

    def serving(**kwargs):
        return {"logits": tf_fn(*(kwargs[n] for n in names))}

    signature = tf.function(serving, autograph=False).get_concrete_function(
        **{n: s for n, s in zip(names, specs)})
    tf.saved_model.save(module, out_dir,
                        signatures={"serving_default": signature})
    del concrete
    return out_dir


def verify_saved_model(out_dir: str, config, variables: Mapping[str, Any],
                       triplets=None, metadata=None,
                       rtol: float = DEFAULT_TOLERANCE["rtol"],
                       atol: float = DEFAULT_TOLERANCE["atol"],
                       report_path: str | None = None) -> dict:
    """Load the SavedModel back and compare against the native JAX f32 graph
    (the analog of verify_pth_vs_onnx, to_onnx.py:110-143, at the same
    default tolerance).  Returns {'close', 'max_diff', 'n', 'rtol', 'atol'}
    and optionally writes it as JSON next to the artifact."""
    import tensorflow as tf

    config = config if isinstance(config, Config) else normalize_config(config)
    f, names = scoring_fn(config, variables)
    args_np = [np.asarray(x, np.float32)
               for x in (triplets, metadata) if x is not None]
    want = np.asarray(f(*map(jnp.asarray, args_np)))

    loaded = tf.saved_model.load(out_dir)
    got = loaded.logits(*[tf.constant(a) for a in args_np]).numpy()

    max_diff = float(np.max(np.abs(got - want))) if want.size else 0.0
    report = {"close": bool(np.allclose(got, want, rtol=rtol, atol=atol)),
              "max_diff": max_diff, "n": int(want.size),
              "rtol": rtol, "atol": atol, "artifact": "tf_saved_model"}
    if report_path:
        with open(report_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return report


def export_and_verify(config, variables, out_dir: str,
                      triplets=None, metadata=None) -> dict:
    """One-command deployment: export + cross-runtime verification report
    (written to ``<out_dir>/verification.json``)."""
    export_saved_model(config, variables, out_dir)
    return verify_saved_model(
        out_dir, config, variables, triplets, metadata,
        report_path=os.path.join(out_dir, "verification.json"))
