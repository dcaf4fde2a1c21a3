"""Serving CLI: ``python -m btsbot_tpu.cli.serve <model_dir> [opts]``.

Runs the broker-consumer daemon (engine/serve.py::AlertStreamConsumer) as a
process.  No reference counterpart — the reference hands an ONNX file to
brokers (README.md:34-43); here the TPU graph is the production scorer.

Wire format (``--jsonl``): one alert packet per line as JSON with the
Kafka/avro field layout the scorer consumes —
``{"candid": ..., "candidate": {<metadata cols>},
"cutoutScience|Template|Difference": {"stampData": "<base64 gzip FITS>"}}``.
Results stream to ``--out`` (or stdout) as
``{"candid": ..., "score": float|null, "dropped": bool}`` per alert;
``score`` is null where the alert was dropped as corrupt/undecodable.

``--synthetic N`` serves generated packets instead (smoke/throughput runs);
``--avro FILE`` replays a ZTF Avro OCF archive (streamed block-by-block
with the dependency-free in-repo codec, data/avro.py).
"""

from __future__ import annotations

import argparse
import base64
import json
import sys


def _iter_jsonl_packets(path: str):
    """Yield packets from a JSONL file, decoding base64 stampData blobs."""
    stream = sys.stdin if path == "-" else open(path)  # noqa: SIM115
    with stream:
        for line in stream:
            line = line.strip()
            if not line:
                continue
            p = json.loads(line)
            for key in ("cutoutScience", "cutoutTemplate",
                        "cutoutDifference"):
                cutout = p.get(key)
                blob = cutout.get("stampData") \
                    if isinstance(cutout, dict) else None
                if isinstance(blob, str):
                    p[key]["stampData"] = base64.b64decode(blob)
            yield p


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Serve alert packets through the TPU scoring daemon")
    p.add_argument("model_dir",
                   help="Model dir (report.json/train_config.json + "
                        "checkpoint or pytorch_model.bin)")
    p.add_argument("--jsonl", default=None, metavar="FILE",
                   help="JSONL packet source ('-' for stdin); see module "
                        "docstring for the wire format")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="Serve N synthetic packets instead of --jsonl")
    p.add_argument("--avro", default=None, metavar="FILE",
                   help="Serve alerts from a ZTF Avro OCF file (archival "
                        "replay; streamed block-by-block with the in-repo "
                        "codec — data/avro.py)")
    p.add_argument("--out", default=None,
                   help="JSONL results file (default stdout)")
    p.add_argument("--batch", type=int, default=3072)
    p.add_argument("--max-wait-ms", type=float, default=100.0)
    p.add_argument("--bf16-transfer", action="store_true",
                   help="Ship pixels host->device as bfloat16 (halves "
                        "ingest bytes)")
    p.add_argument("--temperature", default="1.0",
                   help="Calibration temperature fitted via "
                        "cli.val --calibrate; served scores become "
                        "calibrated probabilities. 'auto' reads "
                        "calibration.temperature from the model dir's "
                        "perf.json (falls back to 1.0 with a notice)")
    p.add_argument("--retarget-resolution", type=int, default=None,
                   metavar="RES",
                   help="MaxViT only: serve the trained model at this "
                        "native resolution instead of the one it was "
                        "trained at (rel-pos bias tables resampled; e.g. "
                        "224->160 serves ~1.58x faster). Re-validate "
                        "quality at the new resolution first "
                        "(scripts/maxvit_retarget_study.py)")
    p.add_argument("--compile-cache", default=None, metavar="DIR")
    p.add_argument("--stats-interval", type=float, default=0.0,
                   metavar="SECONDS",
                   help="Emit a JSON stats line to stderr at this interval")
    p.add_argument("--no-warmup", action="store_true",
                   help="Skip precompiling the bucket executables (first "
                        "flush at each bucket size will stall on compile)")
    args = p.parse_args(argv)
    n_sources = sum(x is not None
                    for x in (args.jsonl, args.synthetic, args.avro))
    if n_sources != 1:
        p.error("exactly one of --jsonl / --synthetic / --avro is required")

    if args.compile_cache:
        from ..utils.compile_cache import enable
        enable(args.compile_cache)

    import jax.numpy as jnp

    from ..engine.distill import load_teacher
    from ..engine.serve import AlertStreamConsumer, AlertStreamScorer

    model, variables, config = load_teacher(args.model_dir)
    if args.retarget_resolution is not None:
        from ..core.config import normalize_config
        from ..interop.maxvit_convert import (retarget_maxvit_variables,
                                              retarget_model_kind)
        kind = retarget_model_kind(config.get("model_kind", ""),
                                   args.retarget_resolution)
        variables = retarget_maxvit_variables(variables, kind)
        config = normalize_config({**config, "model_kind": kind})
        print(f"retargeted to {kind}", file=sys.stderr)
    if args.temperature == "auto":
        import os
        temperature = 1.0
        perf_path = os.path.join(args.model_dir, "perf.json")
        try:
            with open(perf_path) as f:
                temperature = float(
                    json.load(f)["calibration"]["temperature"])
            print(f"calibration temperature {temperature} from {perf_path}",
                  file=sys.stderr)
        except (OSError, KeyError, ValueError, TypeError):
            print(f"no calibration in {perf_path}; serving uncalibrated "
                  "(run cli.val --calibrate first)", file=sys.stderr)
    else:
        temperature = float(args.temperature)
    scorer = AlertStreamScorer(
        config, variables, batch_size=args.batch,
        transfer_dtype=jnp.bfloat16 if args.bf16_transfer else None,
        temperature=temperature)
    if not args.no_warmup:
        print(f"compiling {len(scorer.bucket_sizes)} bucket executables "
              f"{scorer.bucket_sizes}...", file=sys.stderr)
        scorer.warmup()

    avro_fh = None
    if args.synthetic is not None:
        from ..data.synthetic import synthetic_packets
        source = synthetic_packets(args.synthetic, config["metadata_cols"])
    elif args.avro is not None:
        from ..data.avro import iter_ocf_stream
        avro_fh = open(args.avro, "rb")  # noqa: SIM115 — closed in finally
        source = iter_ocf_stream(avro_fh)
    else:
        source = _iter_jsonl_packets(args.jsonl)

    out = sys.stdout if args.out is None else open(args.out, "w")  # noqa: SIM115

    def sink(packets, scores, drop):
        for pkt, s, d in zip(packets, scores, drop):
            out.write(json.dumps({
                "candid": pkt.get("candid"),
                "score": None if d else round(float(s), 6),
                "dropped": bool(d)}) + "\n")
        out.flush()

    consumer = AlertStreamConsumer(
        scorer, source, sink, max_wait_s=args.max_wait_ms / 1e3,
        stats_interval_s=args.stats_interval,
        stats_log=lambda line: print(line, file=sys.stderr))

    # daemon lifecycle: SIGTERM/SIGINT drain in-flight work and exit cleanly
    import signal

    def _shutdown(signum, frame):
        del frame
        print(json.dumps({"signal": signum, "action": "stopping"}),
              file=sys.stderr)
        consumer._stop.set()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _shutdown)
        except ValueError:  # non-main thread (e.g. under a test harness)
            pass

    try:
        stats = consumer.run()
    finally:
        if avro_fh is not None:
            avro_fh.close()
        if out is not sys.stdout:
            out.close()
    print(json.dumps(stats), file=sys.stderr)


if __name__ == "__main__":
    main()
