"""Broker-consumer serving daemon example.

The production deployment story: a long-running loop that consumes ZTF
alert packets from a broker feed, scores them in adaptively-sized batches
on the TPU (host decode pipelined with device compute), and emits
(candid, score) results with backpressure when the feed outruns the chip.

The reference delegates this to Kowalski/Fritz running its exported ONNX
model (reference README.md:34-43); here the same loop is first-class:

    python examples/serving_daemon.py --model-dir models/..../run \
        [--batch 3072] [--max-wait-ms 100]

For the demo, --synthetic N streams N synthetic gzip+FITS packets through
the real decode path instead of connecting to a broker.  To consume from a
real feed, replace `packet_source()` with your Kafka/ZMQ iterator — any
iterable of alert dicts (or feed a bounded queue.Queue and pass that).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from btsbot_tpu.data.synthetic import synthetic_packets  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", default=None,
                   help="Trained model dir (report.json + best/); omit for "
                        "the shipped example model")
    p.add_argument("--batch", type=int, default=3072)
    p.add_argument("--max-wait-ms", type=float, default=100.0)
    p.add_argument("--synthetic", type=int, default=10_000,
                   help="Stream N synthetic packets instead of a broker")
    p.add_argument("--out", default=None, help="JSONL results file (default "
                                               "stdout summary only)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="Persistent XLA compile cache dir: restarts skip "
                        "the serving-graph compile (utils/compile_cache.py)")
    args = p.parse_args()

    if args.compile_cache:
        from btsbot_tpu.utils.compile_cache import enable
        enable(args.compile_cache)

    from btsbot_tpu import AlertStreamConsumer, AlertStreamScorer, \
        init_model, normalize_config

    if args.model_dir:
        from btsbot_tpu.engine.checkpoint import load_model_variables
        from btsbot_tpu.metrics.report import load_report_config
        from btsbot_tpu.models.factory import init_model as _init

        config = normalize_config(load_report_config(args.model_dir))
        _, template = _init(config, rng=0)
        variables = load_model_variables(
            os.path.join(args.model_dir, "best"),
            template={"params": template["params"],
                      "batch_stats": template.get("batch_stats", {})})
    else:
        import flax.serialization

        example_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "btsbot_tpu", "example_data")
        with open(os.path.join(example_dir, "train_config.json")) as f:
            config = normalize_config(json.load(f))
        _, template = init_model(config, rng=0)
        with open(os.path.join(example_dir, "params.msgpack"), "rb") as f:
            variables = flax.serialization.from_bytes(template, f.read())

    scorer = AlertStreamScorer(config, variables, batch_size=args.batch)

    out_fh = open(args.out, "w") if args.out else None

    def sink(packets, scores, drop):
        if out_fh is not None:
            for pkt, s, d in zip(packets, scores, drop):
                out_fh.write(json.dumps(
                    {"candid": pkt.get("candid"),
                     "score": None if d else float(s)}) + "\n")

    source = synthetic_packets(args.synthetic, config["metadata_cols"])
    consumer = AlertStreamConsumer(
        scorer, source, sink, max_batch=args.batch,
        max_wait_s=args.max_wait_ms / 1e3)
    t0 = time.time()
    stats = consumer.run()
    if out_fh:
        out_fh.close()
    print(json.dumps({**stats, "total_wall_s": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
