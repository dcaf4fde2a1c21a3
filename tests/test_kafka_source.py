"""Kafka source adapter: stub-consumer iteration, deserialization routing,
error handling, and end-to-end drainage through the serving daemon."""

import json
import threading

import numpy as np
import pytest

import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.data.kafka import deserialize_packet, kafka_packet_source
from test_engine import SMALL_CFG
from test_stream_serving import _packet


class _Msg:
    def __init__(self, value=None, error=None):
        self._value, self._error = value, error

    def error(self):
        return self._error

    def value(self):
        return self._value


class _StubConsumer:
    """poll() feed: items are _Msg, None (idle), or 'END' (stop trigger)."""

    def __init__(self, feed, stop_event):
        self._feed = list(feed)
        self._stop = stop_event

    def poll(self, timeout):
        if not self._feed:
            self._stop.set()
            return None
        item = self._feed.pop(0)
        return item


def test_json_deserialize_and_iteration():
    stop = threading.Event()
    packets = [{"candid": i, "candidate": {"m0": float(i)}} for i in range(3)]
    feed = [_Msg(json.dumps(p).encode()) for p in packets]
    feed.insert(1, None)  # idle poll mid-stream
    src = kafka_packet_source(_StubConsumer(feed, stop), stop_event=stop,
                              poll_timeout_s=0.01)
    assert list(src) == packets


def test_error_handling():
    stop = threading.Event()
    feed = [_Msg(error="boom"), _Msg(json.dumps({"candid": 1}).encode())]
    with pytest.raises(RuntimeError, match="boom"):
        list(kafka_packet_source(_StubConsumer(list(feed), stop),
                                 stop_event=stop, poll_timeout_s=0.01))

    stop2 = threading.Event()
    seen = []
    got = list(kafka_packet_source(_StubConsumer(list(feed), stop2),
                                   stop_event=stop2, poll_timeout_s=0.01,
                                   on_error=seen.append))
    assert seen == ["boom"] and got == [{"candid": 1}]


def test_avro_magic_routing():
    # Avro framing is detected and routed to the in-repo codec; a truncated
    # container fails loudly instead of being mis-parsed as JSON
    with pytest.raises((EOFError, ValueError)):
        deserialize_packet(b"Obj\x01" + b"\x00" * 16)

    # a real single-record OCF decodes without any optional dependency
    from btsbot_tpu.data.avro import write_ocf, ztf_alert_schema

    packet = {"objectId": "ZTF25x", "candid": 7,
              "candidate": {"magpsf": 18.5},
              "cutoutScience": None, "cutoutTemplate": None,
              "cutoutDifference": None}
    raw = write_ocf(ztf_alert_schema(["magpsf"]), [packet])
    got = deserialize_packet(raw)
    assert got["objectId"] == "ZTF25x" and got["candid"] == 7
    assert got["candidate"]["magpsf"] == 18.5


def test_kafka_source_through_serving_daemon():
    """Stub Kafka feed → kafka_packet_source → AlertStreamConsumer → scores:
    the full broker-consumer path without a broker."""
    from btsbot_tpu.engine.serve import AlertStreamConsumer, AlertStreamScorer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)

    rng = np.random.default_rng(9)
    packets = [_packet(rng) for _ in range(6)]
    # serialize like a JSON-over-Kafka broker would (binary blobs hex-packed)
    wire = []
    for i, p in enumerate(packets):
        w = {"candid": i, "candidate": p["candidate"]}
        for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
            w[key] = {"stampData": p[key]["stampData"].hex()}
        wire.append(_Msg(json.dumps(w).encode()))

    def deser(raw):
        p = json.loads(raw)
        for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
            p[key]["stampData"] = bytes.fromhex(p[key]["stampData"])
        return p

    stop = threading.Event()
    source = kafka_packet_source(_StubConsumer(wire, stop), deserialize=deser,
                                 stop_event=stop, poll_timeout_s=0.01)
    got = []
    consumer = AlertStreamConsumer(
        scorer, source, sink=lambda pkts, scores, drop: got.extend(
            (p["candid"], float(s)) for p, s in zip(pkts, scores)),
        max_batch=4, max_wait_s=0.02)
    stats = consumer.run()
    assert stats["alerts_scored"] == 6
    assert [c for c, _ in got] == [0, 1, 2, 3, 4, 5]
    want, _ = scorer(packets)
    np.testing.assert_allclose([s for _, s in got], want, rtol=1e-6)


def test_tombstone_messages_are_skipped():
    stop = threading.Event()
    feed = [_Msg(json.dumps({"candid": 0}).encode()), _Msg(value=None),
            _Msg(json.dumps({"candid": 1}).encode())]
    got = list(kafka_packet_source(_StubConsumer(feed, stop),
                                   stop_event=stop, poll_timeout_s=0.01))
    assert [p["candid"] for p in got] == [0, 1]
