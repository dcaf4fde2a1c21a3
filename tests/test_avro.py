"""Dependency-free Avro OCF codec (data/avro.py): binary-encoding round
trips over the full ZTF type surface, codec handling, container framing,
and the complete Avro-packet → Kafka source → serving daemon → scores path
with hand-encoded fixtures (VERDICT r2 #3 — the production broker wire
format, previously delegated to the absent fastavro)."""

import gzip
import io
import json
import threading

import numpy as np
import pytest

import jax.numpy as jnp

from btsbot_tpu.data.avro import (
    PROD_METADATA_FIELDS,
    parse_schema,
    read_ocf,
    write_ocf,
    ztf_alert_schema,
)

COMPLEX_SCHEMA = {
    "type": "record", "name": "Everything", "namespace": "test",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "maybe", "type": ["null", "double"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "e", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "Sync",
                                "size": 4}},
        {"name": "nested", "type": {
            "type": "record", "name": "Inner",
            "fields": [{"name": "x", "type": "double"},
                       {"name": "again", "type": ["null", "Inner"]}]}},
        {"name": "inner2", "type": ["null", "Inner"]},  # named-type reuse
    ],
}

RECORD = {
    "s": "héllo ζτφ", "i": -12345, "l": 2**40 + 17, "f": 1.5, "d": -2.25e-7,
    "b": True, "raw": b"\x00\x01\xff", "maybe": None,
    "arr": [0, -1, 2**33, -2**33], "m": {"a": "x", "b": "y"},
    "e": "GREEN", "fx": b"abcd",
    "nested": {"x": 3.14, "again": {"x": -1.0, "again": None}},
    "inner2": {"x": 9.0, "again": None},
}


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_complex_schema(codec):
    data = write_ocf(COMPLEX_SCHEMA, [RECORD], codec=codec)
    schema_json, records = read_ocf(data)
    assert schema_json == COMPLEX_SCHEMA
    assert len(records) == 1
    got = records[0]
    assert got["s"] == RECORD["s"]
    assert got["i"] == RECORD["i"] and got["l"] == RECORD["l"]
    np.testing.assert_allclose(got["f"], RECORD["f"])
    np.testing.assert_allclose(got["d"], RECORD["d"])
    assert got["b"] is True and got["raw"] == RECORD["raw"]
    assert got["maybe"] is None and got["arr"] == RECORD["arr"]
    assert got["m"] == RECORD["m"] and got["e"] == "GREEN"
    assert got["fx"] == b"abcd"
    assert got["nested"] == RECORD["nested"]
    assert got["inner2"] == RECORD["inner2"]


def test_multiblock_and_empty():
    recs = [{**RECORD, "i": i} for i in range(7)]
    data = write_ocf(COMPLEX_SCHEMA, recs, block_records=3)
    _, got = read_ocf(data)
    assert [r["i"] for r in got] == list(range(7))

    _, got = read_ocf(write_ocf(COMPLEX_SCHEMA, []))
    assert got == []


def test_varint_extremes():
    schema = {"type": "record", "name": "L",
              "fields": [{"name": "v", "type": "long"}]}
    values = [0, -1, 1, 63, -64, 64, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    _, got = read_ocf(write_ocf(schema, [{"v": v} for v in values]))
    assert [r["v"] for r in got] == values


def test_int_values_fit_double_unions():
    """ZTF candidate fields are [null, double] unions, but JSON-decoded
    packets carry integer counts (ndethist etc.) — encoding must pick the
    double branch for a Python int instead of raising."""
    schema = {"type": "record", "name": "C", "fields": [
        {"name": "x", "type": ["null", "double"]},
        {"name": "y", "type": ["null", "float"]}]}
    _, got = read_ocf(write_ocf(schema, [{"x": 5, "y": 2}, {"x": None,
                                                           "y": 1.5}]))
    assert got[0]["x"] == 5.0 and got[0]["y"] == 2.0
    assert got[1]["x"] is None and got[1]["y"] == 1.5


def test_fractional_float_rejects_int_union():
    """A fractional float offered to a [null, long] union must raise, not be
    silently truncated by the int encoder; an integral float is a lossless
    demotion and is accepted (ADVICE r3)."""
    schema = {"type": "record", "name": "T", "fields": [
        {"name": "n", "type": ["null", "long"]}]}
    _, got = read_ocf(write_ocf(schema, [{"n": 2.0}]))
    assert got[0]["n"] == 2
    with pytest.raises(ValueError, match="no union branch"):
        write_ocf(schema, [{"n": 2.7}])


def test_iter_ocf_stream_nonseekable_incremental():
    """iter_ocf_stream must work block-by-block on a non-seekable source
    (tarfile.extractfile streams) — and yield before the file is fully
    consumed."""
    from btsbot_tpu.data.avro import iter_ocf_stream

    recs = [{**RECORD, "i": i} for i in range(9)]
    data = write_ocf(COMPLEX_SCHEMA, recs, block_records=2, codec="deflate")

    class NonSeekable:
        def __init__(self, payload):
            self._buf = io.BytesIO(payload)
            self.consumed = 0

        def read(self, n=-1):
            out = self._buf.read(n)
            self.consumed += len(out)
            return out

    src = NonSeekable(data)
    it = iter_ocf_stream(src)
    first = next(it)
    assert first["i"] == 0
    assert src.consumed < len(data)  # later blocks not yet read
    assert [r["i"] for r in it] == list(range(1, 9))


def test_corrupt_container_fails_loudly():
    data = write_ocf(COMPLEX_SCHEMA, [RECORD])
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"XXXX" + data[4:])
    with pytest.raises((EOFError, ValueError)):
        read_ocf(data[:-10])  # truncated mid-block
    # flipped sync marker
    bad = data[:-1] + bytes([data[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bad)
    with pytest.raises(ValueError, match="codec"):
        write_ocf(COMPLEX_SCHEMA, [RECORD], codec="snappy")


def _avro_alert_packet(rng, metadata_fields, objid, candid):
    """Hand-assemble a wire-faithful ZTF alert: gzip-FITS cutouts + candidate
    record (the structure alert_utils.py:110-196 consumes)."""
    from btsbot_tpu.data.fits import write_fits_image

    packet = {
        "objectId": objid, "candid": candid,
        "candidate": {f: float(rng.normal()) for f in metadata_fields},
    }
    for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
        data = rng.normal(size=(63, 63)).astype(np.float32)
        packet[key] = {
            "fileName": f"{objid}_{key}.fits.gz",
            "stampData": gzip.compress(write_fits_image(data)),
        }
    return packet


def test_ztf_schema_roundtrip_with_cutouts():
    rng = np.random.default_rng(3)
    schema = ztf_alert_schema()
    pkt = _avro_alert_packet(rng, PROD_METADATA_FIELDS, "ZTF25aaa", 123)
    data = write_ocf(schema, [pkt], codec="deflate")
    _, (got,) = read_ocf(data)
    assert got["objectId"] == "ZTF25aaa"
    assert set(got["candidate"]) == set(PROD_METADATA_FIELDS)
    for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
        assert got[key]["stampData"] == pkt[key]["stampData"]
    # null cutouts survive the union
    pkt2 = dict(pkt, cutoutTemplate=None, candid=124)
    _, (got2,) = read_ocf(write_ocf(schema, [pkt2]))
    assert got2["cutoutTemplate"] is None


def test_avro_wire_through_serving_daemon():
    """The full production broker path with ZERO optional deps: Avro OCF
    messages → kafka_packet_source (in-repo codec) → AlertStreamConsumer →
    scores, byte-identical to scoring the same packets directly."""
    from btsbot_tpu import init_model, normalize_config
    from btsbot_tpu.data.kafka import kafka_packet_source
    from btsbot_tpu.engine.serve import AlertStreamConsumer, AlertStreamScorer
    from test_engine import SMALL_CFG
    from test_kafka_source import _Msg, _StubConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)

    rng = np.random.default_rng(11)
    meta_fields = list(config["metadata_cols"])
    schema = ztf_alert_schema(meta_fields)
    packets = [_avro_alert_packet(rng, meta_fields, f"ZTF25b{i:02d}", i)
               for i in range(6)]
    wire = [_Msg(write_ocf(schema, [p], codec="deflate")) for p in packets]

    stop = threading.Event()
    source = kafka_packet_source(_StubConsumer(wire, stop), stop_event=stop,
                                 poll_timeout_s=0.01)
    got = []
    consumer = AlertStreamConsumer(
        scorer, source, sink=lambda pkts, scores, drop: got.extend(
            (p["candid"], float(s)) for p, s in zip(pkts, scores)),
        max_batch=4, max_wait_s=0.02)
    stats = consumer.run()
    assert stats["alerts_scored"] == 6 and stats["dropped"] == 0
    assert [c for c, _ in got] == list(range(6))
    want, _ = scorer(packets)
    np.testing.assert_allclose([s for _, s in got], want, rtol=1e-6)


def test_wire_size_and_json_interop():
    """The codec's own bytes are a valid OCF per an independent decode of
    the header structure, and deflate meaningfully compresses the fixture."""
    rng = np.random.default_rng(5)
    schema = ztf_alert_schema(["magpsf", "ra", "dec"])
    pkt = _avro_alert_packet(rng, ["magpsf", "ra", "dec"], "ZTF25c00", 9)
    raw_null = write_ocf(schema, [pkt], codec="null")
    raw_defl = write_ocf(schema, [pkt], codec="deflate")
    assert raw_null[:4] == b"Obj\x01"
    # header metadata is plain Avro: schema JSON must be embedded verbatim
    assert json.dumps(schema).encode() in raw_null
    _, (a,) = read_ocf(raw_null)
    _, (b,) = read_ocf(raw_defl)
    assert a == b

    # deflate actually compresses compressible payloads (the fixture's
    # cutouts are already gzip bytes, so measure on a text-heavy schema)
    txt_schema = {"type": "record", "name": "T",
                  "fields": [{"name": "v", "type": "string"}]}
    recs = [{"v": "transient " * 50}] * 20
    assert len(write_ocf(txt_schema, recs, codec="deflate")) < \
        len(write_ocf(txt_schema, recs, codec="null")) / 5

def test_synthetic_avro_ocf_roundtrip():
    """bench.py's e2e_avro leg encodes synthetic alerts as a real OCF blob
    (deflate, multi-block); the in-repo stream decoder must recover every
    record with scorer-consumable structure."""
    import io

    from btsbot_tpu.data.avro import iter_ocf_stream
    from btsbot_tpu.data.synthetic import synthetic_avro_ocf

    meta = ["magpsf", "ra", "dec"]
    blob = synthetic_avro_ocf(7, meta, block_records=3)
    recs = list(iter_ocf_stream(io.BytesIO(blob)))
    assert len(recs) == 7
    assert [r["candid"] for r in recs] == list(range(7))
    for r in recs:
        assert set(r["candidate"]) == set(meta)
        for k in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
            assert isinstance(r[k]["stampData"], bytes)
            assert r[k]["stampData"][:2] == b"\x1f\x8b"  # gzip magic
