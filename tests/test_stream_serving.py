"""End-to-end packet-stream serving: raw gzip+FITS blobs → scores, through
the native decoder + device ingest + model, vs a manual pipeline."""

import gzip
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.data.fits import write_fits_image
from btsbot_tpu.engine.serve import AlertStreamScorer
from btsbot_tpu.ops.preprocess import preprocess_triplets
from test_engine import SMALL_CFG


def _packet(rng, corrupt=False):
    p = {"candidate": {f"m{i}": float(rng.normal()) for i in range(25)}}
    for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
        data = rng.normal(size=(63, 63)).astype(np.float32)
        if corrupt and key == "cutoutScience":
            data[:] = np.nan
        p[key] = {"stampData": gzip.compress(write_fits_image(data))}
    return p


def test_stream_scorer_end_to_end():
    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)

    rng = np.random.default_rng(0)
    packets = [_packet(rng) for _ in range(9)]
    packets.insert(4, _packet(rng, corrupt=True))

    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    scores, drop = scorer(packets)
    assert scores.shape == (10,) and drop.shape == (10,)
    assert drop[4] and np.isnan(scores[4])
    assert not drop[[0, 1, 2, 3, 5, 6, 7, 8, 9]].any()
    assert np.all(np.isfinite(scores[~drop]))

    # cross-check one packet against the manual pipeline
    from btsbot_tpu.data.alerts import triplet_from_packet

    trip = triplet_from_packet(packets[0])[None]
    proc, _ = preprocess_triplets(jnp.asarray(trip))
    meta = np.asarray([[packets[0]["candidate"][f"m{i}"]
                        for i in range(25)]], np.float32)
    logits = model.apply(variables, image_input=proc,
                         metadata_input=jnp.asarray(meta), train=False)
    expected = float(jax.nn.sigmoid(logits.reshape(-1))[0])
    np.testing.assert_allclose(scores[0], expected, rtol=1e-5, atol=1e-6)


def test_bf16_training_config(tmp_path):
    """compute_dtype=bfloat16 trains and converges on the toy problem."""
    from btsbot_tpu.engine.train import run_training
    from test_engine import synthetic_dataset

    config = normalize_config({**SMALL_CFG, "epochs": 3,
                               "compute_dtype": "bfloat16",
                               "learning_rate": 2e-3})
    result = run_training(
        config, run_name="bf16", out_root=str(tmp_path),
        train_ds=synthetic_dataset(256, seed=0),
        val_ds=synthetic_dataset(96, seed=1),
        make_figure=False, log=lambda *_: None)
    assert result["history"]["val_accuracy"][-1] > 0.75


def _mk_packets(n, seed=0):
    rng = np.random.default_rng(seed)
    return [_packet(rng) for _ in range(n)]


def test_score_stream_pipelined_matches_direct():
    """Pipelined stream scoring (decode/compute overlap, bounded in-flight
    window) returns the same scores, in order, as the one-shot path."""
    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    packets = _mk_packets(11)
    want_scores, want_drop = scorer(packets)

    chunks = [packets[i:i + 4] for i in range(0, 11, 4)]
    got = list(scorer.score_stream(iter(chunks), max_in_flight=3))
    got_scores = np.concatenate([s for s, _ in got])
    got_drop = np.concatenate([d for _, d in got])
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
    np.testing.assert_array_equal(got_drop, want_drop)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="exceeds compiled batch_size"):
        list(scorer.score_stream([packets[:5]]))


def test_stream_consumer_daemon_iterable_source():
    """AlertStreamConsumer drains an iterable source through adaptive
    batches and delivers every alert to the sink in order."""
    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    packets = _mk_packets(10, seed=3)
    want_scores, _ = scorer(packets)

    got = []
    consumer = AlertStreamConsumer(
        scorer, iter(packets),
        sink=lambda pkts, scores, drop: got.extend(scores),
        max_batch=4, max_wait_s=0.05)
    stats = consumer.run()
    np.testing.assert_allclose(np.asarray(got), want_scores, rtol=1e-6)
    assert stats["alerts_scored"] == 10
    assert stats["batches"] >= 3
    assert stats["alerts_per_s"] > 0


def test_stream_consumer_queue_backpressure_and_stop():
    """Queue-fed daemon: partial batches flush on max_wait_s, a None
    sentinel shuts the loop down cleanly, stop() joins."""
    import queue
    import time as _time

    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=8,
                               dtype=jnp.float32)
    # warm the compiled program so flush timing isn't compile-bound
    scorer(_mk_packets(2, seed=5))

    q = queue.Queue(maxsize=32)
    got_batches = []
    consumer = AlertStreamConsumer(
        scorer, q, sink=lambda p, s, d: got_batches.append(len(s)),
        max_batch=8, max_wait_s=0.05)
    consumer.start()

    for p in _mk_packets(3, seed=6):
        q.put(p)
    deadline = _time.monotonic() + 10.0
    while not got_batches and _time.monotonic() < deadline:
        _time.sleep(0.01)
    assert got_batches == [3]  # partial batch flushed without the sentinel

    for p in _mk_packets(2, seed=7):
        q.put(p)
    q.put(None)  # sentinel: drain and shut down
    deadline = _time.monotonic() + 10.0
    while consumer.stats["alerts_scored"] < 5 and \
            _time.monotonic() < deadline:
        _time.sleep(0.01)
    stats = consumer.stop()
    assert sum(got_batches) == 5
    assert stats["alerts_scored"] == 5


@pytest.mark.slow
def test_stream_consumer_soak_bursty_producer():
    """Soak the daemon for several seconds against a bursty producer and a
    slow sink: every alert in is scored exactly once, backpressure holds the
    bounded queue, and stop() leaves no live threads."""
    import queue
    import threading
    import time as _time

    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=8,
                               dtype=jnp.float32)

    rng = np.random.default_rng(1)
    packet_pool = [_packet(rng) for _ in range(16)]
    src: queue.Queue = queue.Queue(maxsize=24)
    produced = {"n": 0}

    def producer():
        deadline = _time.monotonic() + 6.0
        while _time.monotonic() < deadline:
            # bursts of 1-20 packets, then a pause (idle-drain path)
            for _ in range(int(rng.integers(1, 21))):
                src.put(packet_pool[int(rng.integers(16))])
                produced["n"] += 1
            _time.sleep(float(rng.uniform(0.0, 0.15)))
        src.put(None)

    seen = {"scored": 0, "batches": 0}
    lock = threading.Lock()

    def sink(packets, scores, drop):
        _time.sleep(0.01)  # slow sink: forces queue backpressure
        assert len(packets) == len(scores) == len(drop)
        assert np.all(np.isfinite(scores[~drop]))
        with lock:
            seen["scored"] += len(scores)
            seen["batches"] += 1

    consumer = AlertStreamConsumer(scorer, src, sink,
                                   max_wait_s=0.05, max_in_flight=2)
    t = threading.Thread(target=producer)
    t.start()
    consumer.start()
    t.join(timeout=30)
    assert not t.is_alive()
    # the None sentinel ends run() on its own; wait for the natural exit
    # (stop() would truncate the drain), then read the final stats
    deadline = _time.monotonic() + 60
    while consumer._thread.is_alive() and _time.monotonic() < deadline:
        _time.sleep(0.05)
    assert not consumer._thread.is_alive(), "consumer failed to drain"
    stats = consumer.stats
    assert produced["n"] > 100, "producer should have sent many bursts"
    assert stats["alerts_in"] == produced["n"]
    assert stats["alerts_scored"] == produced["n"] == seen["scored"]
    assert stats["batches"] == seen["batches"]
    assert src.qsize() == 0
    assert stats["alerts_per_s"] > 0


def test_bucket_ladder_and_partial_batch_parity():
    """Bucketed serving: the padded-batch ladder picks the smallest fitting
    bucket and partial batches score identically to the full-pad path."""
    from btsbot_tpu.engine.serve import (
        AlertScorer,
        _bucket_ladder,
        _pick_bucket,
    )

    assert _bucket_ladder(3072, None, None) == [192, 768, 3072]
    assert _bucket_ladder(256, None, None) == [64, 256]
    assert _bucket_ladder(100, [10, 50, 200], None) == [10, 50, 100]
    assert _pick_bucket([64, 256], 3) == 64
    assert _pick_bucket([64, 256], 65) == 256
    assert _pick_bucket([64, 256], 256) == 256

    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(2)
    trips = rng.normal(size=(10, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(10, 25)).astype(np.float32)

    bucketed = AlertScorer(config, variables, batch_size=64,
                           dtype=jnp.float32)  # ladder [4? no: [64] floor]
    single = AlertScorer(config, variables, batch_size=64,
                         dtype=jnp.float32, bucket_sizes=[64])
    assert bucketed.bucket_sizes == [64]  # floor 64 collapses the ladder

    wide = AlertScorer(config, variables, batch_size=1024,
                       dtype=jnp.float32, bucket_sizes=[16, 64, 1024])
    np.testing.assert_allclose(wide(trips, meta), single(trips, meta),
                               rtol=1e-6, atol=1e-7)


def test_stream_scorer_bucketed_partial_matches_full():
    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(3)
    packets = [_packet(rng) for _ in range(5)]

    full = AlertStreamScorer(config, variables, batch_size=256,
                             dtype=jnp.float32, bucket_sizes=[256])
    bucketed = AlertStreamScorer(config, variables, batch_size=256,
                                 dtype=jnp.float32, bucket_sizes=[8, 256])
    s_full, d_full = full(packets)
    s_b, d_b = bucketed(packets)
    np.testing.assert_allclose(s_b, s_full, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(d_b, d_full)


def test_stream_scorer_metadata_only_model():
    """um_nn (metadata-only) serves straight from packets with no cutout
    blobs at all — the decode stage is skipped."""
    config = normalize_config({**SMALL_CFG, "model_name": "um_nn"})
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(6)
    packets = [{"candidate": {f"m{i}": float(rng.normal())
                              for i in range(25)}} for _ in range(5)]

    scorer = AlertStreamScorer(config, variables, batch_size=8,
                               dtype=jnp.float32)
    scores, drop = scorer(packets)
    assert scores.shape == (5,) and not drop.any()
    assert np.all(np.isfinite(scores))

    meta = np.asarray([[p["candidate"][f"m{i}"] for i in range(25)]
                       for p in packets], np.float32)
    logits = model.apply(variables, image_input=None,
                         metadata_input=jnp.asarray(meta), train=False)
    want = np.asarray(jax.nn.sigmoid(logits.reshape(-1)))
    np.testing.assert_allclose(scores, want, rtol=1e-6, atol=1e-7)


def test_stream_scorer_image_only_model():
    """um_cnn (image-only): packets need no candidate dict; metadata stage
    is skipped."""
    config = normalize_config({**SMALL_CFG, "model_name": "um_cnn",
                               "fc1_neurons": 16, "fc2_neurons": 8,
                               "dropout": 0.1})
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(7)
    packets = [{k: v for k, v in _packet(rng).items() if k != "candidate"}
               for _ in range(4)]

    scorer = AlertStreamScorer(config, variables, batch_size=8,
                               dtype=jnp.float32)
    scores, drop = scorer(packets)
    assert scores.shape == (4,) and not drop.any()
    assert np.all(np.isfinite(scores))


def test_consumer_score_histogram_monitoring():
    """stats carries a 20-bin score histogram summing to scored-minus-
    dropped — the daemon's drift-monitoring signal."""
    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    rng = np.random.default_rng(8)
    packets = [_packet(rng) for _ in range(7)]
    packets.append(_packet(rng, corrupt=True))

    consumer = AlertStreamConsumer(scorer, iter(packets),
                                   sink=lambda *a: None, max_batch=4)
    stats = consumer.run()
    hist = np.asarray(stats["score_hist"])
    assert hist.shape == (20,)
    assert hist.sum() == stats["alerts_scored"] - stats["dropped"] == 7


def test_source_error_surfaces_instead_of_hanging():
    """A source iterator that raises mid-stream must end run() with the
    error (after draining what was scored), not hang the daemon forever."""
    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    packets = _mk_packets(3, seed=10)

    def bad_source():
        yield from packets
        raise RuntimeError("broker exploded")

    got = []
    consumer = AlertStreamConsumer(
        scorer, bad_source(), sink=lambda p, s, d: got.extend(s),
        max_batch=4, max_wait_s=0.02)
    with pytest.raises(RuntimeError, match="source failed"):
        consumer.run()
    assert len(got) == 3  # everything before the failure was still scored
    assert consumer.stats["alerts_scored"] == 3


def test_malformed_packet_drops_alert_not_daemon():
    """Missing or null cutouts mark that alert dropped; the batch and the
    daemon survive."""
    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=8,
                               dtype=jnp.float32)
    rng = np.random.default_rng(11)
    packets = [_packet(rng) for _ in range(4)]
    del packets[1]["cutoutTemplate"]                 # missing key
    packets[2]["cutoutScience"] = None               # null cutout
    packets[3]["cutoutDifference"] = {"stampData": None}  # null blob

    scores, drop = scorer(packets)
    assert list(drop) == [False, True, True, True]
    assert np.isfinite(scores[0]) and np.all(np.isnan(scores[1:]))


def test_warmup_compiles_buckets_and_scores_match():
    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=64,
                               dtype=jnp.float32, bucket_sizes=[8, 64])
    scorer.warmup()
    cold = AlertStreamScorer(config, variables, batch_size=64,
                             dtype=jnp.float32, bucket_sizes=[8, 64])
    packets = _mk_packets(5, seed=12)
    np.testing.assert_allclose(scorer(packets)[0], cold(packets)[0],
                               rtol=1e-6)


def test_malformed_candidate_survives_metadata_gather():
    """A missing/null candidate dict or non-numeric field values must not
    kill the batch (ADVICE r2 medium): those metadata cells read 0.0 and
    the alert is still scored."""
    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=8,
                               dtype=jnp.float32)
    rng = np.random.default_rng(13)
    packets = [_packet(rng) for _ in range(5)]
    del packets[1]["candidate"]                 # missing candidate
    packets[2]["candidate"] = None              # null candidate
    packets[3]["candidate"]["m0"] = "not-a-number"  # non-numeric value
    # non-finite floats (legal in Avro doubles and Python json) must not
    # leak NaN/Inf into the graph as silently un-dropped NaN scores
    packets[4]["candidate"]["m1"] = float("nan")
    packets[4]["candidate"]["m2"] = float("inf")

    scores, drop = scorer(packets)
    assert scores.shape == (5,)
    assert not drop.any()          # cutouts are fine — nothing dropped
    assert np.all(np.isfinite(scores))

    # the malformed cells behave exactly as 0.0
    zeroed = [dict(p) for p in packets]
    zeroed[1]["candidate"] = {}
    zeroed[2]["candidate"] = {}
    zeroed[3] = dict(packets[3],
                     candidate={**packets[3]["candidate"], "m0": 0.0})
    zeroed[4] = dict(packets[4],
                     candidate={**packets[4]["candidate"],
                                "m1": 0.0, "m2": 0.0})
    np.testing.assert_allclose(scores, scorer(zeroed)[0], rtol=1e-6)


def test_background_consumer_reraises_from_stop():
    """start()/stop() must surface a mid-stream source failure instead of
    silently returning stats from the dead daemon thread (ADVICE r2)."""
    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    packets = _mk_packets(3, seed=14)

    def bad_source():
        yield from packets
        raise RuntimeError("broker exploded")

    consumer = AlertStreamConsumer(
        scorer, bad_source(), sink=lambda p, s, d: None,
        max_batch=4, max_wait_s=0.02)
    consumer.start()
    consumer._thread.join(30.0)
    with pytest.raises(RuntimeError, match="background consumer failed"):
        consumer.stop()


def test_failing_sink_does_not_strand_decode_worker():
    """An exception escaping run() (here: the sink raising) must still shut
    the background decode thread down — a supervisor that catches the error
    and restarts the consumer in-process must not accumulate stuck
    'alert-consumer-decode' threads blocked on the raw queue."""
    import threading

    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)

    def bad_sink(p, s, d):
        raise BrokenPipeError("downstream gone")

    consumer = AlertStreamConsumer(
        scorer, iter(_mk_packets(12, seed=15)), sink=bad_sink,
        max_batch=4, max_wait_s=0.02)
    with pytest.raises(BrokenPipeError):
        consumer.run()
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline and any(
            t.name == "alert-consumer-decode" and t.is_alive()
            for t in threading.enumerate()):
        time.sleep(0.05)
    assert not any(t.name == "alert-consumer-decode" and t.is_alive()
                   for t in threading.enumerate())


def test_consumer_latency_percentiles():
    """Daemon stats carry enqueue→score latency percentiles (serving SLO,
    VERDICT r2 #6): batches are stamped at first-packet collection, so the
    p50/p99 include batching wait, decode, transfer, compute, readback."""
    from btsbot_tpu.engine.serve import AlertStreamConsumer

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    packets = _mk_packets(10, seed=15)
    consumer = AlertStreamConsumer(
        scorer, iter(packets), sink=lambda *_: None,
        max_batch=4, max_wait_s=0.02)
    stats = consumer.run()
    assert stats["alerts_scored"] == 10
    assert stats["latency_p50_ms"] > 0
    assert stats["latency_p99_ms"] >= stats["latency_p50_ms"]


def test_alert_scorer_f32_matches_training_graph():
    """AlertScorer(dtype=f32) vs the raw eval graph at the reference's
    deployment tolerance rtol 1e-4 / atol 1e-5 (to_onnx.py:135-137) — the
    direct f32 serving-chain check (VERDICT r2 weak #4; previously covered
    only indirectly via the ONNX path).  Exercises the bucket ladder too:
    21 alerts through batch_size 16 hit a full batch + a padded tail."""
    from btsbot_tpu import build_model
    from btsbot_tpu.engine.serve import AlertScorer

    config = normalize_config(SMALL_CFG)
    model, variables = init_model(config, rng=0)
    rng = np.random.default_rng(21)
    triplets = rng.normal(size=(21, 63, 63, 3)).astype(np.float32)
    meta = rng.normal(size=(21, 25)).astype(np.float32)

    scorer = AlertScorer(config, variables, batch_size=16,
                         dtype=jnp.float32, bucket_sizes=[8, 16])
    got = scorer(triplets=triplets, metadata=meta)

    logits = build_model(config).apply(
        variables, image_input=jnp.asarray(triplets),
        metadata_input=jnp.asarray(meta), train=False)
    want = np.asarray(jax.nn.sigmoid(logits.reshape(-1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # calibrated serving stays a pure temperature reparameterization
    cal = AlertScorer(config, variables, batch_size=16, dtype=jnp.float32,
                      temperature=1.7)
    want_cal = np.asarray(jax.nn.sigmoid(
        logits.reshape(-1).astype(jnp.float32) / 1.7))
    np.testing.assert_allclose(cal(triplets=triplets, metadata=meta),
                               want_cal, rtol=1e-4, atol=1e-5)


def test_abandoned_score_stream_releases_decode_worker():
    """A caller that stops iterating score_stream mid-way must not strand
    the background decode thread on the bounded queue."""
    import threading

    config = normalize_config(SMALL_CFG)
    _, variables = init_model(config, rng=0)
    scorer = AlertStreamScorer(config, variables, batch_size=4,
                               dtype=jnp.float32)
    packets = _mk_packets(16, seed=30)
    chunks = [packets[i:i + 4] for i in range(0, 16, 4)]

    before = threading.active_count()
    gen = scorer.score_stream(iter(chunks), max_in_flight=1)
    next(gen)          # consume one result, then abandon
    gen.close()        # GeneratorExit → abandoned flag set
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
