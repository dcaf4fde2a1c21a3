"""Batched alert-stream serving.

Replacement for the reference's deployment path (Keras-predict loop /
ONNX-runtime export — to_onnx.py, inference_example.py:47-95): a single
jit-compiled scoring program (optional on-device ingest + forward + sigmoid)
with padded fixed-size batches so one compiled executable serves any stream
length, bf16 compute by default, and a throughput meter.

Cross-runtime parity verification equivalent to ``verify_pth_vs_onnx``
(to_onnx.py:110-143) is ``verify_serving_parity``: the bf16 serving graph is
checked against the f32 reference graph on example data.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import normalize_config
from ..models.factory import build_model
from ..ops.preprocess import l2_normalize_cutouts


def _bucket_ladder(batch_size: int, bucket_sizes, mesh) -> list[int]:
    """Sorted padded-batch ladder ending at batch_size.  Under a mesh, every
    bucket must split evenly on the "data" axis; non-conforming sizes are
    dropped (batch_size itself is always kept)."""
    if bucket_sizes is None:
        ladder, b = [], batch_size
        while b >= 64 and len(ladder) < 3:
            ladder.append(b)
            b //= 4
    else:
        ladder = [int(b) for b in bucket_sizes]
    ladder = sorted({b for b in ladder if 0 < b <= batch_size} | {batch_size})
    if mesh is not None:
        d = int(mesh.shape.get("data", 1))
        if batch_size % d != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the mesh "
                f"data axis ({d}) — a non-conforming batch would fail at "
                "dispatch with an opaque sharding error")
        ladder = [b for b in ladder if b % d == 0]
    return ladder


def _pick_bucket(ladder: list[int], n: int) -> int:
    for b in ladder:
        if b >= n:
            return b
    return ladder[-1]


def _gather_metadata(packets: list[dict], cols) -> np.ndarray:
    """Per-alert metadata gather that survives malformed broker messages:
    a missing/null ``candidate`` dict, a non-numeric field value, or a
    non-finite float (Avro doubles and Python's json both admit NaN/Inf,
    which would otherwise flow into the graph and surface as un-dropped
    NaN scores) yields 0.0 for that cell — mirroring the per-alert cutout
    handling — instead of raising out of the daemon loop."""
    rows = np.zeros((len(packets), len(cols)), np.float32)
    for i, p in enumerate(packets):
        cand = p.get("candidate")
        if not isinstance(cand, dict):
            continue
        for j, c in enumerate(cols):
            try:
                v = float(cand.get(c, 0.0))
            except (TypeError, ValueError):
                continue  # non-numeric value -> 0.0, same as missing
            if np.isfinite(v):
                rows[i, j] = v
    return rows


class AlertScorer:
    """Fixed-batch scorer: pads the tail, returns scores in input order.

    normalize=True applies the per-cutout L2-norm ingest on device (for raw
    cutout stacks); leave False for pre-normalized training .npy data.
    """

    def __init__(self, config, variables, batch_size: int = 3072,
                 dtype=jnp.bfloat16, normalize: bool = False, mesh=None,
                 bucket_sizes=None, temperature: float = 1.0):
        """batch_size 3072 is the measured single-chip sweet spot on v5e
        (~15% over the 2^n sizes at BTSbot stage shapes — see bench.py).
        mesh: optional jax.sharding.Mesh — batches are split on the "data"
        axis across chips (multi-chip serving; params replicated or
        tensor-sharded per parallel.sharding rules).
        bucket_sizes: padded-batch ladder for partial batches.  Trickle
        traffic (a max_wait flush of 50 alerts) would otherwise pad to the
        full compiled batch and burn batch_size/n× the compute; with a
        ladder the tail pads to the smallest bucket that fits.  Default:
        [batch_size, batch_size/4, batch_size/16] (floor 64).  One XLA
        executable per bucket, compiled lazily on first use.
        temperature: calibration temperature fitted on validation scores
        (metrics/calibration.py, ``cli.val --calibrate``) — applied to the
        logits in-graph so served scores are calibrated probabilities."""
        self.config = normalize_config(config)
        self.batch_size = batch_size
        self.bucket_sizes = _bucket_ladder(batch_size, bucket_sizes, mesh)
        self.temperature = float(temperature)
        self.dtype = dtype
        self.model = build_model(self.config, dtype=dtype)
        self.mesh = mesh
        self._data_shard = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding
            from ..parallel.sharding import shard_variables

            variables = shard_variables(variables, mesh)
            self._data_shard = batch_sharding(mesh)
        self.variables = variables
        need_triplets = self.config.need_triplets
        need_metadata = self.config.need_metadata
        # captured in a local so every lazily-compiled bucket executable
        # bakes in the SAME value; self.temperature is immutable after
        # construction (mutating it would otherwise yield inconsistent
        # scores across batch sizes)
        temperature = self.temperature

        def score(variables, images, metadata):
            if images is not None:
                images = images.astype(dtype)
                if normalize:
                    images = l2_normalize_cutouts(images)
            if metadata is not None:
                metadata = metadata.astype(dtype)
            logits = self.model.apply(
                variables,
                image_input=images if need_triplets else None,
                metadata_input=metadata if need_metadata else None,
                train=False)
            z = logits.reshape(-1).astype(jnp.float32)
            if temperature != 1.0:
                z = z / jnp.float32(temperature)
            return jax.nn.sigmoid(z)

        self._score = jax.jit(score)

    def __call__(self, triplets=None, metadata=None) -> np.ndarray:
        n = len(triplets) if triplets is not None else len(metadata)
        out = np.empty(n, np.float32)
        for start in range(0, n, self.batch_size):
            stop = min(start + self.batch_size, n)
            m = stop - start
            bs = _pick_bucket(self.bucket_sizes, m)
            img = meta = None
            # one host->device transfer: device_put straight from numpy with
            # the target sharding (jnp.asarray first would land on the
            # default device and pay a second reshard hop under a mesh)
            if triplets is not None:
                img = np.zeros((bs,) + triplets.shape[1:], np.float32)
                img[:m] = triplets[start:stop]
                img = jax.device_put(img, self._data_shard) \
                    if self._data_shard is not None else jnp.asarray(img)
            if metadata is not None:
                meta = np.zeros((bs,) + metadata.shape[1:], np.float32)
                meta[:m] = metadata[start:stop]
                meta = jax.device_put(meta, self._data_shard) \
                    if self._data_shard is not None else jnp.asarray(meta)
            out[start:stop] = np.asarray(
                self._score(self.variables, img, meta))[:m]
        return out

    def throughput(self, iters: int = 50) -> float:
        """alerts/sec on synthetic device-resident data (scan-chained, see
        bench.py methodology)."""
        rng = np.random.default_rng(0)
        images = None
        metadata = None
        if self.config.need_triplets:
            s = self.config.get("image_size", 63)
            images = jax.device_put(jnp.asarray(
                rng.normal(size=(self.batch_size, s, s, 3)), self.dtype))
        if self.config.need_metadata:
            ncols = len(self.config["metadata_cols"])
            metadata = jax.device_put(jnp.asarray(
                rng.normal(size=(self.batch_size, ncols)), self.dtype))

        score = self._score
        variables = self.variables

        @jax.jit
        def chained(variables, images, metadata):
            def body(carry, _):
                img = None if images is None else images + carry
                meta = metadata if metadata is None else metadata + carry
                s = score(variables, img, meta)
                return (jnp.mean(s) * 1e-20).astype(
                    self.dtype), jnp.mean(s)
            _, means = jax.lax.scan(
                body, jnp.zeros((), self.dtype), None, length=iters)
            return jnp.mean(means)

        float(chained(variables, images, metadata))  # compile
        t0 = time.perf_counter()
        float(chained(variables, images, metadata))
        dt = time.perf_counter() - t0
        return self.batch_size * iters / dt


class AlertStreamScorer:
    """Raw-packet serving: gzip FITS cutout blobs → score, end to end.

    Chains the native batched stamp decoder (btsbot_tpu.native), the fused
    on-device ingest (NaN-clean + per-cutout L2 norm + corrupt detection —
    full ``make_triplet`` semantics, alert_utils.py:110-196), and the
    batched model forward in ONE jitted program per batch, so a packet
    batch costs exactly one host→device transfer and one device→host
    readback.

    ``score_stream`` pipelines batches: while the device scores batch *i*,
    the host decodes batch *i+1* (the native decoder releases the GIL), so
    end-to-end throughput approaches max(host decode, device compute)
    instead of their sum.  ``AlertStreamConsumer`` wraps this into a
    long-running broker daemon with adaptive batching and backpressure.
    """

    def __init__(self, config, variables, batch_size: int = 3072,
                 dtype=jnp.bfloat16, num_threads: int = 0,
                 transfer_dtype=None, bucket_sizes=None,
                 temperature: float = 1.0):
        """transfer_dtype: optional narrower dtype (e.g. jnp.bfloat16) for
        the host→device pixel transfer — halves ingest bytes on the PCIe/DCN
        link at ~0.4% pixel quantization (scores already run bf16); ingest
        math still runs f32 on device.  None (default) ships f32 pixels.
        bucket_sizes: padded-batch ladder (see AlertScorer) — partial
        flushes from the daemon's max_wait path pad to the smallest fitting
        bucket instead of the full compiled batch.
        temperature: calibration temperature (see AlertScorer)."""
        from ..ops.preprocess import preprocess_triplets

        self.config = normalize_config(config)
        self.batch_size = batch_size
        self.bucket_sizes = _bucket_ladder(batch_size, bucket_sizes, None)
        self.temperature = float(temperature)
        self.dtype = dtype
        self.num_threads = num_threads
        self.transfer_dtype = transfer_dtype
        self.variables = variables
        self.model = build_model(self.config, dtype=dtype)
        need_meta = self.config.need_metadata

        need_triplets = self.config.need_triplets
        # local capture: keeps all bucket executables consistent (see
        # AlertScorer) — self.temperature is immutable after construction
        temperature = self.temperature

        def fwd(variables, raw_triplets, metadata):
            imgs = corrupt = None
            if need_triplets:
                imgs, corrupt = preprocess_triplets(
                    raw_triplets.astype(jnp.float32))
                imgs = imgs.astype(dtype)
            logits = self.model.apply(
                variables,
                image_input=imgs,
                metadata_input=(metadata.astype(dtype) if need_meta
                                else None),
                train=False)
            z = logits.reshape(-1).astype(jnp.float32)
            if temperature != 1.0:
                z = z / jnp.float32(temperature)
            scores = jax.nn.sigmoid(z)
            if corrupt is None:  # metadata-only model: nothing to corrupt
                corrupt = jnp.zeros(scores.shape, bool)
            # ONE packed (2, B) output → one device→host readback per
            # batch instead of two; through a remote relay each readback
            # is a full round trip, and at trickle batch sizes the extra
            # RTT was a measurable e2e tax
            return jnp.stack([scores, corrupt.astype(jnp.float32)])

        self._fwd = jax.jit(fwd)

    # ------------------------- pipeline stages -------------------------

    def _prepare(self, packets: list[dict]):
        """Host stage: decode blobs (native, multithreaded) + gather
        metadata columns.  Returns (raw_triplets, metadata, decode_bad).
        Metadata-only models skip the decode entirely (packets need no
        cutouts)."""
        n = len(packets)
        if not self.config.need_triplets:
            metadata = None
            if self.config.need_metadata:
                metadata = _gather_metadata(
                    packets, self.config["metadata_cols"])
            return None, metadata, np.zeros(n, bool)
        from ..native import decode_stamps

        blobs: list[bytes] = []
        for p in packets:
            for key in ("cutoutScience", "cutoutTemplate",
                        "cutoutDifference"):
                # a missing/null cutout must drop THAT alert, not kill the
                # daemon: an empty blob makes the decoder flag it bad
                cutout = p.get(key) or {}
                blob = cutout.get("stampData") if isinstance(cutout, dict) \
                    else None
                blobs.append(blob if isinstance(blob, (bytes, bytearray))
                             else b"")
        stamps, status = decode_stamps(blobs, num_threads=self.num_threads)
        triplets = np.ascontiguousarray(
            stamps.reshape(n, 3, 63, 63).transpose(0, 2, 3, 1))
        decode_bad = status.reshape(n, 3).any(axis=1)
        metadata = None
        if self.config.need_metadata:
            metadata = _gather_metadata(packets, self.config["metadata_cols"])
        return triplets, metadata, decode_bad

    def _dispatch(self, triplets, metadata, n: int):
        """Device stage: pad to the smallest fitting bucket and launch the
        fused ingest+forward asynchronously.  Returns device arrays
        (futures)."""
        bs = _pick_bucket(self.bucket_sizes, n)
        img = None
        if triplets is not None:
            wire = np.dtype(self.transfer_dtype) if self.transfer_dtype \
                else np.float32
            if n == bs:  # full batch: one cast/no-op, no pad copy
                img = np.ascontiguousarray(triplets[:n], dtype=wire)
            else:
                img = np.zeros((bs, 63, 63, 3), wire)
                img[:n] = triplets[:n]
            img = jnp.asarray(img)
        meta = None
        if metadata is not None:
            if n == bs:
                meta = np.ascontiguousarray(metadata[:n], dtype=np.float32)
            else:
                meta = np.zeros((bs,) + metadata.shape[1:], np.float32)
                meta[:n] = metadata[:n]
            meta = jnp.asarray(meta)
        return self._fwd(self.variables, img, meta)

    @staticmethod
    def _finish(packed_dev, decode_bad, n: int):
        packed = np.asarray(packed_dev)  # single d2h readback (2, bucket)
        scores = packed[0, :n]
        drop = (packed[1, :n] > 0.5) | decode_bad[:n]
        return np.where(drop, np.nan, scores), drop

    # ------------------------------ APIs ------------------------------

    def warmup(self) -> None:
        """Compile every bucket's executable up front.

        Without this, the FIRST partial flush at each new bucket size hits
        an XLA compile mid-stream (seconds locally, minutes through a
        remote relay) while alerts queue behind it.  Pair with
        utils/compile_cache so subsequent process restarts skip even the
        warmup compiles.  cli.serve runs this before consuming.
        """
        wire = np.dtype(self.transfer_dtype) if self.transfer_dtype \
            else np.float32
        for bs in self.bucket_sizes:
            img = None
            if self.config.need_triplets:
                img = jnp.asarray(np.zeros((bs, 63, 63, 3), wire))
            meta = None
            if self.config.need_metadata:
                ncols = len(self.config["metadata_cols"])
                meta = jnp.asarray(np.zeros((bs, ncols), np.float32))
            jax.block_until_ready(self._fwd(self.variables, img, meta))

    def __call__(self, packets: list[dict]) -> tuple[np.ndarray, np.ndarray]:
        """packets: alert dicts with cutout{Science,Template,Difference}
        stampData blobs and (for multi-modal models) a ``candidate`` dict
        carrying the configured metadata columns.

        Returns (scores (N,), drop_mask (N,)) — scores are NaN where the
        alert was dropped as corrupt/undecodable.
        """
        bs = self.batch_size
        chunks = [packets[i:i + bs] for i in range(0, len(packets), bs)]
        out_scores, out_drop = [], []
        for scores, drop in self.score_stream(chunks):
            out_scores.append(scores)
            out_drop.append(drop)
        if not out_scores:
            return np.empty(0, np.float32), np.empty(0, bool)
        return np.concatenate(out_scores), np.concatenate(out_drop)

    def score_stream(self, packet_batches, max_in_flight: int = 2):
        """Pipelined scoring over an iterable of packet lists (each ≤
        batch_size).  Yields (scores, drop) per input batch, in order.

        Three overlapped stages: a background thread runs the host decode
        (``_prepare`` — the native decoder releases the GIL, so it runs
        concurrently with everything below), the generator thread pads +
        transfers + launches the device program (``_dispatch``), and up to
        ``max_in_flight`` batches stay dispatched on the device while the
        readback of the oldest completes.  The bounded prepared-queue plus
        the in-flight window apply backpressure to the producer: the input
        iterable is only advanced as fast as results drain.

        Round-2 shape (decode inline with dispatch in one loop) recovered
        only ~45% of the host-side bound because decode, transfer, and
        readback all serialized on the generator thread; with the decode
        thread the end-to-end rate approaches min(decode, link, compute)
        instead of their sum (measured in bench.py's pipeline_efficiency).
        """
        import queue as _queue
        import threading
        from collections import deque

        prepared: _queue.Queue = _queue.Queue(maxsize=max(1, max_in_flight))
        decode_error: list[BaseException] = []
        abandoned = threading.Event()

        def put_or_abandon(item) -> bool:
            # bounded-wait put so an abandoned generator (caller stops
            # iterating; GeneratorExit) cannot strand this thread on a
            # full queue forever — long-running daemons would otherwise
            # accumulate blocked decode threads
            while not abandoned.is_set():
                try:
                    prepared.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def decode_worker():
            try:
                for packets in packet_batches:
                    if len(packets) > self.batch_size:
                        raise ValueError(
                            f"stream batch of {len(packets)} exceeds "
                            f"compiled batch_size {self.batch_size}")
                    if not put_or_abandon((packets, self._prepare(packets))):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                decode_error.append(e)
            finally:
                put_or_abandon(None)

        worker = threading.Thread(target=decode_worker, daemon=True)
        worker.start()

        inflight: deque = deque()
        try:
            while True:
                item = prepared.get()
                if item is None:
                    break
                packets, (triplets, metadata, decode_bad) = item
                handles = self._dispatch(triplets, metadata, len(packets))
                inflight.append((handles, decode_bad, len(packets)))
                if len(inflight) >= max_in_flight:
                    packed, bad, n = inflight.popleft()
                    yield self._finish(packed, bad, n)
            while inflight:
                packed, bad, n = inflight.popleft()
                yield self._finish(packed, bad, n)
            worker.join()
            if decode_error:
                raise decode_error[0]
        finally:
            abandoned.set()


class AlertStreamConsumer:
    """Long-running broker consumer daemon over an AlertStreamScorer.

    The production-serving story the reference delegates to Kowalski/Fritz
    (README.md:34-43: brokers run the exported model): a consumer loop that
    pulls alert packets from a source, batches them adaptively (flush at
    ``max_batch`` or after ``max_wait_s`` of the oldest pending packet),
    scores through the pipelined stream scorer, and hands results to a sink.

    * source: an iterable of packets, or a ``queue.Queue`` fed by the broker
      (``None`` in the queue signals shutdown after draining).
    * sink: callable ``sink(packets, scores, drop)`` per scored batch.
    * backpressure: at most ``max_in_flight`` device batches plus one
      pending host batch are held; a bounded queue source blocks the broker
      when scoring falls behind.
    """

    def __init__(self, scorer: AlertStreamScorer, source, sink,
                 max_batch: int | None = None, max_wait_s: float = 0.1,
                 max_in_flight: int = 2, stats_interval_s: float = 0.0,
                 stats_log=None):
        """stats_interval_s > 0 emits a JSON stats line to ``stats_log``
        (default: print) at most every interval while consuming — the
        monitoring hook for long-running daemons."""
        import queue as _queue
        import threading

        self.scorer = scorer
        self.sink = sink
        self.max_batch = min(max_batch or scorer.batch_size,
                             scorer.batch_size)
        self.max_wait_s = max_wait_s
        self.max_in_flight = max_in_flight
        self.stats_interval_s = stats_interval_s
        self.stats_log = stats_log or print
        self._last_stats_emit = 0.0
        self.stats = {"alerts_in": 0, "alerts_scored": 0, "dropped": 0,
                      "batches": 0, "wall_s": 0.0, "alerts_per_s": 0.0}
        # enqueue→score latency percentiles (serving SLO): each batch is
        # stamped when its FIRST packet is collected, so the recorded value
        # is the batch's worst-case alert latency (includes the max_wait_s
        # batching delay, decode, transfer, compute, and readback)
        from collections import deque as _deque
        self._latencies = _deque(maxlen=8192)
        # 20-bin score histogram (edges 0.0,0.05,…,1.0): the cheap drift
        # signal — a shifting score distribution is the first sign of
        # upstream data drift or a miscalibrated model (see
        # metrics/calibration.py); surfaced through stats/stats_log
        self._score_hist = np.zeros(20, np.int64)
        self._source_error: BaseException | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

        if isinstance(source, _queue.Queue):
            self._queue = source
        else:
            # wrap an iterable in a bounded feeder queue (backpressure);
            # puts poll the stop flag so stop() can never strand the feeder
            # thread on a full queue
            self._queue = _queue.Queue(maxsize=4 * self.max_batch)

            def put_or_stop(item) -> bool:
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.2)
                        return True
                    except _queue.Full:
                        continue
                return False

            def feed(it):
                # a source that raises (Kafka error, malformed JSONL line)
                # must still deliver the shutdown sentinel, or run() would
                # poll the empty queue forever; the error is re-raised in
                # run() so the caller sees it, not a background traceback
                try:
                    for p in it:
                        if not put_or_stop(p):
                            return
                except BaseException as e:  # noqa: BLE001
                    self._source_error = e
                finally:
                    put_or_stop(None)

            self._feeder = threading.Thread(target=feed, args=(source,),
                                            daemon=True)
            self._feeder.start()

    def _collect_batch(self, idle_poll_s: float = 0.05):
        """Adaptive batching step: (packets, first_arrival_monotonic) with
        up to max_batch packets (partial batches flush max_wait_s after
        their first packet), ``([], None)`` when the source is idle (so the
        caller can drain in-flight results), or ``None`` on shutdown."""
        import queue as _queue

        if self._done:
            return None
        batch: list = []
        first_ts = None
        deadline = None
        while len(batch) < self.max_batch:
            if self._stop.is_set():
                return (batch, first_ts) if batch else None
            timeout = idle_poll_s if deadline is None \
                else max(0.0, deadline - time.monotonic())
            try:
                item = self._queue.get(timeout=timeout)
            except _queue.Empty:
                if batch:
                    break  # flush partial batch on max_wait_s timeout
                return [], None  # idle — let the caller drain the pipeline
            if item is None:
                self._done = True
                break
            batch.append(item)
            if deadline is None:
                first_ts = time.monotonic()
                deadline = first_ts + self.max_wait_s
        if self._done and not batch:
            return None
        return batch, first_ts

    def _latency_stats(self) -> None:
        if self._latencies:
            p50, p99 = np.percentile(np.asarray(self._latencies), [50, 99])
            self.stats["latency_p50_ms"] = round(float(p50) * 1000, 2)
            self.stats["latency_p99_ms"] = round(float(p99) * 1000, 2)

    def run(self) -> dict:
        """Consume until the source is exhausted (or stop()); returns stats.

        Pipeline mirrors ``score_stream``: a background thread decodes
        collected batches (the native decoder releases the GIL), this
        thread pads/transfers/launches and drains results, and up to
        ``max_in_flight`` batches stay computing on the device.  When the
        source goes idle, in-flight results drain immediately instead of
        waiting for more input.  Backpressure: at most one decoded +
        ``max_in_flight`` prepared/pending batches are held; a bounded
        queue source blocks the broker when scoring falls behind.

        Deliberately NOT implemented on top of ``score_stream``: that
        generator holds results until the in-flight window fills (right
        for fixed throughput runs), while this loop must drain the moment
        the source goes idle or trickle traffic would pay a full
        max_in_flight·max_wait_s latency penalty — the p50/p99 SLO in
        stats depends on the idle-drain.  Any fix to one pipeline's
        shutdown/backpressure logic should be checked against the other.
        """
        import queue as _queue
        import threading
        from collections import deque

        t0 = time.perf_counter()
        self._done = False
        inflight: deque = deque()

        raw_q: _queue.Queue = _queue.Queue(maxsize=1)
        ready_q: _queue.Queue = _queue.Queue(
            maxsize=max(1, self.max_in_flight))
        decode_error: list[BaseException] = []

        def decode_worker():
            try:
                while True:
                    item = raw_q.get()
                    if item is None:
                        break
                    batch, ts = item
                    ready_q.put((batch, ts, self.scorer._prepare(batch)))
            except BaseException as e:  # noqa: BLE001 — re-raised below
                decode_error.append(e)
            finally:
                ready_q.put(None)

        worker = threading.Thread(target=decode_worker, daemon=True,
                                  name="alert-consumer-decode")
        worker.start()

        def finish_oldest():
            packets, ts, handles, decode_bad = inflight.popleft()
            scores, drop = self.scorer._finish(
                handles, decode_bad, len(packets))
            self.stats["alerts_scored"] += len(scores)
            self.stats["dropped"] += int(drop.sum())
            self.stats["batches"] += 1
            if ts is not None:
                self._latencies.append(time.monotonic() - ts)
            kept = scores[~drop]
            if kept.size:
                self._score_hist += np.bincount(
                    np.clip((kept * 20).astype(np.int64), 0, 19),
                    minlength=20)
                self.stats["score_hist"] = self._score_hist.tolist()
            self.sink(packets, scores, drop)
            if self.stats_interval_s > 0:
                now = time.monotonic()
                if now - self._last_stats_emit >= self.stats_interval_s:
                    self._last_stats_emit = now
                    wall = time.perf_counter() - t0
                    self._latency_stats()
                    self.stats_log(json.dumps({
                        **self.stats, "wall_s": round(wall, 3),
                        "alerts_per_s": round(
                            self.stats["alerts_scored"] / max(wall, 1e-9),
                            1)}))

        def drain_ready(block: bool) -> bool:
            """Dispatch prepared batches; False once the decoder signalled
            end of stream."""
            while True:
                try:
                    item = ready_q.get(block=block,
                                       timeout=None if not block else 10.0)
                except _queue.Empty:
                    return True
                if item is None:
                    return False
                batch, ts, prep = item
                handles = self.scorer._dispatch(prep[0], prep[1], len(batch))
                inflight.append((batch, ts, handles, prep[2]))
                if len(inflight) >= self.max_in_flight:
                    finish_oldest()
                if not block:
                    continue
                block = False  # blocking drain only waits for the first item

        decoding = True
        try:
            while True:
                collected = self._collect_batch()
                if collected is None:
                    break
                batch, ts = collected
                if batch:
                    self.stats["alerts_in"] += len(batch)
                    while decoding:
                        # never block on the decoder with results undrained —
                        # alternating put/drain avoids the full-queues
                        # deadlock
                        decoding = drain_ready(block=False)
                        try:
                            raw_q.put((batch, ts), timeout=0.05)
                            break
                        except _queue.Full:
                            continue
                else:
                    decoding = drain_ready(block=False) and decoding
                    if inflight:
                        finish_oldest()
                if not decoding:
                    break  # decoder died mid-stream — error surfaced below

            # deliver the decoder's shutdown sentinel; the decoder may still
            # be busy with the final batch (raw_q full), so keep draining
            # results while waiting — put_nowait here would strand the worker
            # on raw_q.get() forever and spin the final drain
            while decoding:
                try:
                    raw_q.put(None, timeout=0.05)
                    break
                except _queue.Full:
                    decoding = drain_ready(block=False) and decoding
            while decoding:
                decoding = drain_ready(block=True)
            while inflight:
                finish_oldest()
            worker.join()
        finally:
            # an exception above (sink/_dispatch raising) must not strand the
            # decode worker on raw_q.get() or ready_q.put() forever: keep
            # offering the shutdown sentinel while draining its output until
            # it exits (same alternation as the normal path; harmlessly
            # no-ops when the worker already joined)
            while worker.is_alive():
                try:
                    raw_q.put_nowait(None)
                except _queue.Full:
                    pass
                try:
                    ready_q.get(timeout=0.05)
                except _queue.Empty:
                    pass
            worker.join()

        self.stats["wall_s"] = time.perf_counter() - t0
        if self.stats["wall_s"] > 0:
            self.stats["alerts_per_s"] = \
                self.stats["alerts_scored"] / self.stats["wall_s"]
        self._latency_stats()
        if decode_error:
            raise decode_error[0]
        if self._source_error is not None:
            raise RuntimeError(
                "alert source failed mid-stream (scored "
                f"{self.stats['alerts_scored']} before the failure)"
            ) from self._source_error
        return self.stats

    def start(self) -> None:
        """Run the consumer loop in a background daemon thread.

        Any exception run() raises (e.g. a mid-stream source failure) is
        captured and re-raised from stop() — a background consumer must not
        lose the error to the daemon thread."""
        import threading

        self._run_error: BaseException | None = None

        def target():
            try:
                self.run()
            except BaseException as e:  # noqa: BLE001 — re-raised in stop()
                self._run_error = e

        self._thread = threading.Thread(target=target, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 10.0) -> dict:
        """Signal shutdown, drain in-flight work, join, and return stats.

        Re-raises any exception the background run() loop died with."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                # returning stats now would claim a completed shutdown and
                # silently lose any exception run() raises later (e.g. the
                # loop is stuck in a minutes-long first-bucket XLA compile
                # through the remote relay — raise so the caller knows)
                raise TimeoutError(
                    f"consumer did not drain within {timeout}s "
                    f"(stats so far: {json.dumps(self.stats)}); call "
                    "stop() again with a longer timeout")
        err = getattr(self, "_run_error", None)
        if err is not None:
            raise RuntimeError(
                "background consumer failed (stats: "
                f"{json.dumps(self.stats)})") from err
        return self.stats


def verify_serving_parity(config, variables, triplets=None, metadata=None,
                          rtol: float = 1e-2, atol: float = 5e-3) -> dict:
    """Compare the bf16 serving graph against the f32 reference graph
    (the JAX analog of to_onnx.verify_pth_vs_onnx, to_onnx.py:110-143).
    Returns {'close': bool, 'max_diff': float}."""
    serving = AlertScorer(config, variables, batch_size=max(
        1, len(triplets) if triplets is not None else len(metadata)))
    reference = AlertScorer(config, variables, batch_size=serving.batch_size,
                            dtype=jnp.float32)
    s_bf16 = serving(triplets, metadata)
    s_f32 = reference(triplets, metadata)
    max_diff = float(np.max(np.abs(s_bf16 - s_f32))) if len(s_f32) else 0.0
    return {"close": bool(np.allclose(s_bf16, s_f32, rtol=rtol, atol=atol)),
            "max_diff": max_diff}
