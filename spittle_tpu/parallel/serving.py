"""Batching transcription server: many sessions, one device program.

This is the TPU-native "distributed backend" (SURVEY.md §2.8/§7.7) that the
reference has no counterpart for: its engine transcribes one utterance at a
time under a mutex (`managers/transcription.rs:398-605`). Here concurrent
push-to-talk sessions submit audio to a queue; a dispatcher coalesces
requests into length-bucketed batches (stable compiled shapes), runs one
batched engine call, and resolves per-request futures. Under a
('data','model') Mesh the padded batch is placed with a batch sharding so
XLA splits the work across chips.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Sequence, Tuple

import numpy as np

from spittle_tpu.utils.logging import get_logger
from spittle_tpu.engine.base import TranscribeParams, TranscriptionResult
from spittle_tpu.utils.tracing import span

# Audio-length buckets (seconds): requests pad up to the bucket edge so the
# engine sees a small, fixed set of shapes (compile-once, serve-forever).
DEFAULT_BUCKETS = (1.0, 2.0, 5.0, 10.0, 30.0)
SAMPLE_RATE = 16_000

_log = get_logger("serving")


class ServerOverloaded(RuntimeError):
    """Request rejected by admission control: the queue's estimated wait
    exceeds the configured shed deadline (sla_ms * shed_factor). Callers
    should surface this as retryable backpressure (the HTTP front maps
    it to 503) — under sustained overload, failing fast beats queueing
    unboundedly toward multi-second p99s (the measured saturated arm:
    p50 1509 ms at 8 req/s full-context, BENCHMARKS.md)."""


@dataclasses.dataclass
class _Request:
    samples: np.ndarray
    params: TranscribeParams
    future: Future
    enqueued_at: float


def bucket_for(n_samples: int, buckets: Sequence[float] = DEFAULT_BUCKETS) -> int:
    """Samples -> bucket length in samples (last bucket for longer audio)."""
    for b in buckets:
        if n_samples <= int(b * SAMPLE_RATE):
            return int(b * SAMPLE_RATE)
    return int(buckets[-1] * SAMPLE_RATE)


class BatchingTranscriptionServer:
    """Coalesces transcribe requests into batched engine calls.

    engine: any TranscriptionEngine with transcribe_batch.
    max_batch: cap per device program (BASELINE config 5 targets 32).
    max_wait_ms: dispatch latency budget — a lone request never waits
    longer than this before running.
    mesh: optional jax Mesh; batched calls run under it with the batch
    sharded over the 'data' axis.
    """

    def __init__(
        self,
        engine,
        max_batch: int = 32,
        max_wait_ms: float = 10.0,
        buckets: Sequence[float] = DEFAULT_BUCKETS,
        mesh=None,
        fit_audio_ctx: bool = False,
        overlap_transfers: bool = False,
        prefetch: int = 1,
        sla_ms: Optional[float] = None,
        shed_factor: float = 4.0,
    ):
        self.engine = engine
        # Overload policy (opt-in via sla_ms; see class docstring of
        # ServerOverloaded): DEGRADE when the estimated queue wait
        # exceeds sla_ms — new groups run with the bucket-fitted reduced
        # encoder context (fit_audio_ctx semantics) so service time
        # drops ~6x on short buckets and the queue drains; SHED when the
        # estimated wait exceeds sla_ms * shed_factor — submit raises
        # ServerOverloaded instead of queueing past any useful deadline.
        # The estimate is (groups ahead + busy groups) x an EWMA of the
        # measured per-group service time.
        self.sla_ms = sla_ms
        self.shed_factor = shed_factor
        self.shed_count = 0
        self.degraded_groups = 0
        self._busy_groups = 0
        self._busy_lock = threading.Lock()
        self._service_s: dict = {}  # bucket_len -> EWMA seconds
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.buckets = tuple(buckets)
        self.mesh = mesh
        if mesh is not None:
            # Every compiled shape must divide the data axis or
            # engine._place_windows falls back to replication — exactly
            # on the full-load batches the mesh exists for. Round the
            # cap up to a mesh multiple (filler rows are silence).
            m = mesh.shape[mesh.axis_names[0]]
            if self.max_batch % m:
                self.max_batch = ((self.max_batch + m - 1) // m) * m
        if mesh is not None and hasattr(engine, "mesh"):
            # The engine places window batches with a NamedSharding over
            # the mesh's data axis (engine._place_windows), so the batch
            # really shards instead of replicating onto device 0.
            engine.mesh = mesh
        # Opt-in: run each bucket at a reduced encoder context that just
        # covers it (whisper.cpp audio_ctx analog) — a 5 s bucket pays
        # ~1/6 of the encoder FLOPs + cross-KV reads of a full 30 s
        # window. A speed/accuracy trade the operator chooses; requests
        # that set their own params.audio_ctx are left untouched.
        self.fit_audio_ctx = fit_audio_ctx
        # Opt-in cross-group pipeline: a stager thread runs the host
        # window assembly + (async) host->device transfer of group k+1
        # while group k computes (the transcribe_stream prefetch pattern
        # applied under saturating load, via the engine's
        # stage_batch/transcribe_staged seam). Groups whose params need
        # the sequential path flow through un-staged.
        self.overlap_transfers = overlap_transfers and hasattr(
            engine, "stage_batch"
        )
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._shutdown = threading.Event()
        self.batch_sizes: List[int] = []  # observability
        self._threads: List[threading.Thread] = []
        if self.overlap_transfers:
            # At most TWO groups in flight: one computing, one staging.
            # Deeper pipelines removed the natural backpressure that
            # lets requests ACCUMULATE into batches while a group
            # computes — measured at 16 req/s fit_audio_ctx load as p50
            # 155 ms (no pipeline) vs 530 ms (depth-4 stage queue, mean
            # batch collapsing 2.1 -> 1.4). _in_flight gates _collect so
            # the accumulation window extends to the PREVIOUS group's
            # completion, exactly like the sequential path, while group
            # k+1's host assembly + h2d still overlaps group k's compute.
            self._stage_q: "queue.Queue" = queue.Queue(maxsize=1)
            self._run_q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
            self._in_flight = 0
            self._in_flight_lock = threading.Lock()
            self._threads.append(threading.Thread(
                target=self._stage_loop, daemon=True, name="serving-stager"
            ))
            self._threads.append(threading.Thread(
                target=self._run_loop, daemon=True, name="serving-runner"
            ))
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._threads.append(self._thread)
        for t in self._threads:
            t.start()

    # -- client API ------------------------------------------------------

    def submit(
        self, samples: np.ndarray, params: Optional[TranscribeParams] = None
    ) -> Future:
        if self.sla_ms is not None:
            wait_ms = self._estimated_wait_s() * 1000.0
            if wait_ms > self.sla_ms * self.shed_factor:
                self.shed_count += 1
                raise ServerOverloaded(
                    f"estimated queue wait {wait_ms:.0f} ms exceeds shed "
                    f"deadline {self.sla_ms * self.shed_factor:.0f} ms "
                    f"(sla {self.sla_ms:.0f} ms x {self.shed_factor})"
                )
        fut: Future = Future()
        samples = np.asarray(samples)
        if samples.dtype != np.int16:
            # int16 is the wire format (engines normalize on device);
            # everything else must arrive as float32 in [-1, 1].
            samples = samples.astype(np.float32, copy=False)
        self._queue.put(
            _Request(
                samples=samples,
                params=params or TranscribeParams(),
                future=fut,
                enqueued_at=time.monotonic(),
            )
        )
        return fut

    def transcribe(
        self, samples: np.ndarray, params: Optional[TranscribeParams] = None,
        timeout: float = 300.0,
    ) -> TranscriptionResult:
        """Synchronous client call — the TranscriptionManager seam."""
        return self.submit(samples, params).result(timeout=timeout)

    def warmup(
        self,
        params: Optional[TranscribeParams] = None,
        bucket_s: Optional[float] = None,
        dtypes=(np.int16, np.float32),
    ) -> None:
        """Pre-compile every (bucket, ladder size, PCM dtype) program so
        no live request pays an XLA compile (SURVEY hard part (d):
        <300 ms p50 needs warm graphs for every shape). Decode options
        (max_tokens, beam size, ...) are static in the compiled
        programs — warm with the SAME params production traffic will
        send. All buckets warm by default: with fit_audio_ctx each
        bucket has its own reduced-context programs, and non-whisper
        engines (parakeet pads to the batch max length) also compile
        per bucket; re-executions of an already-compiled program cost
        only a short run, so redundant combinations are cheap. Runs
        under the mesh when one is configured (sharded programs are a
        different identity from single-device ones). Narrow with
        bucket_s / dtypes if boot time matters more than first-request
        latency."""
        if bucket_s is not None:
            bucket_list = [bucket_s]
        else:
            bucket_list = list(self.buckets)
        sizes = self._ladder_sizes()
        for b in bucket_list:
            bucket_len = int(b * SAMPLE_RATE)
            base = params or TranscribeParams()
            variants = [self._fitted_params(bucket_len, base)]
            if self.sla_ms is not None and not self.fit_audio_ctx:
                # The overload DEGRADE arm runs bucket-fitted programs;
                # they must be warm or the first degraded group pays an
                # XLA compile exactly when the server is drowning.
                fitted = self._bucket_ctx_params(bucket_len, base)
                if fitted not in variants:
                    variants.append(fitted)
            for run_params in variants:
                for dtype in dtypes:
                    # one reusable buffer: identical arrays can dedupe on
                    # the host->device transfer layer
                    silence = np.zeros(bucket_len, dtype)
                    for n in sizes:
                        batch = [silence] * n
                        if self.mesh is not None:
                            with self.mesh:
                                self.engine.transcribe_batch(
                                    batch, run_params
                                )
                        else:
                            self.engine.transcribe_batch(batch, run_params)

    def shutdown(self) -> None:
        self._shutdown.set()
        self._queue.put(None)
        self._thread.join(timeout=5)
        if self.overlap_transfers:
            self._stage_q.put(None)  # stager forwards the sentinel
            for t in self._threads:
                if t is not self._thread:
                    t.join(timeout=5)

    # -- dispatcher ------------------------------------------------------

    def _collect(self) -> List[_Request]:
        """Block for one request, then drain for up to max_wait."""
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-signal shutdown
                break
            batch.append(nxt)
        return batch

    def _group_by_bucket(
        self, batch: List[_Request]
    ) -> List[Tuple[int, List[_Request]]]:
        groups = {}
        max_bucket = int(self.buckets[-1] * SAMPLE_RATE)
        for req in batch:
            if len(req.samples) > max_bucket:
                # Over-bucket audio must NOT be truncated to the last bucket:
                # it routes through an unpadded long-form engine call (the
                # engine's seek loop handles arbitrary lengths).
                key = (None, req.params)
            else:
                key = (
                    bucket_for(len(req.samples), self.buckets),
                    req.params,
                )
            groups.setdefault(key, []).append(req)
        return [(k[0], reqs) for k, reqs in groups.items()]

    def _dispatch_loop(self) -> None:
        while not self._shutdown.is_set():
            batch = []
            try:
                if self.overlap_transfers:
                    # Wait for pipeline room BEFORE collecting, so
                    # arrivals pool into the next batch instead of being
                    # collected into tiny groups that queue behind the
                    # pipeline (see _in_flight comment in __init__).
                    while not self._shutdown.is_set():
                        with self._in_flight_lock:
                            if self._in_flight < 2:
                                break
                        time.sleep(0.001)
                batch = self._collect()
                if not batch:
                    continue
                groups = self._group_by_bucket(batch)
                # Shortest-bucket-first: a 1 s utterance grouped with a
                # long-form request must not wait behind it (head-of-line).
                groups.sort(key=lambda g: g[0] if g[0] is not None else 1 << 60)
                for bucket_len, reqs in groups:
                    with self._busy_lock:
                        self._busy_groups += 1
                    if self.overlap_transfers:
                        # Stager + runner threads pipeline the groups:
                        # group k+1's assembly/transfer overlaps group
                        # k's compute. Blocking put = backpressure.
                        with self._in_flight_lock:
                            self._in_flight += 1
                        self._stage_q.put((bucket_len, reqs))
                    else:
                        self._run_group(bucket_len, reqs)
            except Exception as e:
                # Exception barrier: _run_group fails its own group's
                # futures; anything escaping here (collect/grouping)
                # must fail the batch and keep the dispatcher alive —
                # a dead dispatcher would hang every future request.
                _log.exception("serving dispatch iteration failed")
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    # -- overload policy --------------------------------------------------

    def _estimated_wait_s(self, exclude_self: bool = False) -> float:
        """Queue-wait estimate for an arriving request: groups already
        computing/staged plus the groups the current backlog will form,
        each at the EWMA service time (0.5 s prior until measured).
        exclude_self: the dispatch path asks on behalf of a group that
        is ALREADY counted busy — its own service time is not wait."""
        svc = max(self._service_s.values(), default=0.5)
        backlog_groups = -(-self._queue.qsize() // self.max_batch)
        with self._busy_lock:
            busy = self._busy_groups
        ahead = backlog_groups + busy - (1 if exclude_self else 0)
        return max(ahead, 0) * svc

    def _degrade_active(self) -> bool:
        return (
            self.sla_ms is not None
            and self._estimated_wait_s(exclude_self=True) * 1000.0
            > self.sla_ms
        )

    def _note_service(self, bucket_len, seconds: float) -> None:
        prev = self._service_s.get(bucket_len)
        self._service_s[bucket_len] = (
            seconds if prev is None else 0.5 * prev + 0.5 * seconds
        )

    @staticmethod
    def _bucket_ctx_params(
        bucket_len: int, params: TranscribeParams
    ) -> TranscribeParams:
        if params.audio_ctx:
            return params  # caller's explicit choice wins
        ctx = -(-bucket_len // 320)  # encoder positions covering bucket
        ctx = -(-ctx // 64) * 64  # tile-friendly multiple
        return dataclasses.replace(params, audio_ctx=ctx)

    def _fitted_params(
        self, bucket_len: Optional[int], params: TranscribeParams
    ) -> TranscribeParams:
        """Bucket-matched reduced audio context: always in fit_audio_ctx
        mode, and under an sla_ms overload as the DEGRADE arm (service
        time falls ~6x on short buckets so the queue drains instead of
        compounding)."""
        degrade = self._degrade_active()
        if not ((self.fit_audio_ctx or degrade) and bucket_len):
            return params
        fitted = self._bucket_ctx_params(bucket_len, params)
        if degrade and not self.fit_audio_ctx and fitted is not params:
            self.degraded_groups += 1
        return fitted

    def _ladder_size(self, n: int) -> int:
        """Next power-of-two batch size (capped at max_batch).

        XLA compiles one program per device shape; letting every
        coalesced batch size (3, 7, 13, ...) reach the engine means a
        fresh multi-second compile mid-request — measured as 22 s p50
        under Poisson load. A static ladder keeps the shape set tiny
        (and warmup() pre-compiles it)."""
        for size in self._ladder_sizes():
            if size >= n:
                return size
        return self.max_batch

    def _ladder_sizes(self) -> List[int]:
        """The full static shape ladder — warmup() compiles exactly
        these. Starts at the mesh data-axis size when sharded (every
        rung stays evenly shardable; __init__ rounded max_batch up)."""
        base = 1
        if self.mesh is not None:
            base = self.mesh.shape[self.mesh.axis_names[0]]
        sizes = [base]
        while sizes[-1] * 2 < self.max_batch:
            sizes.append(sizes[-1] * 2)
        if sizes[-1] != self.max_batch:
            sizes.append(self.max_batch)
        return sizes

    def _pad_group(
        self, bucket_len: Optional[int], reqs: List[_Request]
    ) -> List[np.ndarray]:
        if bucket_len is None:
            # Long-form group: ragged, unpadded — the engine's windowed
            # seek loop covers the full audio (no silent truncation).
            return [r.samples for r in reqs]
        padded = [
            np.pad(
                r.samples[:bucket_len],
                (0, max(0, bucket_len - len(r.samples))),
            )
            for r in reqs
        ]
        target = self._ladder_size(len(padded))
        filler = target - len(padded)
        if filler > 0:
            silence = np.zeros(bucket_len, padded[0].dtype)
            padded.extend(silence for _ in range(filler))
        return padded

    def _stage_loop(self) -> None:
        """Host assembly + device transfer of the NEXT group while the
        runner computes the current one (jax.device_put is async: the
        copy streams in the background once issued)."""
        while True:
            item = self._stage_q.get()
            if item is None:
                self._run_q.put(None)
                return
            bucket_len, reqs = item
            try:
                padded = self._pad_group(bucket_len, reqs)
                run_params = self._fitted_params(
                    bucket_len, reqs[0].params
                )
                staged = None
                if bucket_len is not None:
                    if self.mesh is not None:
                        with self.mesh:
                            staged = self.engine.stage_batch(
                                padded, run_params
                            )
                    else:
                        staged = self.engine.stage_batch(padded, run_params)
            except Exception as e:
                _log.exception("serving stage failed")
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)
                with self._in_flight_lock:
                    self._in_flight -= 1
                with self._busy_lock:
                    self._busy_groups -= 1
                continue
            self._run_q.put((bucket_len, reqs, padded, run_params, staged))

    def _run_loop(self) -> None:
        while True:
            item = self._run_q.get()
            if item is None:
                return
            try:
                self._run_staged_item(item)
            finally:
                with self._in_flight_lock:
                    self._in_flight -= 1
                with self._busy_lock:
                    self._busy_groups -= 1

    def _run_staged_item(self, item) -> None:
        bucket_len, reqs, padded, run_params, staged = item
        self.batch_sizes.append(len(reqs))
        queue_ms = max(
            (time.monotonic() - r.enqueued_at) * 1000 for r in reqs
        )
        t_run = time.monotonic()
        try:
            with span("serving.batch", size=len(reqs),
                      bucket=bucket_len, queue_ms=round(queue_ms, 1)):
                if staged is not None:
                    if self.mesh is not None:
                        with self.mesh:
                            results = self.engine.transcribe_staged(staged)
                    else:
                        results = self.engine.transcribe_staged(staged)
                elif self.mesh is not None:
                    with self.mesh:
                        results = self.engine.transcribe_batch(
                            padded, run_params
                        )
                else:
                    results = self.engine.transcribe_batch(
                        padded, run_params
                    )
        except Exception as e:
            _log.exception("serving staged run failed")
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)
            return
        self._note_service(bucket_len, time.monotonic() - t_run)
        for r, res in zip(reqs, results):
            r.future.set_result(res)

    def _run_group(
        self, bucket_len: Optional[int], reqs: List[_Request]
    ) -> None:
        padded = self._pad_group(bucket_len, reqs)
        self.batch_sizes.append(len(reqs))
        queue_ms = max(
            (time.monotonic() - r.enqueued_at) * 1000 for r in reqs
        )
        run_params = self._fitted_params(bucket_len, reqs[0].params)
        t_run = time.monotonic()
        try:
            if self.mesh is not None:
                with self.mesh:
                    results = self.engine.transcribe_batch(
                        padded, run_params
                    )
            else:
                with span("serving.batch", size=len(reqs),
                          bucket=bucket_len, queue_ms=round(queue_ms, 1)):
                    results = self.engine.transcribe_batch(
                        padded, run_params
                    )
        except Exception as e:
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)
            return
        finally:
            with self._busy_lock:
                self._busy_groups -= 1
        self._note_service(bucket_len, time.monotonic() - t_run)
        for r, res in zip(reqs, results):
            r.future.set_result(res)
