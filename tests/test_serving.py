"""Batching server tests: coalescing, bucketing, latency, mesh sharding."""

import threading
import time

import numpy as np
import pytest

from spittle_tpu.engine.base import TranscribeParams, TranscriptionResult
from spittle_tpu.parallel.serving import (
    BatchingTranscriptionServer,
    bucket_for,
)


class RecordingEngine:
    """Engine that records batch shapes and answers with lengths."""

    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay

    def transcribe_batch(self, batch, params=None):
        self.batches.append([len(b) for b in batch])
        if self.delay:
            time.sleep(self.delay)
        return [TranscriptionResult(text=f"len={len(b)}") for b in batch]


def test_bucket_for():
    assert bucket_for(100) == 16000
    assert bucket_for(16000) == 16000
    assert bucket_for(16001) == 32000
    assert bucket_for(16000 * 100) == 16000 * 30


def test_single_request_roundtrip():
    eng = RecordingEngine()
    srv = BatchingTranscriptionServer(eng, max_wait_ms=5)
    res = srv.transcribe(np.ones(8000, np.float32))
    assert res.text == "len=16000"  # padded to 1 s bucket
    srv.shutdown()


def test_concurrent_requests_coalesce():
    eng = RecordingEngine(delay=0.05)
    srv = BatchingTranscriptionServer(eng, max_wait_ms=50)
    futs = [srv.submit(np.ones(8000, np.float32)) for _ in range(8)]
    # occupy the dispatcher with the first batch, the rest coalesce
    results = [f.result(timeout=10) for f in futs]
    assert all(r.text == "len=16000" for r in results)
    assert max(srv.batch_sizes) >= 2  # at least some coalescing happened
    srv.shutdown()


def test_buckets_not_mixed():
    eng = RecordingEngine(delay=0.02)
    srv = BatchingTranscriptionServer(eng, max_wait_ms=60)
    futs = [
        srv.submit(np.ones(8000, np.float32)),
        srv.submit(np.ones(60000, np.float32)),  # 5 s bucket
        srv.submit(np.ones(8000, np.float32)),
    ]
    [f.result(timeout=10) for f in futs]
    # every engine batch is length-homogeneous
    for shapes in eng.batches:
        assert len(set(shapes)) == 1
    srv.shutdown()


def test_different_params_not_mixed():
    eng = RecordingEngine(delay=0.02)
    srv = BatchingTranscriptionServer(eng, max_wait_ms=60)
    f1 = srv.submit(np.ones(8000, np.float32), TranscribeParams(language="en"))
    f2 = srv.submit(np.ones(8000, np.float32), TranscribeParams(language="de"))
    f1.result(timeout=10), f2.result(timeout=10)
    assert len(eng.batches) >= 2
    srv.shutdown()


def test_engine_error_propagates():
    class Boom:
        def transcribe_batch(self, batch, params=None):
            raise ValueError("engine down")

    srv = BatchingTranscriptionServer(Boom(), max_wait_ms=5)
    with pytest.raises(ValueError):
        srv.transcribe(np.ones(100, np.float32), timeout=5)
    srv.shutdown()


def test_max_batch_respected():
    eng = RecordingEngine(delay=0.05)
    srv = BatchingTranscriptionServer(eng, max_batch=4, max_wait_ms=200)
    futs = [srv.submit(np.ones(100, np.float32)) for _ in range(10)]
    [f.result(timeout=10) for f in futs]
    assert max(srv.batch_sizes) <= 4
    srv.shutdown()


def test_under_mesh_data_sharding():
    import jax
    from spittle_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())), tp=1)

    class MeshCheckingEngine:
        def transcribe_batch(self, batch, params=None):
            from jax.sharding import NamedSharding, PartitionSpec as P
            import jax.numpy as jnp

            arr = jax.device_put(
                jnp.asarray(np.stack(batch)),
                NamedSharding(mesh, P("data")),
            )
            total = jax.jit(lambda x: x.sum(axis=-1))(arr)
            return [TranscriptionResult(text=str(float(t))) for t in total]

    srv = BatchingTranscriptionServer(
        MeshCheckingEngine(), max_wait_ms=100, mesh=mesh
    )
    futs = [srv.submit(np.ones(1000, np.float32)) for _ in range(8)]
    results = [f.result(timeout=30) for f in futs]
    assert all(r.text == "1000.0" for r in results)
    srv.shutdown()


class TestHttpFront:
    def test_transcribe_and_health(self, tmp_path):
        import http.client
        import io
        import wave

        from spittle_tpu.parallel.http_server import TranscriptionHTTPServer

        eng = RecordingEngine()
        srv = BatchingTranscriptionServer(eng, max_wait_ms=5)
        http_srv = TranscriptionHTTPServer(srv)
        http_srv.start()
        host, port = http_srv.address

        # WAV body
        from spittle_tpu.audio.wav import save_wav_file
        wav_path = str(tmp_path / "a.wav")
        save_wav_file(wav_path, np.ones(8000, np.float32) * 0.1)
        body = open(wav_path, "rb").read()
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("POST", "/transcribe", body)
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200, data
        import json
        payload = json.loads(data)
        assert payload["text"] == "len=16000"

        # raw f32 at 48 kHz with resampling
        raw = (np.ones(48000, np.float32) * 0.1).tobytes()
        conn.request("POST", "/transcribe", raw,
                     headers={"X-Sample-Rate": "48000"})
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert payload["text"] == "len=16000"  # 1 s -> 16000-bucket

        # 8-bit mu-law wire (X-PCM-Format: mulaw): one byte per sample
        from spittle_tpu.audio.mulaw import mulaw_encode
        mu = mulaw_encode(np.ones(16000, np.float32) * 0.1).tobytes()
        assert len(mu) == 16000
        conn.request("POST", "/transcribe", mu,
                     headers={"X-PCM-Format": "mulaw"})
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert payload["text"] == "len=16000"

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = json.loads(resp.read())
        assert health["ok"] and health["batches"]

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
        http_srv.stop()
        srv.shutdown()


def test_parse_audio_explicit_format_beats_riff_sniff():
    """An explicit X-PCM-Format outranks RIFF byte-sniffing: 8-bit
    mu-law (or s16le) audio whose first samples happen to encode as the
    bytes 'RIFF' must parse as raw PCM, not as a WAV file."""
    from spittle_tpu.parallel.http_server import _parse_audio

    codes = np.full(16000, 128, np.uint8)
    codes[:4] = [0x52, 0x49, 0x46, 0x46]  # b"RIFF"
    audio = _parse_audio(codes.tobytes(), "", None, pcm_format="mulaw")
    assert audio.dtype == np.int16 and audio.size == 16000

    s16 = np.zeros(8000, "<i2")
    s16[0], s16[1] = 0x4952, 0x4646  # little-endian b"RIFF"
    audio = _parse_audio(s16.tobytes(), "", None, pcm_format="s16le")
    assert audio.dtype == np.int16 and audio.size == 8000


def test_server_with_real_whisper_engine_concurrent():
    """End-to-end: concurrent sessions through the batching server into
    the real (random-weight) Whisper engine; every future resolves with a
    result and requests actually coalesce."""
    import threading

    import numpy as np

    from spittle_tpu.engine.whisper_engine import WhisperEngine
    from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig

    CONFIGS.setdefault(
        "serving-test",
        WhisperConfig(
            name="serving-test", n_mels=80, n_audio_ctx=1500,
            n_audio_state=64, n_audio_head=4, n_audio_layer=1,
            n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=4,
            n_text_layer=1,
        ),
    )
    engine = WhisperEngine()
    engine.load_model("random:serving-test")
    server = BatchingTranscriptionServer(engine, max_batch=8,
                                         max_wait_ms=50.0)
    try:
        rng = np.random.default_rng(0)
        futures = []
        start = threading.Barrier(6)

        def submit(i):
            start.wait()
            samples = (0.1 * rng.standard_normal(16000)).astype(np.float32)
            futures.append(server.submit(samples))

        threads = [threading.Thread(target=submit, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [f.result(timeout=600) for f in futures]
        assert len(results) == 6
        assert all(hasattr(r, "text") for r in results)
        assert max(server.batch_sizes) >= 2  # coalescing happened
    finally:
        server.shutdown()


def test_over_bucket_audio_not_truncated():
    """Audio longer than the largest bucket routes through an unpadded
    long-form call instead of being silently sliced to 30 s (the engine's
    windowed seek loop handles arbitrary lengths)."""
    eng = RecordingEngine()
    srv = BatchingTranscriptionServer(eng, max_wait_ms=5)
    n = 16000 * 45  # 45 s > 30 s max bucket
    res = srv.transcribe(np.ones(n, np.float32))
    assert res.text == f"len={n}"  # full audio reached the engine
    srv.shutdown()


def test_short_bucket_dispatches_before_long():
    """Shortest-bucket-first ordering: a 1 s request grouped with long-form
    audio in the same collect round must run first (head-of-line)."""
    eng = RecordingEngine(delay=0.01)
    srv = BatchingTranscriptionServer(eng, max_wait_ms=80)
    f_long = srv.submit(np.ones(16000 * 45, np.float32))
    f_short = srv.submit(np.ones(8000, np.float32))
    f_long.result(timeout=10)
    f_short.result(timeout=10)
    # first dispatched engine batch is the padded 1 s bucket
    assert eng.batches[0] == [16000]
    assert eng.batches[1] == [16000 * 45]
    srv.shutdown()


def test_i16_requests_preserved_not_cast_unscaled():
    """submit() must keep int16 PCM as int16 (the wire format the engines
    normalize on device) — an unscaled float32 cast feeds +-32767-range
    'audio' into the engine."""

    class DtypeEngine:
        def transcribe_batch(self, batch, params=None):
            return [
                TranscriptionResult(text=str(b.dtype)) for b in batch
            ]

    srv = BatchingTranscriptionServer(DtypeEngine(), max_wait_ms=5)
    try:
        out16 = srv.transcribe(np.ones(8000, np.int16))
        out32 = srv.transcribe(np.ones(8000, np.float64))
        assert out16.text == "int16"
        assert out32.text == "float32"
    finally:
        srv.shutdown()


def test_batch_size_ladder_padding():
    """Device programs compile per batch size: the dispatcher pads each
    bucketed group to the next power-of-two (capped at max_batch) with
    silence so the compiled-shape set stays tiny under load."""
    eng = RecordingEngine(delay=0.05)
    srv = BatchingTranscriptionServer(eng, max_batch=32, max_wait_ms=80)
    try:
        futs = [srv.submit(np.ones(8000, np.float32)) for _ in range(3)]
        # occupy dispatcher so remaining submissions coalesce
        [f.result(timeout=10) for f in futs]
        engine_batch_sizes = {len(b) for b in eng.batches}
        assert engine_batch_sizes <= {1, 2, 4, 8}  # ladder sizes only
        # observability records REAL request counts, not padded
        assert sum(srv.batch_sizes) == 3
    finally:
        srv.shutdown()


def test_warmup_compiles_ladder():
    eng = RecordingEngine()
    srv = BatchingTranscriptionServer(eng, max_batch=32, max_wait_ms=5)
    try:
        srv.warmup(dtypes=(np.float32,))
        ladder = [1, 2, 4, 8, 16, 32]
        # every bucket warms the full ladder (non-whisper engines and
        # fit_audio_ctx compile per bucket length)
        from spittle_tpu.parallel.serving import DEFAULT_BUCKETS
        assert [len(b) for b in eng.batches] == ladder * len(DEFAULT_BUCKETS)
        lens = {b[0] for b in eng.batches}
        assert lens == {int(s * 16000) for s in DEFAULT_BUCKETS}
    finally:
        srv.shutdown()


def test_warmup_respects_bucket_and_dtype_narrowing():
    class DtypeRecordingEngine:
        def __init__(self):
            self.calls = []

        def transcribe_batch(self, batch, params=None):
            self.calls.append((len(batch), len(batch[0]), batch[0].dtype))
            return [TranscriptionResult(text="") for _ in batch]

    eng = DtypeRecordingEngine()
    srv = BatchingTranscriptionServer(eng, max_batch=4, max_wait_ms=5)
    try:
        srv.warmup(bucket_s=5.0)
        assert {c[1] for c in eng.calls} == {16000 * 5}
        assert {str(c[2]) for c in eng.calls} == {"int16", "float32"}
        assert [c[0] for c in eng.calls] == [1, 2, 4] * 2
    finally:
        srv.shutdown()


def test_warmup_runs_under_mesh():
    import jax
    from spittle_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        import pytest

        pytest.skip("needs the virtual multi-device mesh")

    entered = []

    class MeshCheckEngine:
        def transcribe_batch(self, batch, params=None):
            from jax.sharding import get_abstract_mesh
            import jax.interpreters.pxla  # noqa: F401

            from jax._src import mesh as mesh_lib

            entered.append(
                mesh_lib.thread_resources.env.physical_mesh.size > 1
            )
            return [TranscriptionResult(text="") for _ in batch]

    mesh = make_mesh(n_dev, tp=2 if n_dev % 2 == 0 else 1)
    srv = BatchingTranscriptionServer(
        MeshCheckEngine(), max_batch=2, max_wait_ms=5, mesh=mesh
    )
    try:
        srv.warmup(bucket_s=1.0, dtypes=(np.float32,))
        assert entered and all(entered)
    finally:
        srv.shutdown()


def test_fit_audio_ctx_sets_bucket_matched_context():
    """fit_audio_ctx mode runs each bucket at the reduced encoder
    context that covers it; explicit request audio_ctx wins."""

    class ParamsEngine:
        def __init__(self):
            self.seen = []

        def transcribe_batch(self, batch, params=None):
            self.seen.append(params.audio_ctx)
            return [TranscriptionResult(text="") for _ in batch]

    eng = ParamsEngine()
    srv = BatchingTranscriptionServer(
        eng, max_wait_ms=5, fit_audio_ctx=True
    )
    try:
        srv.transcribe(np.ones(16000 * 4, np.float32))  # 5 s bucket
        srv.transcribe(np.ones(16000 * 25, np.float32))  # 30 s bucket
        srv.transcribe(
            np.ones(16000 * 4, np.float32),
            TranscribeParams(audio_ctx=100),
        )
        # 5 s bucket: 80000/320 = 250 -> 256; 30 s: 1500 -> 1536 (the
        # engine caps at the model's n_audio_ctx, so this is the full
        # window); explicit request value passes through untouched
        assert eng.seen == [256, 1536, 100]
    finally:
        srv.shutdown()


def test_fit_audio_ctx_off_by_default():
    class ParamsEngine:
        def __init__(self):
            self.seen = []

        def transcribe_batch(self, batch, params=None):
            self.seen.append(params.audio_ctx)
            return [TranscriptionResult(text="") for _ in batch]

    eng = ParamsEngine()
    srv = BatchingTranscriptionServer(eng, max_wait_ms=5)
    try:
        srv.transcribe(np.ones(16000 * 4, np.float32))
        assert eng.seen == [None]
    finally:
        srv.shutdown()


# -- cross-group transfer overlap (stager/runner pipeline) ---------------

class StagingRecordingEngine:
    """Engine with the stage_batch/transcribe_staged seam; records which
    path each group took and simulates compute latency."""

    def __init__(self, delay=0.0):
        self.staged_runs = []
        self.direct_runs = []
        self.delay = delay
        self.mesh = None

    def stage_batch(self, batch, params=None):
        if params is not None and not params.parallel_windows:
            return None
        return ("staged", [np.asarray(b) for b in batch], params)

    def transcribe_staged(self, handle):
        _tag, batch, params = handle
        self.staged_runs.append(len(batch))
        if self.delay:
            time.sleep(self.delay)
        return [TranscriptionResult(text=f"len={len(b)}") for b in batch]

    def transcribe_batch(self, batch, params=None):
        self.direct_runs.append(len(batch))
        if self.delay:
            time.sleep(self.delay)
        return [TranscriptionResult(text=f"len={len(b)}") for b in batch]


def test_overlap_pipeline_roundtrip():
    from spittle_tpu.engine.base import TranscribeParams

    eng = StagingRecordingEngine()
    srv = BatchingTranscriptionServer(
        eng, max_batch=4, max_wait_ms=5.0, overlap_transfers=True
    )
    try:
        params = TranscribeParams(
            parallel_windows=True, condition_on_previous_text=False
        )
        futs = [
            srv.submit(np.zeros(16000, np.float32), params)
            for _ in range(6)
        ]
        results = [f.result(timeout=30) for f in futs]
        assert all(r.text.startswith("len=") for r in results)
        assert sum(eng.staged_runs) >= 6  # staged path used
        assert eng.direct_runs == []
    finally:
        srv.shutdown()


def test_overlap_unstageable_params_fall_back_to_direct():
    from spittle_tpu.engine.base import TranscribeParams

    eng = StagingRecordingEngine()
    srv = BatchingTranscriptionServer(
        eng, max_batch=4, max_wait_ms=5.0, overlap_transfers=True
    )
    try:
        seq = TranscribeParams(parallel_windows=False)
        fut = srv.submit(np.zeros(16000, np.float32), seq)
        assert fut.result(timeout=30).text.startswith("len=")
        assert eng.direct_runs  # sequential-path group ran un-staged
    finally:
        srv.shutdown()


def test_overlap_staged_error_fails_futures_and_recovers():
    from spittle_tpu.engine.base import TranscribeParams

    class FlakyEngine(StagingRecordingEngine):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def transcribe_staged(self, handle):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("device fell over")
            return super().transcribe_staged(handle)

    eng = FlakyEngine()
    srv = BatchingTranscriptionServer(
        eng, max_batch=4, max_wait_ms=5.0, overlap_transfers=True
    )
    try:
        params = TranscribeParams(
            parallel_windows=True, condition_on_previous_text=False
        )
        f1 = srv.submit(np.zeros(16000, np.float32), params)
        with pytest.raises(RuntimeError):
            f1.result(timeout=30)
        # The pipeline survives: the next request succeeds.
        f2 = srv.submit(np.zeros(16000, np.float32), params)
        assert f2.result(timeout=30).text.startswith("len=")
    finally:
        srv.shutdown()


def test_overlap_actually_overlaps_under_load():
    """With stager+runner pipelined, N groups of (stage 60ms + run 60ms)
    finish in ~N*60ms + 60ms, not N*120ms. Generous margins: we assert
    pipelining happened, not exact timings."""
    from spittle_tpu.engine.base import TranscribeParams

    stage_s = 0.06
    run_s = 0.06

    class SlowStager(StagingRecordingEngine):
        def stage_batch(self, batch, params=None):
            time.sleep(stage_s)  # host assembly + transfer
            return super().stage_batch(batch, params)

    eng = SlowStager(delay=run_s)
    srv = BatchingTranscriptionServer(
        eng, max_batch=1, max_wait_ms=1.0, overlap_transfers=True
    )
    try:
        params = TranscribeParams(
            parallel_windows=True, condition_on_previous_text=False
        )
        n = 8
        t0 = time.monotonic()
        futs = [
            srv.submit(np.zeros(16000, np.float32), params)
            for _ in range(n)
        ]
        for f in futs:
            f.result(timeout=30)
        elapsed = time.monotonic() - t0
        serial = n * (stage_s + run_s)
        assert elapsed < serial * 0.85, (
            f"no overlap: {elapsed:.2f}s vs serial {serial:.2f}s"
        )
    finally:
        srv.shutdown()


def test_mesh_sharded_placement_real_engine():
    """VERDICT r2 #5: the mesh path must REALLY shard — the window batch
    placed by the engine carries a NamedSharding over the data axis with
    one row-shard per device, not a replicated/default placement."""
    import jax
    from jax.sharding import Mesh, NamedSharding

    from spittle_tpu.engine.base import TranscribeParams
    from spittle_tpu.engine.whisper_engine import WhisperEngine
    from spittle_tpu.models.whisper.config import CONFIGS, WhisperConfig

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    CONFIGS.setdefault(
        "serving-test",
        WhisperConfig(
            name="serving-test", n_mels=80, n_audio_ctx=1500,
            n_audio_state=64, n_audio_head=4, n_audio_layer=1,
            n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=4,
            n_text_layer=1,
        ),
    )
    mesh = Mesh(np.array(devices[:8]), ("data",))
    engine = WhisperEngine()
    engine.load_model("random:serving-test")

    placements = []
    orig = engine._place_windows

    def spy(windows):
        arr = orig(windows)
        placements.append(arr)
        return arr

    engine._place_windows = spy
    srv = BatchingTranscriptionServer(
        engine, max_batch=8, max_wait_ms=30.0, mesh=mesh,
        overlap_transfers=True,
    )
    try:
        params = TranscribeParams(
            language="en", parallel_windows=True,
            condition_on_previous_text=False, max_tokens=4,
            temperatures=(0.0,),
        )
        futs = [
            srv.submit(np.zeros(16000, np.float32), params)
            for _ in range(8)
        ]
        results = [f.result(timeout=600) for f in futs]
        assert len(results) == 8
        assert placements, "no window batch was placed"
        arr = placements[0]
        assert isinstance(arr.sharding, NamedSharding)
        assert arr.sharding.spec[0] == "data"
        assert len(arr.sharding.device_set) == 8
        shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
        assert shard_rows == {arr.shape[0] // 8}, (
            f"rows not split across devices: {shard_rows}"
        )
    finally:
        srv.shutdown()


def test_mesh_ladder_stays_shardable():
    """A max_batch that is not a mesh multiple must not produce ragged
    compiled shapes (engine._place_windows would silently replicate):
    the cap rounds up and every ladder rung divides the data axis."""
    import jax
    from spittle_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())), tp=1)
    m = mesh.shape["data"]

    class NullEngine:
        def transcribe_batch(self, batch, params=None):
            return [TranscriptionResult(text="") for _ in batch]

    srv = BatchingTranscriptionServer(
        NullEngine(), mesh=mesh, max_batch=2 * m + 1
    )
    try:
        assert srv.max_batch == 3 * m
        sizes = srv._ladder_sizes()
        assert sizes[0] == m and sizes[-1] == srv.max_batch
        assert all(s % m == 0 for s in sizes)
        assert srv._ladder_size(2 * m + 1) == 3 * m
        assert srv._ladder_size(1) == m
    finally:
        srv.shutdown()


# -- admission control (sla_ms overload policy) ------------------------------


class ParamsDelayEngine:
    """Records the params of every batch; fixed per-call delay."""

    def __init__(self, delay=0.0):
        self.calls = []
        self.delay = delay

    def transcribe_batch(self, batch, params=None):
        self.calls.append((len(batch), params))
        if self.delay:
            time.sleep(self.delay)
        return [TranscriptionResult(text="x") for _ in batch]


def test_sla_degrade_applies_fitted_context():
    """When the estimated queue wait exceeds sla_ms, new groups run with
    the bucket-fitted reduced audio context (the DEGRADE arm) even
    though fit_audio_ctx is off."""
    from spittle_tpu.parallel.serving import BatchingTranscriptionServer

    eng = ParamsDelayEngine(delay=0.15)
    srv = BatchingTranscriptionServer(
        eng, max_batch=2, max_wait_ms=5.0, sla_ms=50.0, shed_factor=1e9
    )
    try:
        audio = np.zeros(16000, np.float32)
        # Idle server: a lone request must NOT be degraded (wait == 0).
        srv.submit(audio).result(timeout=30)
        assert srv.degraded_groups == 0
        assert eng.calls[0][1].audio_ctx is None
        # Flood: the queue builds up behind the 150 ms service time, so
        # queued groups must degrade to the 1 s bucket's fitted context.
        futs = [srv.submit(audio) for _ in range(10)]
        for f in futs:
            f.result(timeout=30)
    finally:
        srv.shutdown()
    assert srv.degraded_groups > 0
    fitted = [p.audio_ctx for _, p in eng.calls if p and p.audio_ctx]
    assert 64 in fitted


def test_sla_shed_raises_server_overloaded():
    from spittle_tpu.parallel.serving import (
        BatchingTranscriptionServer,
        ServerOverloaded,
    )

    eng = ParamsDelayEngine(delay=0.3)
    srv = BatchingTranscriptionServer(
        eng, max_batch=1, max_wait_ms=1.0, sla_ms=20.0, shed_factor=2.0
    )
    try:
        audio = np.zeros(16000, np.float32)
        futs = []
        shed = 0
        for _ in range(30):
            try:
                futs.append(srv.submit(audio))
            except ServerOverloaded:
                shed += 1
        assert shed > 0
        assert srv.shed_count == shed
        for f in futs:
            f.result(timeout=60)  # accepted requests still complete
    finally:
        srv.shutdown()


def test_no_sla_means_no_policy():
    """Default construction: no shed, no degrade, behavior unchanged."""
    from spittle_tpu.parallel.serving import BatchingTranscriptionServer

    eng = ParamsDelayEngine(delay=0.05)
    srv = BatchingTranscriptionServer(eng, max_batch=2, max_wait_ms=5.0)
    try:
        audio = np.zeros(16000, np.float32)
        futs = [srv.submit(audio) for _ in range(12)]
        for f in futs:
            f.result(timeout=30)
    finally:
        srv.shutdown()
    assert srv.shed_count == 0
    assert srv.degraded_groups == 0
    assert all(p is None or p.audio_ctx is None for _, p in eng.calls)


def test_sla_warmup_precompiles_degraded_shapes():
    from spittle_tpu.parallel.serving import BatchingTranscriptionServer

    eng = ParamsDelayEngine()
    srv = BatchingTranscriptionServer(
        eng, max_batch=2, max_wait_ms=5.0, sla_ms=100.0
    )
    try:
        srv.warmup(bucket_s=1.0, dtypes=(np.float32,))
    finally:
        srv.shutdown()
    ctxs = {p.audio_ctx for _, p in eng.calls}
    assert None in ctxs and 64 in ctxs  # full AND fitted programs warm


def test_http_front_maps_shed_to_503():
    import urllib.error
    import urllib.request

    from spittle_tpu.parallel.http_server import TranscriptionHTTPServer
    from spittle_tpu.parallel.serving import BatchingTranscriptionServer

    eng = ParamsDelayEngine(delay=0.5)
    srv = BatchingTranscriptionServer(
        eng, max_batch=1, max_wait_ms=1.0, sla_ms=10.0, shed_factor=1.0
    )
    http_srv = TranscriptionHTTPServer(srv)
    http_srv.start()
    try:
        host, port = http_srv.address
        body = np.zeros(16000, np.float32).tobytes()

        def post():
            req = urllib.request.Request(
                f"http://{host}:{port}/transcribe", data=body,
                headers={"X-Language": "en"},
            )
            return urllib.request.urlopen(req, timeout=30)

        codes = []
        import threading as _th

        def worker():
            try:
                with post() as r:
                    codes.append(r.status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)

        threads = [_th.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert 503 in codes  # at least one shed surfaced as retryable
        assert 200 in codes  # accepted requests still served
    finally:
        http_srv.stop()
        srv.shutdown()
