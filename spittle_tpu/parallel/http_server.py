"""HTTP serving front for the batching transcription server.

The reference's `TranscriptionManager.transcribe` seam becomes a client of
a TPU serving loop (SURVEY §5 "distributed communication backend"): desktop
apps POST audio here and the BatchingTranscriptionServer coalesces
concurrent sessions into device batches.

Endpoints:
  POST /transcribe   body: WAV bytes, raw f32 PCM, raw s16le, or mu-law PCM
                     (X-PCM-Format: s16le | mulaw; X-Sample-Rate for raw) ->
                     {"text", "language", "segments": [...]}
  GET  /healthz      {"ok": true, "batches": [...recent batch sizes...]}

stdlib http.server (threaded); heavy lifting happens on the device via the
batching dispatcher, so handler threads just block on futures.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from spittle_tpu.engine.base import TranscribeParams
from .serving import BatchingTranscriptionServer, ServerOverloaded


def _parse_audio(
    body: bytes,
    content_type: str,
    sample_rate: Optional[int],
    pcm_format: str = "",
):
    """WAV bytes, raw f32le, raw s16le, or 8-bit mu-law
    (X-PCM-Format: s16le | mulaw).

    int16 stays int16 when no resample is needed — it is the engine's
    wire format (half the host->device bytes, normalized on device).
    mu-law (audio/mulaw.py) halves the CLIENT->server bytes too; it
    decodes to int16 here so the device wire stays compact."""
    from spittle_tpu.audio.resample import resample
    from spittle_tpu.audio.wav import load_wav_file
    import tempfile, os

    # An explicit X-PCM-Format outranks content sniffing: raw PCM can
    # legitimately start with the bytes "RIFF" (for the 8-bit mu-law wire
    # that is just four mid-amplitude samples), so sniffing first would
    # misparse declared-PCM bodies as WAV.
    if pcm_format == "mulaw":
        from spittle_tpu.audio.mulaw import mulaw_decode_np

        audio = (
            mulaw_decode_np(np.frombuffer(body, np.uint8)) * 32767.0
        ).astype(np.int16)
        rate = sample_rate or 16000
    elif pcm_format == "s16le":
        audio = np.frombuffer(body, "<i2")
        rate = sample_rate or 16000
    elif body[:4] == b"RIFF":
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
            f.write(body)
            path = f.name
        try:
            audio, rate = load_wav_file(path, keep_int16=True)
        finally:
            os.unlink(path)
    else:
        audio = np.frombuffer(body, np.float32)
        rate = sample_rate or 16000
    if rate != 16000:
        from spittle_tpu.engine.base import normalize_pcm

        audio = np.asarray(resample(normalize_pcm(audio), rate, 16000))
    return audio


class TranscriptionHTTPServer:
    def __init__(
        self,
        server: BatchingTranscriptionServer,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.batcher = server
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, code: int, payload) -> None:
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {
                        "ok": True,
                        "batches": outer.batcher.batch_sizes[-20:],
                    })
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/transcribe":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length)
                    sr = self.headers.get("X-Sample-Rate")
                    audio = _parse_audio(
                        body, self.headers.get("Content-Type", ""),
                        int(sr) if sr else None,
                        self.headers.get("X-PCM-Format", ""),
                    )
                    actx = self.headers.get("X-Audio-Ctx")
                    params = TranscribeParams(
                        language=self.headers.get("X-Language") or None,
                        translate=self.headers.get("X-Translate") == "1",
                        initial_prompt=self.headers.get("X-Initial-Prompt") or None,
                        beam_size=int(self.headers.get("X-Beam-Size", "1")),
                        # whisper.cpp audio_ctx analog (speed knob)
                        audio_ctx=int(actx) if actx else None,
                    )
                    result = outer.batcher.transcribe(audio, params)
                    self._json(200, {
                        "text": result.text,
                        "language": result.language,
                        "segments": [
                            {"start": s.start, "end": s.end, "text": s.text}
                            for s in result.segments
                        ],
                    })
                except ServerOverloaded as e:
                    # Admission control shed: retryable backpressure.
                    self._json(503, {"error": str(e), "retryable": True})
                except Exception as e:  # robust serving loop
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self):
        return self.httpd.server_address

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
