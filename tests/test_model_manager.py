"""Model manager tests with a local Range-capable HTTP server."""

import http.server
import io
import json
import os
import tarfile
import threading

import pytest

from spittle_tpu.config.catalog import ModelCatalog, ModelCatalogEntry
from spittle_tpu.events import (
    EventBus,
    MODEL_DOWNLOAD_COMPLETE,
    MODEL_DOWNLOAD_PROGRESS,
)
from spittle_tpu.managers.model import ModelManager


class RangeHandler(http.server.BaseHTTPRequestHandler):
    payloads = {}
    honor_range = True
    slow_paths = set()

    def do_GET(self):
        import time as _t

        data = self.payloads.get(self.path)
        if data is None:
            self.send_response(404)
            self.end_headers()
            return
        rng = self.headers.get("Range")
        if rng and self.honor_range:
            start = int(rng.split("=")[1].rstrip("-").split("-")[0])
            body = data[start:]
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {start}-{len(data)-1}/{len(data)}")
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.path in self.slow_paths:
            for i in range(0, len(body), 65536):
                try:
                    self.wfile.write(body[i : i + 65536])
                except BrokenPipeError:
                    return
                _t.sleep(0.02)
        else:
            self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RangeHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def make_catalog(server_url):
    return ModelCatalog(
        language_groups={"english_only": ["en"]},
        models=[
            ModelCatalogEntry(
                id="tiny-file", name="Tiny", description="", filename="tiny.bin",
                url=f"{server_url}/tiny.bin", size_mb=1, is_directory=False,
                engine_type="whisper", accuracy_score=0.5, speed_score=0.9,
                supports_translation=False, is_recommended=False,
                language_group="english_only",
            ),
            ModelCatalogEntry(
                id="dir-model", name="Dir", description="", filename="dir-model",
                url=f"{server_url}/dir.tar.gz", size_mb=1, is_directory=True,
                engine_type="parakeet", accuracy_score=0.5, speed_score=0.9,
                supports_translation=False, is_recommended=False,
                language_group="english_only",
            ),
        ],
    )


def test_download_file_and_progress(tmp_path, server):
    RangeHandler.payloads["/tiny.bin"] = b"M" * 1_000_000
    bus = EventBus()
    progress, complete = [], []
    bus.listen(MODEL_DOWNLOAD_PROGRESS, progress.append)
    bus.listen(MODEL_DOWNLOAD_COMPLETE, complete.append)
    mgr = ModelManager(str(tmp_path), make_catalog(server), events=bus)
    path = mgr.download_model("tiny-file")
    assert os.path.getsize(path) == 1_000_000
    # Reference wire shapes: complete payload is the bare model_id
    # (model.rs:724, modelStore.ts:314 listen<string>); progress is the
    # DownloadProgress struct with percentage 0-100 (model.rs:50-55),
    # with an initial event and a guaranteed final 100% event.
    assert complete == ["tiny-file"]
    assert progress, "expected initial + final progress events"
    for p in progress:
        assert set(p) == {"model_id", "downloaded", "total", "percentage"}
        assert p["model_id"] == "tiny-file"
        assert p["total"] == 1_000_000
    assert progress[0]["downloaded"] == 0
    assert progress[-1]["percentage"] == 100.0
    assert mgr.is_downloaded("tiny-file")


def test_download_resumes_from_partial(tmp_path, server):
    data = bytes(range(256)) * 4000
    RangeHandler.payloads["/tiny.bin"] = data
    mgr = ModelManager(str(tmp_path), make_catalog(server))
    partial = str(tmp_path / "tiny.bin.partial")
    with open(partial, "wb") as f:
        f.write(data[:512])  # simulate an interrupted download
    path = mgr.download_model("tiny-file")
    with open(path, "rb") as f:
        assert f.read() == data  # resumed, not corrupted


def test_download_restarts_on_200(tmp_path, server):
    data = b"Z" * 100_000
    RangeHandler.payloads["/tiny.bin"] = data
    RangeHandler.honor_range = False
    try:
        mgr = ModelManager(str(tmp_path), make_catalog(server))
        with open(str(tmp_path / "tiny.bin.partial"), "wb") as f:
            f.write(b"GARBAGE")
        path = mgr.download_model("tiny-file")
        with open(path, "rb") as f:
            assert f.read() == data
    finally:
        RangeHandler.honor_range = True


def test_directory_model_extraction(tmp_path, server):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        inner = tarfile.TarInfo("dir-model/weights.onnx")
        payload = b"fake onnx"
        inner.size = len(payload)
        tar.addfile(inner, io.BytesIO(payload))
    RangeHandler.payloads["/dir.tar.gz"] = buf.getvalue()
    mgr = ModelManager(str(tmp_path), make_catalog(server))
    path = mgr.download_model("dir-model")
    assert os.path.isdir(path)
    assert os.path.exists(os.path.join(path, "weights.onnx"))


def test_custom_model_discovery(tmp_path, server):
    (tmp_path / "my-custom-model.bin").write_bytes(b"x" * 10)
    mgr = ModelManager(str(tmp_path), make_catalog(server))
    models = mgr.get_available_models()
    custom = [m for m in models if m.is_custom]
    assert len(custom) == 1
    assert custom[0].id == "my-custom-model.bin"
    assert custom[0].is_downloaded


def test_auto_select_first_downloaded(tmp_path, server):
    (tmp_path / "tiny.bin").write_bytes(b"w")
    selected = {"id": ""}
    ModelManager(
        str(tmp_path), make_catalog(server),
        selected_model_getter=lambda: selected["id"],
        selected_model_setter=lambda mid: selected.update(id=mid),
    )
    assert selected["id"] == "tiny-file"


def test_delete_model(tmp_path, server):
    (tmp_path / "tiny.bin").write_bytes(b"w")
    selected = {"id": "tiny-file"}
    mgr = ModelManager(
        str(tmp_path), make_catalog(server),
        selected_model_getter=lambda: selected["id"],
        selected_model_setter=lambda mid: selected.update(id=mid),
    )
    mgr.delete_model("tiny-file")
    assert not mgr.is_downloaded("tiny-file")
    assert selected["id"] == ""


def test_interrupted_extraction_cleanup(tmp_path, server):
    bad = tmp_path / "dir-model.extracting"
    bad.mkdir()
    (bad / "junk").write_bytes(b"j")
    ModelManager(str(tmp_path), make_catalog(server))
    assert not bad.exists()


def test_cancel_download(tmp_path, server):
    import time

    RangeHandler.payloads["/tiny.bin"] = b"M" * 50_000_000
    RangeHandler.slow_paths.add("/tiny.bin")
    mgr = ModelManager(str(tmp_path), make_catalog(server))
    errors = []

    def run():
        try:
            mgr.download_model("tiny-file")
        except InterruptedError as e:
            errors.append(e)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.15)
    mgr.cancel_download("tiny-file")
    t.join(timeout=10)
    assert errors, "download should have been cancelled"
    assert not (tmp_path / "tiny.bin").exists()
