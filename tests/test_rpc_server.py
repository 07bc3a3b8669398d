"""Contract test: the bindings.ts surface driven over a real wire.

Replays a scripted frontend session against the live services graph via
AppRpcServer — the check that the preserved command contract
(`/root/reference/src/bindings.ts`, `src-tauri/src/lib.rs:254-361`) can
actually be driven by a remote frontend: settings change -> model download
with progress events -> transcription via the shortcut wire -> history read.
"""

import http.client
import http.server
import json
import threading
import time

import numpy as np
import pytest

from spittle_tpu.app.actions import ActionContext
from spittle_tpu.app.commands import Commands
from spittle_tpu.app.rpc_server import AppRpcServer, jsonify
from spittle_tpu.app.services import AppServices
from spittle_tpu.audio.recorder import QueueSource
from spittle_tpu.config.catalog import ModelCatalog, ModelCatalogEntry
from spittle_tpu.pipeline import BufferTextOutput


class PayloadHandler(http.server.BaseHTTPRequestHandler):
    payloads = {}

    def do_GET(self):
        data = self.payloads.get(self.path)
        if data is None:
            self.send_response(404)
            self.end_headers()
            return
        rng = self.headers.get("Range")
        if rng:
            start = int(rng.split("=")[1].rstrip("-").split("-")[0])
            body = data[start:]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {start}-{len(data)-1}/{len(data)}"
            )
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def model_server():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), PayloadHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def make_catalog(server_url):
    return ModelCatalog(
        language_groups={"english_only": ["en"]},
        models=[
            ModelCatalogEntry(
                id="tiny-rpc", name="Tiny", description="", filename="tiny.bin",
                url=f"{server_url}/tiny.bin", size_mb=1, is_directory=False,
                engine_type="whisper", accuracy_score=0.5, speed_score=0.9,
                supports_translation=False, is_recommended=False,
                language_group="english_only",
            ),
        ],
    )


class RpcClient:
    def __init__(self, url: str):
        self.host = url.split("//")[1]

    def call(self, cmd, **args):
        conn = http.client.HTTPConnection(self.host, timeout=30)
        conn.request(
            "POST", "/rpc",
            json.dumps({"cmd": cmd, "args": args}),
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        if not out["ok"]:
            raise RuntimeError(out["error"])
        return out["result"]

    def shortcut(self, binding_id, is_pressed):
        conn = http.client.HTTPConnection(self.host, timeout=30)
        conn.request(
            "POST", "/shortcut",
            json.dumps({"binding_id": binding_id, "is_pressed": is_pressed}),
            {"Content-Type": "application/json"},
        )
        out = json.loads(conn.getresponse().read())
        conn.close()
        assert out["ok"], out
        return out

    def get(self, path):
        conn = http.client.HTTPConnection(self.host, timeout=30)
        conn.request("GET", path)
        out = json.loads(conn.getresponse().read())
        conn.close()
        return out


class EventCollector:
    """Background SSE reader collecting (event, data) pairs."""

    def __init__(self, url: str):
        self.events = []
        self._lock = threading.Lock()
        self.host = url.split("//")[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        conn = http.client.HTTPConnection(self.host, timeout=60)
        conn.request("GET", "/events")
        resp = conn.getresponse()
        cur_event = None
        while not self._stop.is_set():
            line = resp.fp.readline()
            if not line:
                break
            line = line.decode().rstrip("\n")
            if line.startswith("event: "):
                cur_event = line[len("event: "):]
            elif line.startswith("data: ") and cur_event:
                with self._lock:
                    self.events.append(
                        (cur_event, json.loads(line[len("data: "):]))
                    )
                cur_event = None
        conn.close()

    def names(self):
        with self._lock:
            return [e for e, _ in self.events]

    def wait_for(self, name, timeout=20):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if name in self.names():
                return True
            time.sleep(0.05)
        return False

    def stop(self):
        self._stop.set()


@pytest.fixture
def app(tmp_path, model_server):
    PayloadHandler.payloads["/tiny.bin"] = b"W" * 300_000
    src = QueueSource(16000)
    services = AppServices(
        str(tmp_path), source_factory=lambda: src,
        use_mock_engine=True, catalog=make_catalog(model_server),
    )
    out = BufferTextOutput()
    actions = ActionContext(services, out)
    cmds = Commands(services, actions)
    server = AppRpcServer(cmds)
    server.start()
    yield services, actions, cmds, server, src, out
    server.stop()
    services.shutdown()


def test_full_frontend_session_over_the_wire(app):
    services, actions, cmds, server, src, out = app
    client = RpcClient(server.url)
    collector = EventCollector(server.url)
    time.sleep(0.1)  # let the SSE stream attach

    # 1. introspection: typed bindings + health
    bindings = client.get("/bindings")
    names = {b["name"] for b in bindings}
    assert {"get_app_settings", "download_model", "get_history_entries"} <= names
    assert client.get("/healthz")["ok"]

    # 2. settings read + camelCase mutation (the generated bindings call
    #    with camel names)
    settings = client.call("getAppSettings")
    assert settings["push_to_talk"] in (True, False)
    client.call("changePttSetting", enabled=True)
    assert client.call("get_app_settings")["push_to_talk"] is True
    assert collector.wait_for("settings-changed")

    # 3. model catalog + download with progress events over the stream
    models = client.call("getAvailableModels")
    assert models[0]["id"] == "tiny-rpc"
    client.call("downloadModel", model_id="tiny-rpc")
    deadline = time.time() + 30
    while time.time() < deadline:
        infos = client.call("getAvailableModels")
        if infos[0]["is_downloaded"]:
            break
        time.sleep(0.1)
    assert client.call("hasAnyModelsAvailable") is True
    assert collector.wait_for("model-download-progress")
    assert collector.wait_for("model-download-complete")

    # 4. activate + transcribe: drive the dictation loop over the wire
    client.call("setActiveModel", model_id="tiny-rpc")
    services.transcription._engine.canned_text = "hello from the wire"
    client.shortcut("transcribe", True)
    assert client.call("isRecording") is True
    t = np.arange(24000) / 16000.0
    src.push((0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32))
    time.sleep(0.3)
    client.shortcut("transcribe", False)
    deadline = time.time() + 30
    while time.time() < deadline and "hello from the wire" not in out.buffer:
        time.sleep(0.1)
    assert "hello from the wire" in out.buffer

    # 5. error contract: unknown command and bad args are structured errors
    with pytest.raises(RuntimeError, match="unknown command"):
        client.call("noSuchCommand")
    with pytest.raises(RuntimeError):
        client.call("changeBinding", binding_id="nope", new_binding="x")

    collector.stop()


def test_history_over_the_wire(app):
    services, actions, cmds, server, src, out = app
    client = RpcClient(server.url)
    audio = np.zeros(16000, np.float32)
    services.history.save_transcription(audio, "Title", "raw text", None, None)
    entries = client.call("getHistoryEntries")
    assert entries and entries[0]["transcription_text"] == "raw text"
    entry_id = entries[0]["id"]
    assert client.call("toggleHistoryEntrySaved", entry_id=entry_id) in (
        True, False,
    )
    path = client.call("getAudioFilePath", entry_id=entry_id)
    assert isinstance(path, str)
    client.call("deleteHistoryEntry", entry_id=entry_id)
    assert client.call("getHistoryEntries") == []


def test_jsonify_roundtrips_shared_types(app):
    """AppSettings / ModelInfo / HistoryEntry — the shared types in
    bindings.ts — serialize to JSON cleanly."""
    services, actions, cmds, server, *_ = app
    blob = json.dumps(jsonify(cmds.get_app_settings()))
    parsed = json.loads(blob)
    assert "bindings" in parsed and "post_process_providers" in parsed
    blob2 = json.dumps(jsonify(cmds.get_available_models()))
    assert json.loads(blob2)[0]["engine_type"] == "whisper"


def test_suspend_binding_blocks_action_routing(app):
    """suspend_binding gates handle_shortcut_event; resume restores it."""
    services, actions, cmds, server, src, out = app
    client = RpcClient(server.url)
    cmds.suspend_binding("transcribe")
    client.shortcut("transcribe", True)
    assert client.call("isRecording") is False  # suspended: no action ran
    cmds.resume_binding("transcribe")
    client.shortcut("transcribe", True)
    assert client.call("isRecording") is True
    client.shortcut("transcribe", False)
