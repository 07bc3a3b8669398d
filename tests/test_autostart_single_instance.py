"""OS autostart entries + single-instance guard.

Reference behaviors: tauri-plugin-autostart applied immediately by
change_autostart_setting (shortcut/mod.rs:598-622) and reconciled at
boot (lib.rs:219-228); tauri_plugin_single_instance surfaces the
running instance's main window and the second launch exits
(lib.rs:403-405).
"""

import json
import os
import plistlib
import subprocess
import sys

import pytest

from spittle_tpu.app.actions import ActionContext
from spittle_tpu.app.commands import Commands
from spittle_tpu.app.rpc_server import AppRpcServer
from spittle_tpu.app.services import AppServices
from spittle_tpu.app.single_instance import (
    SingleInstanceLock,
    notify_running_instance,
)
from spittle_tpu.pipeline import BufferTextOutput
from spittle_tpu.shell.autostart import AutostartManager, default_exec_cmd


class TestAutostartManager:
    def test_linux_desktop_entry_lifecycle(self, tmp_path):
        mgr = AutostartManager(
            ["/usr/bin/python3", "-m", "spittle_tpu.cli", "app"],
            home=str(tmp_path), platform="linux",
        )
        assert not mgr.is_enabled()
        mgr.enable()
        path = tmp_path / ".config" / "autostart" / "spittle-tpu.desktop"
        assert path.exists() and mgr.is_enabled()
        body = path.read_text()
        assert "[Desktop Entry]" in body
        assert "Exec=/usr/bin/python3 -m spittle_tpu.cli app" in body
        assert "Type=Application" in body
        mgr.disable()
        assert not path.exists() and not mgr.is_enabled()
        mgr.disable()  # idempotent

    def test_macos_launch_agent(self, tmp_path):
        cmd = default_exec_cmd(str(tmp_path / "data"))
        mgr = AutostartManager(cmd, home=str(tmp_path), platform="darwin")
        mgr.enable()
        path = (tmp_path / "Library" / "LaunchAgents"
                / "com.spittle-tpu.plist")
        assert path.exists()
        plist = plistlib.loads(path.read_bytes())
        assert plist["Label"] == "com.spittle-tpu"
        assert plist["RunAtLoad"] is True
        assert plist["ProgramArguments"] == cmd
        assert "--data-dir" in cmd

    def test_exec_quoting(self, tmp_path):
        mgr = AutostartManager(
            ["/opt/my python/bin/python", "-m", "spittle_tpu.cli", "app",
             "--data-dir", '/home/u/app "data"'],
            home=str(tmp_path), platform="linux",
        )
        mgr.enable()
        body = (tmp_path / ".config" / "autostart"
                / "spittle-tpu.desktop").read_text()
        assert 'Exec="/opt/my python/bin/python" -m' in body
        assert '"/home/u/app \\"data\\""' in body

    def test_reconcile_matches_setting(self, tmp_path):
        mgr = AutostartManager(home=str(tmp_path), platform="linux")
        mgr.reconcile(True)
        assert mgr.is_enabled()
        mgr.reconcile(False)
        assert not mgr.is_enabled()

    def test_change_autostart_setting_applies_immediately(self, tmp_path):
        # shortcut/mod.rs:598-622: the command both persists the flag
        # and flips the OS launcher in the same call.
        services = AppServices(str(tmp_path / "data"), use_mock_engine=True)
        services.autostart = AutostartManager(
            home=str(tmp_path), platform="linux")
        cmds = Commands(services, ActionContext(services, BufferTextOutput()))
        try:
            cmds.change_autostart_setting(True)
            assert services.get_settings().autostart_enabled
            assert services.autostart.is_enabled()
            cmds.change_autostart_setting(False)
            assert not services.get_settings().autostart_enabled
            assert not services.autostart.is_enabled()
        finally:
            services.shutdown()


class TestSingleInstance:
    def test_second_acquire_fails_while_held(self, tmp_path):
        a = SingleInstanceLock(str(tmp_path))
        assert a.acquire()
        a.publish(12345)
        # flock is process-scoped: probe from a real second process.
        probe = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r);"
             "from spittle_tpu.app.single_instance import SingleInstanceLock;"
             "lk = SingleInstanceLock(%r);"
             "print('acquired' if lk.acquire() else 'held', lk.peer_port())"
             % (os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), str(tmp_path))],
            capture_output=True, text=True, timeout=30,
        )
        assert probe.stdout.split() == ["held", "12345"], probe.stdout
        a.release()
        b = SingleInstanceLock(str(tmp_path))
        assert b.acquire()
        b.release()

    def test_lock_file_contents(self, tmp_path):
        lk = SingleInstanceLock(str(tmp_path))
        assert lk.acquire()
        lk.publish(47890)
        with open(os.path.join(str(tmp_path), "app.lock")) as f:
            data = json.load(f)
        assert data == {"pid": os.getpid(), "port": 47890}
        lk.release()

    def test_notify_running_instance_surfaces_console(self, tmp_path):
        # The plugin callback's show_main_window over our wire: the
        # second launch learns the console URL from the first.
        services = AppServices(str(tmp_path), use_mock_engine=True)
        actions = ActionContext(services, BufferTextOutput())
        server = AppRpcServer(Commands(services, actions), port=0)
        server.start()
        try:
            port = server.address[1]
            url = notify_running_instance(port)
            assert url == f"http://127.0.0.1:{port}/"
        finally:
            server.stop()
            services.shutdown()

    def test_notify_dead_peer_returns_none(self):
        assert notify_running_instance(1, timeout=0.5) is None


def test_notify_non_json_peer_returns_none():
    """A stale lock can point at a port now owned by something that
    answers 200 with non-JSON; the second launch must exit gracefully,
    not traceback."""
    import http.server
    import threading

    class Html(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = b"<html>not an rpc server</html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    httpd = http.server.HTTPServer(("127.0.0.1", 0), Html)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        assert notify_running_instance(httpd.server_address[1]) is None
    finally:
        httpd.shutdown()
