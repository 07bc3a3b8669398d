"""Operator-console contract: the web UI only calls commands that exist.

Parses app/web/index.html for every rpc("...") invocation and asserts
each camelCase name resolves to a real Commands method (the same
dispatch the RPC server uses), that GET / serves the page, and that the
events the page subscribes to are real emitted event names (SURVEY
§2.7). Guards against the UI and the command surface drifting apart —
the role bindings.ts's generated types play for the reference frontend.
"""

import os
import re

import pytest

WEB = os.path.join(
    os.path.dirname(__file__), "..", "spittle_tpu", "app", "web",
    "index.html",
)


@pytest.fixture(scope="module")
def page():
    with open(WEB, encoding="utf-8") as f:
        return f.read()


def test_all_rpc_calls_resolve(page):
    from spittle_tpu.app.commands import Commands
    from spittle_tpu.app.rpc_server import _camel_to_snake

    called = set(re.findall(r"""rpc\(\s*['"](\w+)['"]""", page))
    assert len(called) >= 12, called  # the console drives a real surface
    for name in called:
        snake = _camel_to_snake(name)
        assert hasattr(Commands, snake), f"UI calls unknown command {name}"


def test_subscribed_events_are_real(page):
    import spittle_tpu.events as ev

    emitted = {
        v for k, v in vars(ev).items()
        if k.isupper() and isinstance(v, str)
    } | {"tray-state-changed"}
    subscribed = set(re.findall(r"""on\(\s*['"]([\w-]+)['"]""", page))
    assert "mic-level" in subscribed and "model-download-progress" in subscribed
    unknown = subscribed - emitted
    assert not unknown, f"UI listens to events nothing emits: {unknown}"


def test_server_serves_the_page(tmp_path):
    import json
    import urllib.request

    from spittle_tpu.app.actions import ActionContext
    from spittle_tpu.app.commands import Commands
    from spittle_tpu.app.rpc_server import AppRpcServer
    from spittle_tpu.app.services import AppServices
    from spittle_tpu.pipeline import BufferTextOutput

    services = AppServices(str(tmp_path), use_mock_engine=True)
    server = AppRpcServer(
        Commands(services, ActionContext(services, BufferTextOutput()))
    )
    server.start()
    try:
        html = urllib.request.urlopen(
            f"{server.url}/", timeout=5
        ).read().decode()
        assert "SPITTLE" in html and "rpc(" in html
        # one of the page's first calls, end to end through the dispatch
        req = urllib.request.Request(
            f"{server.url}/rpc",
            data=json.dumps({"cmd": "getAppSettings"}).encode(),
        )
        out = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert out["ok"] and "push_to_talk" in out["result"]
    finally:
        server.stop()
