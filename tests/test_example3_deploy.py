"""Example3 deployment smoke (DEPLOY.md, reference README:347-418):
run examples/example3.py as a REAL subprocess — its own driver JVM,
exactly what spark-submit does in client mode — against a mock broker,
and assert the full loop: NGSI notification in → windowed min → HTTP
write-back to <broker>/v2/entities/<id>/attrs.

The only code delta vs example2 is the --broker flag (Example3.scala:13
— environment addressing is configuration), which this test overrides
to the mock's address."""

from __future__ import annotations

import http.server
import json
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
from tests.fixtures import flat_payload  # noqa: E402


class _BrokerHandler(http.server.BaseHTTPRequestHandler):
    captured: list = []

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        type(self).captured.append((self.path, self.rfile.read(n).decode()))
        self.send_response(204)
        self.end_headers()

    def log_message(self, *a):
        pass


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_example3_smoke_against_mock_broker(tmp_path):
    _BrokerHandler.captured = []
    broker = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _BrokerHandler)
    threading.Thread(target=broker.serve_forever, daemon=True).start()
    notify_port = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable,
            str(REPO / "examples" / "example3.py"),
            "--port",
            str(notify_port),
            "--spool",
            str(tmp_path / "spool"),
            "--broker",
            f"http://127.0.0.1:{broker.server_port}",
        ],
        cwd=str(REPO),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    stop = threading.Event()

    def pump():
        # keep notifying until the pipeline's write-back lands; retries
        # cover the receiver's startup window
        i = 0
        while not stop.is_set():
            body = flat_payload(20.0 + (i % 7), 700.0 + i)
            req = urllib.request.Request(
                f"http://127.0.0.1:{notify_port}/notify",
                data=body.encode(),
                headers={
                    "Content-Type": "application/json",
                    "Fiware-Service": "demo",
                    "Fiware-ServicePath": "/test",
                },
            )
            try:
                urllib.request.urlopen(req, timeout=2)
            except OSError:
                pass
            i += 1
            stop.wait(0.5)

    pumper = threading.Thread(target=pump, daemon=True)
    pumper.start()
    try:
        deadline = time.time() + 150
        while time.time() < deadline and not _BrokerHandler.captured:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                pytest.fail(f"example3 exited early rc={proc.returncode}:\n{out[-4000:]}")
            time.sleep(0.5)
        assert _BrokerHandler.captured, "no write-back reached the mock broker"
        path, body = _BrokerHandler.captured[0]
        assert path.startswith("/v2/entities/") and path.endswith("/attrs")
        doc = json.loads(body)
        assert doc["temperature_min"]["type"] == "Float"
        assert isinstance(doc["temperature_min"]["value"], (int, float))
    finally:
        stop.set()
        proc.send_signal(signal.SIGINT)  # run_until_interrupt's clean path
        try:
            proc.wait(30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(10)
        broker.shutdown()
