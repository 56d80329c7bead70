"""CLI smoke tests (the cmd/server analog): serve + one-shot
subcommands driven over a real subprocess, JSON wire round-trip
through the served port.
"""

from __future__ import annotations

import base64
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "proglog_spark", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_append_read_bounds_cli(tmp_path):
    path = str(tmp_path / "clilog")
    out = _run_cli(["append", "--path", path, "--create", "x", "y", "z"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "0 2"

    out = _run_cli(["read", "--path", path, "1"])
    assert out.stdout.strip().splitlines()[-1] == "1\ty\t0\t0"

    out = _run_cli(["bounds", "--path", path])
    assert out.stdout.strip().splitlines()[-1] == "lowest=0 highest=2 count=3"

    # the scripting error contract: canonical one-line string on
    # stderr + exit 2, not a traceback (api/v1/error.go analog)
    out = _run_cli(["read", "--path", path, "999"])
    assert out.returncode == 2
    assert out.stderr.strip().splitlines()[-1] == "OFFSET_OUT_OF_RANGE:999"

    # same contract for builtin misuse errors: a missing --path is a
    # one-line NOT_FOUND + exit 2, never a traceback
    out = _run_cli(["read", "--path", str(tmp_path / "nope"), "0"])
    assert out.returncode == 2
    last = out.stderr.strip().splitlines()[-1]
    assert last.startswith("NOT_FOUND:") and "Traceback" not in out.stderr


def test_serve_cli_roundtrip(tmp_path):
    path = str(tmp_path / "servelog")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "proglog_spark",
            "serve", "--path", path, "--create", "--port", "0",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        # read stdout on a helper thread: a bare readline() would block
        # past the deadline if the subprocess wedges without printing
        import queue
        import threading

        lines: queue.Queue = queue.Queue()

        def pump():
            for line in proc.stdout:
                lines.put(line)

        threading.Thread(target=pump, daemon=True).start()
        deadline = time.time() + 240
        addr = None
        while time.time() < deadline:
            try:
                line = lines.get(timeout=1)
            except queue.Empty:
                if proc.poll() is not None:
                    raise AssertionError("serve process died before binding")
                continue
            if line.startswith("SERVING "):
                addr = line.split()[1]
                break
        assert addr, "no SERVING line within deadline"

        def call(method, payload=None, q=""):
            req = urllib.request.Request(
                f"http://{addr}/{q}", method=method
            )
            data = json.dumps(payload).encode() if payload else None
            with urllib.request.urlopen(req, data=data, timeout=60) as r:
                return json.loads(r.read())

        v = base64.b64encode(b"cli-hello").decode()
        assert call("POST", {"record": {"value": v}}) == {"offset": 0}
        got = call("GET", q="?offset=0")
        assert base64.b64decode(got["record"]["value"]) == b"cli-hello"
    finally:
        proc.terminate()
        proc.wait(timeout=30)
