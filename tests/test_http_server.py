"""HTTP edge tests — mirror the reference's server scenario table
(internal/server/server_test.go:40-59): produce/consume round-trip
with exact offsets, past-boundary 404 with the canonical error
payload, ACL deny for `nobody`, cluster metadata, and the batch
produce ack shape.
"""

from __future__ import annotations

import base64
import json
import urllib.request
from urllib.error import HTTPError

import pytest
from conftest import quiet_expected_aborts

from proglog_spark.engine import Engine
from proglog_spark.server import HttpLogServer


def _call(port, method, path, payload=None, subject=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method=method
    )
    req.add_header("Content-Type", "application/json")
    if subject:
        req.add_header("X-Subject", subject)
    data = json.dumps(payload).encode() if payload is not None else None
    with urllib.request.urlopen(req, data=data, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def _b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


@pytest.fixture(scope="module")
def served_engine(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("httplog") / "log")
    engine = Engine.create(spark, path, bucket_size=8)
    srv = HttpLogServer(engine)

    # VERDICT-r9 #6: urllib leaves keep-alive connections open, so at
    # module teardown a handler thread can hit ConnectionReset/
    # BrokenPipe mid-read and socketserver prints "Exception occurred
    # during processing of request" + traceback to stderr — expected
    # noise that genuine handler errors could then hide behind.
    quiet_expected_aborts(srv)
    host, port = srv.start()
    yield engine, port
    srv.stop()


def test_produce_consume_roundtrip(served_engine):
    _, port = served_engine
    st, out = _call(port, "POST", "/", {"record": {"value": _b64("hello")}})
    assert st == 200 and out == {"offset": 0}
    st, out = _call(port, "POST", "/", {"record": {"value": _b64("world")}})
    assert out == {"offset": 1}

    st, out = _call(port, "GET", "/?offset=1")
    assert st == 200
    rec = out["record"]
    assert base64.b64decode(rec["value"]).decode() == "world"
    assert (rec["offset"], rec["term"], rec["type"]) == (1, 0, 0)

    # the reference reads the offset from the GET body (http.go:55-58)
    st, out = _call(port, "GET", "/", {"offset": 0})
    assert base64.b64decode(out["record"]["value"]).decode() == "hello"


def test_batch_produce_and_bounds(served_engine):
    _, port = served_engine
    st, out = _call(
        port,
        "POST",
        "/",
        {"records": [{"value": _b64(v)} for v in ("a", "b", "c")]},
    )
    assert st == 200
    first, last = out["first_offset"], out["last_offset"]
    assert last - first == 2  # dense batch ack (O20 collapsed)

    st, out = _call(port, "GET", "/bounds")
    assert out["highest_offset"] == last
    assert out["count"] == last + 1


def test_consume_past_boundary_is_404(served_engine):
    _, port = served_engine
    with pytest.raises(HTTPError) as e:
        _call(port, "GET", "/?offset=999999")
    assert e.value.code == 404
    body = json.loads(e.value.read())
    assert body["error"] == "OFFSET_OUT_OF_RANGE:999999"


def test_unauthorized_subject_is_403(served_engine):
    _, port = served_engine
    with pytest.raises(HTTPError) as e:
        _call(
            port,
            "POST",
            "/",
            {"record": {"value": _b64("x")}},
            subject="nobody",
        )
    assert e.value.code == 403
    assert "PERMISSION_DENIED" in json.loads(e.value.read())["error"]

    with pytest.raises(HTTPError) as e:
        _call(port, "GET", "/?offset=0", subject="nobody")
    assert e.value.code == 403


def test_servers_metadata(served_engine):
    _, port = served_engine
    st, out = _call(port, "GET", "/servers")
    assert st == 200
    leaders = [s for s in out["servers"] if s["is_leader"]]
    assert len(leaders) == 1 and {"id", "rpc_addr"} <= set(leaders[0])


def test_malformed_request_is_400(served_engine):
    _, port = served_engine
    with pytest.raises(HTTPError) as e:
        _call(port, "POST", "/", {"record": {}})
    assert e.value.code == 400


def test_unknown_path_is_404(served_engine):
    _, port = served_engine
    with pytest.raises(HTTPError) as e:
        _call(port, "GET", "/health")
    assert e.value.code == 404
    assert "NOT_FOUND" in json.loads(e.value.read())["error"]


def test_unexpected_engine_error_is_500_json(served_engine, monkeypatch):
    """Engine/Spark failures must surface as a JSON 500 (the gRPC
    codes.Internal analog), never a dropped connection."""
    engine, port = served_engine
    monkeypatch.setattr(
        type(engine),
        "produce",
        lambda self, *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(HTTPError) as e:
        _call(port, "POST", "/", {"record": {"value": _b64("x")}})
    assert e.value.code == 500
    assert json.loads(e.value.read())["error"].startswith("INTERNAL:")

    monkeypatch.setattr(
        type(engine),
        "consume",
        lambda self, *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(HTTPError) as e:
        _call(port, "GET", "/?offset=0")
    assert e.value.code == 500
    assert json.loads(e.value.read())["error"].startswith("INTERNAL:")


def test_concurrent_producers_get_dense_offsets(served_engine):
    """The single-writer lock serializes racing HTTP producers: every
    append acks a distinct offset range and the final log is dense
    (the reference's exact-offset assertions under its stream
    round-trip, server_test.go:224-230, generalized to a race)."""
    import threading

    engine, port = served_engine
    pre_hi = engine.highest_offset()
    start = 0 if pre_hi is None else pre_hi + 1
    acked: list[tuple[int, int]] = []
    lock = threading.Lock()

    def produce(tag):
        st, out = _call(
            port,
            "POST",
            "/",
            {"records": [{"value": _b64(f"{tag}-{i}")} for i in range(3)]},
        )
        assert st == 200
        with lock:
            acked.append((out["first_offset"], out["last_offset"]))

    threads = [
        threading.Thread(target=produce, args=(t,)) for t in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    spans = sorted(acked)
    # batches are disjoint, contiguous, and jointly dense
    assert all(last - first == 2 for first, last in spans)
    flat = [o for first, last in spans for o in range(first, last + 1)]
    assert sorted(flat) == list(range(start, start + 12))
    assert engine.highest_offset() == start + 11


def test_metadata_routes_are_acl_gated(served_engine):
    """A subject the ACL denies reads to must not learn the log extent
    or the topology: /bounds and /servers answer 403, matching the
    module's 'ACL enforced per request' contract."""
    _, port = served_engine
    for path in ("/bounds", "/servers"):
        with pytest.raises(HTTPError) as e:
            _call(port, "GET", path, subject="nobody")
        assert e.value.code == 403, path


def test_post_to_non_produce_route_is_404(served_engine):
    """POST is only a produce on the produce routes: a health probe or
    client posting to /bounds must get 404, not append a record to the
    append-only log."""
    _, port = served_engine
    _, before = _call(port, "GET", "/bounds")
    with pytest.raises(HTTPError) as e:
        _call(port, "POST", "/bounds", {"record": {"value": _b64("junk")}})
    assert e.value.code == 404
    _, after = _call(port, "GET", "/bounds")
    assert after["count"] == before["count"]

def test_wrong_shape_json_is_400_not_500(served_engine):
    """Well-formed JSON of the wrong SHAPE (array body, non-string
    value) is a client error: 400 BAD_REQUEST, never 500 INTERNAL."""
    _engine, port = served_engine
    for payload in ([1, 2, 3], {"record": {"value": 5}}):
        with pytest.raises(HTTPError) as e:
            _call(port, "POST", "/", payload)
        assert e.value.code == 400
        assert json.loads(e.value.read())["error"].startswith("BAD_REQUEST")
