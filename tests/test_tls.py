"""mTLS transport identity — ACL over REAL verified client certs.

Mirrors the reference's TLS test posture: its server test builds a
root client and a "nobody" client from per-CN cert pairs and asserts
the nobody client is denied (internal/server/server_test.go:286-308,
cert wiring at :86-118 via config.SetupTLSConfig, tls.go:18-46). The
CA, server cert, and the two client certs here are generated
in-process with ``cryptography`` (the test-only CertFactory analog —
the library itself uses only stdlib ``ssl``).
"""

from __future__ import annotations

import base64
import datetime
import ipaddress
import json
import ssl
import urllib.request
from urllib.error import HTTPError

import pytest

cryptography = pytest.importorskip("cryptography")

from cryptography import x509  # noqa: E402
from cryptography.hazmat.primitives import hashes, serialization  # noqa: E402
from cryptography.hazmat.primitives.asymmetric import ec  # noqa: E402
from cryptography.x509.oid import NameOID  # noqa: E402

from conftest import quiet_expected_aborts  # noqa: E402

from proglog_spark.engine import Engine  # noqa: E402
from proglog_spark.server import HttpLogServer  # noqa: E402
from proglog_spark.tlsconfig import TLSConfig, build_ssl_context  # noqa: E402


def _pem_key(key) -> bytes:
    return key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )


def _builder(subject_cn: str, issuer_name, public_key):
    now = datetime.datetime.now(datetime.timezone.utc)
    return (
        x509.CertificateBuilder()
        .subject_name(
            x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, subject_cn)])
        )
        .issuer_name(issuer_name)
        .public_key(public_key)
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(hours=1))
    )


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    """CA + server cert (127.0.0.1) + client certs for CNs root/nobody."""
    d = tmp_path_factory.mktemp("tls")
    ca_key = ec.generate_private_key(ec.SECP256R1())
    ca_name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "proglog-test-ca")]
    )
    ca_cert = (
        _builder("proglog-test-ca", ca_name, ca_key.public_key())
        .add_extension(x509.BasicConstraints(ca=True, path_length=None), critical=True)
        .sign(ca_key, hashes.SHA256())
    )
    out = {"ca": str(d / "ca.pem")}
    (d / "ca.pem").write_bytes(ca_cert.public_bytes(serialization.Encoding.PEM))

    def issue(cn: str, server: bool = False) -> None:
        key = ec.generate_private_key(ec.SECP256R1())
        b = _builder(cn, ca_name, key.public_key())
        if server:
            b = b.add_extension(
                x509.SubjectAlternativeName(
                    [
                        x509.DNSName("localhost"),
                        x509.IPAddress(ipaddress.IPv4Address("127.0.0.1")),
                    ]
                ),
                critical=False,
            )
        cert = b.sign(ca_key, hashes.SHA256())
        (d / f"{cn}.pem").write_bytes(cert.public_bytes(serialization.Encoding.PEM))
        (d / f"{cn}-key.pem").write_bytes(_pem_key(key))
        out[cn] = str(d / f"{cn}.pem")
        out[f"{cn}-key"] = str(d / f"{cn}-key.pem")

    issue("127.0.0.1", server=True)
    issue("root")
    issue("nobody")
    return out


@pytest.fixture(scope="module")
def tls_server(spark, tmp_path_factory, certs):
    path = str(tmp_path_factory.mktemp("tlslog") / "log")
    engine = Engine.create(spark, path, bucket_size=8)
    srv = HttpLogServer(
        engine,
        tls=TLSConfig(
            cert_file=certs["127.0.0.1"],
            key_file=certs["127.0.0.1-key"],
            ca_file=certs["ca"],  # ⇒ RequireAndVerifyClientCert
            server=True,
        ),
    )
    # expected aborts: the no-cert handshake test makes the lazy
    # per-connection handshake raise SSLError in the handler thread
    # (transport-level rejection IS the asserted behavior); plus the
    # usual keep-alive teardown resets (VERDICT-r9 #6)
    quiet_expected_aborts(srv, ssl.SSLError)
    host, port = srv.start()
    yield certs, port
    srv.stop()


def _client_ctx(certs, cn: str | None) -> ssl.SSLContext:
    return build_ssl_context(
        TLSConfig(
            cert_file=certs[cn] if cn else None,
            key_file=certs[f"{cn}-key"] if cn else None,
            ca_file=certs["ca"],
            server_address="127.0.0.1",
        )
    )


def _call(certs, port, cn, method, path, payload=None, headers=None):
    req = urllib.request.Request(
        f"https://127.0.0.1:{port}{path}", method=method
    )
    req.add_header("Content-Type", "application/json")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    data = json.dumps(payload).encode() if payload is not None else None
    ctx = _client_ctx(certs, cn)
    with urllib.request.urlopen(req, data=data, timeout=30, context=ctx) as r:
        return r.status, json.loads(r.read())


def _b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


def test_root_client_produce_consume_over_mtls(tls_server):
    """The authorized CN round-trips (server_test.go:177-245 shape)."""
    certs, port = tls_server
    status, resp = _call(
        certs, port, "root", "POST", "/", {"record": {"value": _b64("hello")}}
    )
    assert status == 200
    off = resp["offset"]
    status, resp = _call(certs, port, "root", "GET", f"/?offset={off}")
    assert status == 200
    assert base64.b64decode(resp["record"]["value"]) == b"hello"


def test_nobody_client_is_denied(tls_server):
    """An authenticated-but-unauthorized CN gets PERMISSION_DENIED
    (server_test.go:286-308)."""
    certs, port = tls_server
    for method, path, payload in (
        ("POST", "/", {"record": {"value": _b64("x")}}),
        ("GET", "/?offset=0", None),
    ):
        with pytest.raises(HTTPError) as e:
            _call(certs, port, "nobody", method, path, payload)
        assert e.value.code == 403
        assert json.loads(e.value.read())["error"] == "PERMISSION_DENIED"


def test_x_subject_header_carries_no_authority_under_mtls(tls_server):
    """Identity is the verified cert CN, not a client-asserted header:
    nobody + 'X-Subject: root' is still nobody."""
    certs, port = tls_server
    with pytest.raises(HTTPError) as e:
        _call(
            certs,
            port,
            "nobody",
            "POST",
            "/",
            {"record": {"value": _b64("x")}},
            headers={"X-Subject": "root"},
        )
    assert e.value.code == 403


def test_client_without_cert_fails_handshake(tls_server):
    """RequireAndVerifyClientCert: no client cert ⇒ no connection at
    all (transport-level rejection, before any HTTP/ACL logic)."""
    certs, port = tls_server
    with pytest.raises((ssl.SSLError, ConnectionError, HTTPError, OSError)):
        _call(certs, port, None, "GET", "/?offset=0")


def test_server_context_requires_cert_pair():
    with pytest.raises(ValueError):
        build_ssl_context(TLSConfig(server=True))

def test_server_auth_only_tls_gives_header_no_authority(spark, tmp_path_factory, certs):
    """Server-auth-only TLS (no ca_file ⇒ client unauthenticated):
    the dev-mode X-Subject header must carry NO authority — the
    subject is empty and the default policy denies it. Only plaintext
    servers honor the header."""
    path = str(tmp_path_factory.mktemp("tlsnoca") / "log")
    engine = Engine.create(spark, path, bucket_size=8)
    srv = HttpLogServer(
        engine,
        tls=TLSConfig(
            cert_file=certs["127.0.0.1"],
            key_file=certs["127.0.0.1-key"],
            server=True,  # no ca_file: encrypt, don't authenticate
        ),
    )
    host, port = srv.start()
    try:
        # client verifies the server but presents no cert
        ctx = _client_ctx(certs, None)
        req = urllib.request.Request(
            f"https://127.0.0.1:{port}/", method="POST"
        )
        req.add_header("Content-Type", "application/json")
        req.add_header("X-Subject", "root")  # must be ignored
        data = json.dumps({"record": {"value": _b64("x")}}).encode()
        with pytest.raises(HTTPError) as e:
            urllib.request.urlopen(req, data=data, timeout=30, context=ctx)
        assert e.value.code == 403
        assert json.loads(e.value.read())["error"] == "PERMISSION_DENIED"
    finally:
        srv.stop()
