"""mTLS transport identity — peer-certificate CN as the ACL subject.

Re-expresses the reference's TLS setup (internal/config/tls.go:18-46
``SetupTLSConfig``: CertFile/KeyFile load the endpoint's pair; CAFile
becomes RootCAs on clients and ClientCAs + RequireAndVerifyClientCert
on servers) and its identity extraction (internal/server/server.go:
162-174 ``subject()`` reads the verified peer chain's leaf CN, which
the interceptor stores for the ACL gate).

Built entirely on the stdlib ``ssl`` module: ``build_ssl_context``
maps the same three files to an ``SSLContext``, and
``peer_common_name`` pulls the CN out of a completed handshake's
verified peer cert. ``HttpLogServer`` accepts a server-side
``TLSConfig`` and, when mutual auth is on, uses the CN as the request
subject — the ``X-Subject`` header then carries no authority (it
remains the documented dev-mode stand-in for plaintext servers only).
"""

from __future__ import annotations

import ssl
from dataclasses import dataclass


@dataclass(frozen=True)
class TLSConfig:
    """The reference's TLSConfig struct (internal/config/tls.go:10-16).

    ``cert_file``/``key_file``: this endpoint's certificate pair.
    ``ca_file``: trust root — verifies the peer (server cert on
    clients; client certs on servers, where setting it REQUIRES a
    verified client cert, i.e. mutual TLS).
    ``server``: build a server-side context.
    ``server_address``: client-side expected server hostname (maps to
    the reference's ServerAddress / Go's ServerName).
    """

    cert_file: str | None = None
    key_file: str | None = None
    ca_file: str | None = None
    server: bool = False
    server_address: str | None = None


def build_ssl_context(cfg: TLSConfig) -> ssl.SSLContext:
    """``SetupTLSConfig`` (tls.go:18-46), stdlib-ssl edition."""
    if cfg.server:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        if not (cfg.cert_file and cfg.key_file):
            raise ValueError("server TLS requires cert_file and key_file")
        ctx.load_cert_chain(cfg.cert_file, cfg.key_file)
        if cfg.ca_file:
            # tls.RequireAndVerifyClientCert (tls.go:40-43): mutual TLS
            ctx.load_verify_locations(cfg.ca_file)
            ctx.verify_mode = ssl.CERT_REQUIRED
        return ctx
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    if cfg.ca_file:
        ctx.load_verify_locations(cfg.ca_file)
    else:
        # the reference leaves RootCAs nil → Go falls back to system
        # roots; mirror that (an empty trust store with CERT_REQUIRED
        # would fail EVERY handshake)
        ctx.load_default_certs()
    if cfg.server_address:
        # the VALUE is enforced by wrap_client_socket (ssl pins the
        # expected name per-connection, not per-context): wrapping a
        # raw socket without it would verify against whatever name the
        # transport dialed, not the configured one
        ctx.check_hostname = True
    else:
        # CN-identity mode (the reference's mutual-TLS-between-known-
        # peers shape): the chain is still CA-verified, but no hostname
        # is pinned — set server_address to also pin the server's name
        ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_REQUIRED
    if cfg.cert_file and cfg.key_file:
        ctx.load_cert_chain(cfg.cert_file, cfg.key_file)
    return ctx


def wrap_client_socket(cfg: TLSConfig, sock, server_hostname: str | None = None):
    """Client-side TLS wrap that ENFORCES ``cfg.server_address``.

    ssl pins the expected server name per connection (the
    ``server_hostname`` argument), not per context — a raw
    ``ctx.wrap_socket(sock)`` with ``server_address`` configured would
    either raise (check_hostname needs a name) or, via a
    transport-supplied name, verify against whatever host was dialed
    instead of the configured one (Go's ServerName semantics,
    tls.go:33-35). ``server_hostname`` overrides per call when one
    config talks to several addresses."""
    ctx = build_ssl_context(cfg)
    name = server_hostname or cfg.server_address
    return ctx.wrap_socket(sock, server_hostname=name)


def peer_common_name(sock) -> str | None:
    """The verified peer cert's subject CN (server.go:170-171 reads
    ``tlsInfo.State.VerifiedChains[0][0].Subject.CommonName``).

    Returns None when the socket is not TLS, no client cert was
    presented (verify_mode below CERT_REQUIRED), or the cert has no
    CN. ``getpeercert()`` only returns a dict for certs the handshake
    VERIFIED against the context's CAs, so a non-None CN is an
    authenticated identity, not a client-asserted one.
    """
    getpeercert = getattr(sock, "getpeercert", None)
    if getpeercert is None:
        return None
    cert = getpeercert()
    if not cert:
        return None
    for rdn in cert.get("subject", ()):
        for key, value in rdn:
            if key == "commonName":
                return value
    return None
