"""Allow-list authorization gate.

Re-expresses the reference's Casbin ACL model
(internal/auth/authorizer.go:20-27; model test/model.conf with request
``(sub, obj, act)`` and allow-list matching; policy test/policy.csv
``root,*,produce`` / ``root,*,consume``). The reference enforces the
gate in front of every Produce/Consume RPC
(internal/server/server.go:101,112) and denies with gRPC
PermissionDenied — here a policy is a set of (subject, object, action)
rows with ``*`` wildcards, and a deny raises PermissionDeniedError
("PERMISSION_DENIED", FIXTURES.md §3.4).

This is driver-side engine logic (plain Python, O(1) per check) — not
a Spark job; data-plane operators call ``authorize`` before building
their DataFrames, mirroring where the reference places the check.
"""

from __future__ import annotations

from collections.abc import Iterable

from proglog_spark.errors import PermissionDeniedError

PRODUCE = "produce"
CONSUME = "consume"

# Canonical fixture policy — mirrors reference test/policy.csv.
DEFAULT_POLICY = [
    ("root", "*", PRODUCE),
    ("root", "*", CONSUME),
]


class Authorizer:
    def __init__(self, policy: Iterable[tuple[str, str, str]] = DEFAULT_POLICY) -> None:
        self._rules = set(tuple(r) for r in policy)

    def is_allowed(self, subject: str, obj: str, action: str) -> bool:
        for s in (subject, "*"):
            for o in (obj, "*"):
                for a in (action, "*"):
                    if (s, o, a) in self._rules:
                        return True
        return False

    def authorize(self, subject: str, obj: str, action: str) -> None:
        """Raise PermissionDeniedError unless the request is allowed
        (reference authorizer.go:20-27 returns PermissionDenied status)."""
        if not self.is_allowed(subject, obj, action):
            raise PermissionDeniedError(subject, obj, action)
