"""Typed engine errors.

Canonical string forms are part of the declared query contract
(FIXTURES.md §3.4): ``OFFSET_OUT_OF_RANGE:<k>`` and
``PERMISSION_DENIED`` — derived from the reference's error surface
(api/v1/error.go:14-15 → gRPC 404 "offset out of range: %d";
internal/server/server.go:101,112 → PermissionDenied).
"""

from __future__ import annotations


class ProglogError(Exception):
    """Base class for all engine errors."""

    def canonical(self) -> str:
        return str(self)


class OffsetOutOfRangeError(ProglogError):
    """Raised when a read targets an offset outside [lowest, highest].

    Mirrors the reference's ErrOffsetOutOfRange (api/v1/error.go:10-30),
    which carries the offending offset in the error payload.
    """

    def __init__(self, offset: int) -> None:
        self.offset = int(offset)
        super().__init__(f"OFFSET_OUT_OF_RANGE:{self.offset}")


class PermissionDeniedError(ProglogError):
    """Raised when the ACL gate rejects (subject, object, action).

    Mirrors the reference's Casbin deny → gRPC PermissionDenied
    (internal/auth/authorizer.go:20-27, internal/server/server.go:101).
    """

    def __init__(self, subject: str, obj: str, action: str) -> None:
        self.subject = subject
        self.object = obj
        self.action = action
        super().__init__("PERMISSION_DENIED")


class WriterLockHeldError(ProglogError):
    """Raised when a mutating LogTable call finds another live process
    holding the writer lock for the same path.

    Mirrors the reference's single-writer serialization (its per-log
    mutex, internal/log/log.go:81-82, plus one serving process per log
    dir) — here enforced *across* processes with a lock file in the
    log directory, since two independent drivers opening one path
    would otherwise mint duplicate offsets.
    """

    def __init__(self, path: str, owner: dict) -> None:
        self.path = path
        self.owner = dict(owner)
        super().__init__(
            f"WRITER_LOCK_HELD:{path} by pid={owner.get('pid')} "
            f"host={owner.get('host')} since={owner.get('acquired_at')} — "
            "call steal_writer_lock() only after confirming that writer "
            "is gone"
        )


class WriterLockLostError(WriterLockHeldError):
    """Raised when a writer that previously held the lock discovers —
    at its next mutating call — that its lease expired and another
    process took over (the fencing half of the lease protocol, the
    analog of a deposed Raft leader discovering a higher term,
    internal/log/distributed.go:99-131).

    The instance's writes must stop immediately: the new owner may
    already have minted offsets. Re-open the log to resume as a reader,
    or re-acquire once the new owner is gone.
    """

    def __init__(self, path: str, owner: dict) -> None:
        super().__init__(path, owner)
        # overwrite the HELD message with the fencing-specific one
        self.args = (
            f"WRITER_LOCK_LOST:{path} — lease expired and the lock is "
            f"now held by pid={owner.get('pid')} host={owner.get('host')} "
            f"since={owner.get('acquired_at')}; this writer is fenced",
        )
