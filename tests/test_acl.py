"""ACL gate tests — mirrors the reference's two-identity pattern
(internal/server/server_test.go:286-308: root allowed, nobody denied).
"""

import pytest

from proglog_spark.acl import CONSUME, DEFAULT_POLICY, PRODUCE, Authorizer
from proglog_spark.errors import PermissionDeniedError


def test_root_allowed():
    auth = Authorizer(DEFAULT_POLICY)
    auth.authorize("root", "mylog", PRODUCE)
    auth.authorize("root", "mylog", CONSUME)


def test_nobody_denied():
    auth = Authorizer(DEFAULT_POLICY)
    for action in (PRODUCE, CONSUME):
        with pytest.raises(PermissionDeniedError) as ei:
            auth.authorize("nobody", "mylog", action)
        assert str(ei.value) == "PERMISSION_DENIED"


def test_object_scoped_rule():
    auth = Authorizer([("alice", "log-a", PRODUCE)])
    assert auth.is_allowed("alice", "log-a", PRODUCE)
    assert not auth.is_allowed("alice", "log-b", PRODUCE)
    assert not auth.is_allowed("alice", "log-a", CONSUME)
