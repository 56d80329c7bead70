"""gRPC API edge for the log engine (reference api/v1/log.proto).

Three layers, so everything that CAN be tested without grpcio IS:

- ``wire``   — pure-Python proto3 wire-format codec for the exact
  messages in `/root/reference/api/v1/log.proto:7-47` (field numbers
  and types preserved, so the bytes interoperate with any generated
  client stub).
- ``service`` — transport-independent RPC semantics over ``Engine``
  (`internal/server/server.go:100-158`): ACL gate per call, the
  404-with-offset error contract, per-request stream acks,
  tail-follow ConsumeStream.
- ``server`` — a thin grpcio binding (generic method handlers over
  the wire codec). Imported lazily: environments without ``grpcio``
  get the first two layers and a clear ImportError from the third.
"""

from proglog_spark.grpc_api import wire
from proglog_spark.grpc_api.service import LogService, RpcError

__all__ = ["LogService", "RpcError", "wire"]
