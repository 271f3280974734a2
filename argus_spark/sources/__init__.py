"""Source connectors (SURVEY §2.A A1-A4, §2.B B1-B2).

The reference's three chain providers (N2C socket, N2N mini-protocol,
gRPC/UtxoRPC) all reduce to the same abstraction: *an ordered,
checkpoint-resumable stream of RollForward/RollBack events*. Here that
abstraction is a Spark source: a file-feed directory for Structured
Streaming (one JSON file per push, Kafka-shaped ordering), plus batch
readers with declared schemas and a binary-fixture reader with a gated
CBOR decode (A4).
"""
