"""Minimal pure-stdlib protobuf runtime (wire-format shim).

WHY THIS EXISTS. Spark 4.1's ``transformWithStateInPandas`` — the
arbitrary-state successor to ``applyInPandasWithState`` — talks to the
JVM state server over a protobuf protocol: pyspark ships the GENERATED
module (``pyspark/sql/streaming/proto/StateMessage_pb2.py``) but not
the protobuf RUNTIME it imports, and this container has no network to
install one. The protocol surface pyspark actually uses is small and
closed (keyword-constructed messages, scalar field assignment, lazy
submessage access, ``SerializeToString``/``ParseFromString``, repeated
message fields, top-level enum constants), so this package implements
exactly that from the PUBLIC protobuf encoding spec
(https://protobuf.dev/programming-guides/encoding/) and the public
``descriptor.proto`` field numbers — a few hundred lines of stdlib
Python, the same no-codec-library discipline as the repo's PNG/GIF
pixel decoders.

WHAT IT IS NOT. This is not the google protobuf library and does not
pretend to be: no reflection API, no JSON/text format, no extensions,
no unknown-field retention, no C descriptors. It is sufficient for —
and unit-tested against — the ``StateMessage`` protocol only (the
generated module builds real working message classes through
``descriptor_pool.Default().AddSerializedFile`` + ``internal.builder``,
so every field number and type comes from the descriptor blob pyspark
ships, not from hand transcription). Wire-format correctness is pinned
two ways in tests/test_protoshim.py: golden byte vectors computed from
the spec, and a live end-to-end transformWithStateInPandas drain whose
JVM side parses every request with the real (Java) protobuf.

If the real ``protobuf`` wheel is ever installed, delete the repo-root
``google/`` directory — it shadows site-packages by sys.path order.
"""

from __future__ import annotations

__version__ = "0.0-stdlib-wire-shim"
