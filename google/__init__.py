"""VENDORED STDLIB SHIM — see google/protobuf/__init__.py.

This repo-root ``google`` package exists ONLY to satisfy
``from google.protobuf import ...`` inside pyspark's generated
``StateMessage_pb2`` module (the transformWithStateInPandas wire
protocol) in an environment where the protobuf wheel cannot be
installed. It implements the public protobuf wire format
(https://protobuf.dev/programming-guides/encoding/) from scratch in
pure stdlib Python — nothing is copied from the protobuf project.

If the real ``protobuf`` distribution is ever installed, DELETE this
directory: living on sys.path ahead of site-packages, it would shadow
the real package.
"""
