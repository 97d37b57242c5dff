"""Facade for the generated module's ``from google.protobuf import
descriptor as _descriptor`` — only ``_USE_C_DESCRIPTORS`` is read (to
decide whether to assign ``_serialized_start`` bookkeeping onto the
descriptor objects, which our minis accept as plain attributes)."""

from __future__ import annotations

_USE_C_DESCRIPTORS = False
