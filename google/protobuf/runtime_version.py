"""Facade: the generated module validates the runtime version at import
time. The shim implements the frozen wire format, which is version-
independent, so validation is a no-op."""

from __future__ import annotations

import enum


class Domain(enum.Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(  # noqa: N802 (protobuf API name)
    domain, major, minor, patch, suffix, location
) -> None:
    return None
