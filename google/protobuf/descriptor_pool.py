"""Facade: ``Default().AddSerializedFile(blob)`` parses the embedded
FileDescriptorProto with the shim's own wire decoder and returns a
FileDescriptorMini (settable attributes included, for the generated
module's ``_loaded_options`` / ``_serialized_*`` bookkeeping)."""

from __future__ import annotations

from . import _shim_runtime as rt


class DescriptorPool:
    def __init__(self):
        self._files: dict[str, rt.FileDescriptorMini] = {}

    def AddSerializedFile(self, data: bytes):  # noqa: N802
        fdp = rt.parse_file_descriptor(bytes(data))
        self._files[fdp.name] = fdp
        return fdp


_DEFAULT = DescriptorPool()


def Default() -> DescriptorPool:  # noqa: N802
    return _DEFAULT
