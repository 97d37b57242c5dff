"""Facade for the generated module's two builder calls.

``BuildMessageAndEnumDescriptors`` exposes ``_MESSAGENAME`` descriptor
globals (the generated module assigns ``_serialized_start``/``_end``
onto them); ``BuildTopDescriptorsAndMessages`` creates the concrete
message classes and hoists top-level enum VALUES to module globals —
the two namespace conventions generated protobuf code relies on."""

from __future__ import annotations

from .. import _shim_runtime as rt


def _descriptor_globals(md: rt.MessageDescriptorMini, prefix: str, out):
    key = f"_{prefix}{md.name.upper()}"
    out[key] = md
    for em in md.enum_types:
        out[f"_{prefix}{md.name.upper()}_{em.name.upper()}"] = em
    for nested in md.nested_types:
        _descriptor_globals(nested, f"{prefix}{md.name.upper()}_", out)


def BuildMessageAndEnumDescriptors(file_des, message_globals):  # noqa: N802
    for md in file_des.message_types:
        _descriptor_globals(md, "", message_globals)
    for em in file_des.enum_types:
        message_globals[f"_{em.name.upper()}"] = em


def BuildTopDescriptorsAndMessages(  # noqa: N802
    file_des, module_name, message_globals
):
    message_globals["DESCRIPTOR"] = file_des
    for md in file_des.message_types:
        message_globals[md.name] = rt.build_message_class(md)
    for em in file_des.enum_types:
        # proto3 scopes enum values to the enclosing namespace: values of
        # a top-level enum are module-level constants
        message_globals[em.name] = type(em.name, (), dict(em.values))
        for vname, vnum in em.values.items():
            message_globals[vname] = vnum
