"""The shim's engine: wire codecs, a FileDescriptorProto parser, and a
dynamic message-class factory.

Everything here derives from two public documents:

- the protobuf ENCODING spec (varint / 64-bit / length-delimited /
  32-bit wire types, tag = field_number << 3 | wire_type):
  https://protobuf.dev/programming-guides/encoding/
- the field numbers of ``descriptor.proto`` (FileDescriptorProto and
  friends), which are frozen public API:
  https://github.com/protocolbuffers/protobuf/blob/main/src/google/protobuf/descriptor.proto

The generated ``StateMessage_pb2`` hands us its embedded serialized
FileDescriptorProto; we parse it with our own wire decoder (the
decoder's first real workload is protobuf's own schema language) and
build message classes whose field numbers/types therefore come from
pyspark's descriptor blob, never from hand transcription.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# wire codecs
# --------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1

# FieldDescriptorProto.Type values (descriptor.proto, public)
T_DOUBLE = 1
T_FLOAT = 2
T_INT64 = 3
T_UINT64 = 4
T_INT32 = 5
T_FIXED64 = 6
T_FIXED32 = 7
T_BOOL = 8
T_STRING = 9
T_GROUP = 10  # unsupported (proto2 legacy)
T_MESSAGE = 11
T_BYTES = 12
T_UINT32 = 13
T_ENUM = 14
T_SFIXED32 = 15
T_SFIXED64 = 16
T_SINT32 = 17
T_SINT64 = 18

# label values
L_OPTIONAL = 1
L_REQUIRED = 2
L_REPEATED = 3

_VARINT_TYPES = {
    T_INT64,
    T_UINT64,
    T_INT32,
    T_UINT32,
    T_BOOL,
    T_ENUM,
    T_SINT32,
    T_SINT64,
}
_FIXED64_TYPES = {T_DOUBLE, T_FIXED64, T_SFIXED64}
_FIXED32_TYPES = {T_FLOAT, T_FIXED32, T_SFIXED32}
_LEN_TYPES = {T_STRING, T_BYTES, T_MESSAGE}

# wire types
W_VARINT = 0
W_FIXED64 = 1
W_LEN = 2
W_FIXED32 = 5


def wire_type_for(ftype: int) -> int:
    if ftype in _VARINT_TYPES:
        return W_VARINT
    if ftype in _FIXED64_TYPES:
        return W_FIXED64
    if ftype in _FIXED32_TYPES:
        return W_FIXED32
    if ftype in _LEN_TYPES:
        return W_LEN
    raise ValueError(f"unsupported field type {ftype}")


def encode_varint(out: bytearray, value: int) -> None:
    """Unsigned base-128 varint (LSB groups first, MSB = continuation)."""
    if value < 0:
        raise ValueError("encode_varint takes unsigned values")
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return


def encode_signed_as_varint(out: bytearray, value: int) -> None:
    """int32/int64/enum negatives go on the wire as 64-bit two's
    complement (always 10 bytes when negative) — spec §signed-integers."""
    encode_varint(out, value & _MASK64)


def zigzag(value: int) -> int:
    return ((value << 1) ^ (value >> 63)) & _MASK64


def unzigzag(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def encode_tag(out: bytearray, number: int, wtype: int) -> None:
    encode_varint(out, (number << 3) | wtype)


def skip_field(data: bytes, pos: int, wtype: int) -> int:
    if wtype == W_VARINT:
        _, pos = decode_varint(data, pos)
        return pos
    if wtype == W_FIXED64:
        return pos + 8
    if wtype == W_FIXED32:
        return pos + 4
    if wtype == W_LEN:
        n, pos = decode_varint(data, pos)
        return pos + n
    raise ValueError(f"cannot skip wire type {wtype}")


def _to_signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


# --------------------------------------------------------------------------
# minimal descriptors
# --------------------------------------------------------------------------


class FieldDescriptorMini:
    __slots__ = (
        "name",
        "number",
        "label",
        "type",
        "type_name",
        "message_type",
        "enum_type",
        "tag_bytes",
    )

    def __init__(self, name="", number=0, label=L_OPTIONAL, ftype=0,
                 type_name=""):
        self.name = name
        self.number = number
        self.label = label
        self.type = ftype
        self.type_name = type_name
        self.message_type = None  # resolved MessageDescriptorMini
        self.enum_type = None
        # lazily cached encoded (number << 3 | wire_type) varint — the
        # tag is a per-field constant, so serializers append cached
        # bytes instead of re-encoding it per message (hot path: one
        # message per TWS state round-trip)
        self.tag_bytes = None

    @property
    def is_repeated(self) -> bool:
        return self.label == L_REPEATED


class MessageDescriptorMini:
    """Settable-attribute descriptor (the generated module assigns
    ``_serialized_start``/``_serialized_end`` onto these)."""

    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.fields: list[FieldDescriptorMini] = []
        self.fields_by_name: dict[str, FieldDescriptorMini] = {}
        self.fields_by_number: dict[int, FieldDescriptorMini] = {}
        self.nested_types: list[MessageDescriptorMini] = []
        self.enum_types: list[EnumDescriptorMini] = []
        self._concrete_class = None

    def add_field(self, fd: FieldDescriptorMini) -> None:
        self.fields.append(fd)
        self.fields_by_name[fd.name] = fd
        self.fields_by_number[fd.number] = fd


class EnumDescriptorMini:
    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.values: dict[str, int] = {}


class FileDescriptorMini:
    def __init__(self):
        self.name = ""
        self.package = ""
        self.message_types: list[MessageDescriptorMini] = []
        self.enum_types: list[EnumDescriptorMini] = []
        self.types_by_full_name: dict[str, object] = {}


# ---- FileDescriptorProto parsing (descriptor.proto field numbers) ----


def _iter_fields(data: bytes):
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = decode_varint(data, pos)
        number, wtype = key >> 3, key & 7
        if wtype == W_VARINT:
            value, pos = decode_varint(data, pos)
        elif wtype == W_LEN:
            ln, pos = decode_varint(data, pos)
            value = data[pos : pos + ln]
            if len(value) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wtype == W_FIXED64:
            value = data[pos : pos + 8]
            pos += 8
        elif wtype == W_FIXED32:
            value = data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype} in descriptor")
        yield number, value


def _parse_enum(data: bytes, prefix: str) -> EnumDescriptorMini:
    ed = EnumDescriptorMini("", "")
    for num, val in _iter_fields(data):
        if num == 1:  # name
            ed.name = val.decode("utf-8")
        elif num == 2:  # value (EnumValueDescriptorProto)
            vname, vnum = "", 0
            for n2, v2 in _iter_fields(val):
                if n2 == 1:
                    vname = v2.decode("utf-8")
                elif n2 == 2:
                    vnum = _to_signed64(v2)
            ed.values[vname] = vnum
    ed.full_name = f"{prefix}.{ed.name}"
    return ed


def _parse_field(data: bytes) -> FieldDescriptorMini:
    fd = FieldDescriptorMini()
    for num, val in _iter_fields(data):
        if num == 1:
            fd.name = val.decode("utf-8")
        elif num == 3:
            fd.number = _to_signed64(val)
        elif num == 4:
            fd.label = _to_signed64(val)
        elif num == 5:
            fd.type = _to_signed64(val)
        elif num == 6:
            fd.type_name = val.decode("utf-8")
    return fd


def _parse_message(data: bytes, prefix: str) -> MessageDescriptorMini:
    md = MessageDescriptorMini("", "")
    nested_raw: list[bytes] = []
    enum_raw: list[bytes] = []
    for num, val in _iter_fields(data):
        if num == 1:
            md.name = val.decode("utf-8")
        elif num == 2:
            md.add_field(_parse_field(val))
        elif num == 3:
            nested_raw.append(val)
        elif num == 4:
            enum_raw.append(val)
        # 8 = oneof_decl: membership does not change wire behavior for
        # our explicit-presence serializer, so oneofs need no model
    md.full_name = f"{prefix}.{md.name}"
    for raw in nested_raw:
        md.nested_types.append(_parse_message(raw, md.full_name))
    for raw in enum_raw:
        md.enum_types.append(_parse_enum(raw, md.full_name))
    return md


def parse_file_descriptor(data: bytes) -> FileDescriptorMini:
    fdp = FileDescriptorMini()
    msg_raw: list[bytes] = []
    enum_raw: list[bytes] = []
    for num, val in _iter_fields(data):
        if num == 1:
            fdp.name = val.decode("utf-8")
        elif num == 2:
            fdp.package = val.decode("utf-8")
        elif num == 3:  # dependency — StateMessage.proto has none we need
            raise ValueError(
                "shim supports single-file descriptors only; found import "
                + val.decode("utf-8", "replace")
            )
        elif num == 4:
            msg_raw.append(val)
        elif num == 5:
            enum_raw.append(val)
    prefix = f".{fdp.package}" if fdp.package else ""
    for raw in msg_raw:
        fdp.message_types.append(_parse_message(raw, prefix))
    for raw in enum_raw:
        fdp.enum_types.append(_parse_enum(raw, prefix))

    def register(md: MessageDescriptorMini):
        fdp.types_by_full_name[md.full_name] = md
        for em in md.enum_types:
            fdp.types_by_full_name[em.full_name] = em
        for nm in md.nested_types:
            register(nm)

    for md in fdp.message_types:
        register(md)
    for em in fdp.enum_types:
        fdp.types_by_full_name[em.full_name] = em

    def resolve(md: MessageDescriptorMini):
        for f in md.fields:
            if f.type == T_MESSAGE:
                f.message_type = fdp.types_by_full_name[f.type_name]
            elif f.type == T_ENUM:
                f.enum_type = fdp.types_by_full_name[f.type_name]
        for nm in md.nested_types:
            resolve(nm)

    for md in fdp.message_types:
        resolve(md)
    return fdp


# --------------------------------------------------------------------------
# dynamic messages
# --------------------------------------------------------------------------

_SCALAR_DEFAULTS = {
    T_DOUBLE: 0.0,
    T_FLOAT: 0.0,
    T_INT64: 0,
    T_UINT64: 0,
    T_INT32: 0,
    T_FIXED64: 0,
    T_FIXED32: 0,
    T_BOOL: False,
    T_STRING: "",
    T_BYTES: b"",
    T_UINT32: 0,
    T_ENUM: 0,
    T_SFIXED32: 0,
    T_SFIXED64: 0,
    T_SINT32: 0,
    T_SINT64: 0,
}


class ShimMessage:
    """Base class for dynamically built message types.

    Presence model (what drives serialization):
    - scalar fields serialize iff EXPLICITLY assigned (kwargs or
      attribute assignment) — assignment of the default value still
      serializes, which is wire-legal and preserves the caller's
      oneof-selection intent;
    - message fields serialize iff explicitly assigned OR lazily
      created via attribute access and non-empty afterwards (the
      ``cmd.ttl.durationMs = x`` pattern);
    - repeated fields serialize iff non-empty.
    """

    DESCRIPTOR: MessageDescriptorMini = None  # set by factory

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_explicit", set())
        for name, value in kwargs.items():
            setattr(self, name, value)

    # -- attribute plumbing -------------------------------------------------

    def __getattr__(self, name):
        # only called when normal lookup fails (instance fields live in
        # _values; class attrs like DESCRIPTOR resolve normally)
        try:
            fd = self.DESCRIPTOR.fields_by_name[name]
        except (AttributeError, KeyError):
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            ) from None
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        if fd.is_repeated:
            box: list = []
            values[name] = box
            return box
        if fd.type == T_MESSAGE:
            sub = fd.message_type._concrete_class()
            values[name] = sub
            return sub
        return _SCALAR_DEFAULTS[fd.type]

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        fd = self.DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if fd.type == T_MESSAGE and not fd.is_repeated:
            expected = fd.message_type._concrete_class
            if not isinstance(value, expected):
                raise TypeError(
                    f"{name} expects {expected.__name__}, "
                    f"got {type(value).__name__}"
                )
        if fd.is_repeated and not isinstance(value, list):
            value = list(value)
        self._values[name] = value
        self._explicit.add(name)

    # -- presence ------------------------------------------------------------

    def _is_nonempty(self) -> bool:
        if self._explicit:
            return True
        for name, value in self._values.items():
            fd = self.DESCRIPTOR.fields_by_name[name]
            if fd.is_repeated:
                if value:
                    return True
            elif fd.type == T_MESSAGE and value._is_nonempty():
                return True
        return False

    def _should_emit(self, fd: FieldDescriptorMini) -> bool:
        name = fd.name
        if fd.is_repeated:
            return bool(self._values.get(name))
        if name in self._explicit:
            return True
        if fd.type == T_MESSAGE and name in self._values:
            return self._values[name]._is_nonempty()
        return False

    # -- wire ------------------------------------------------------------

    def SerializeToString(self) -> bytes:  # noqa: N802 (protobuf API name)
        # Hot path (one message per TWS state round-trip): iterate only
        # the fields PRESENT in _values — every emittable field is there
        # (explicit assignment and lazy message/repeated creation both
        # populate it), so walking the full descriptor and re-sorting it
        # per call is pure overhead. Emission set and field order
        # (ascending field number) are identical to the previous
        # walk-all-fields form.
        values = self._values
        if not values:
            return b""
        fbn = self.DESCRIPTOR.fields_by_name
        explicit = self._explicit
        if len(values) > 1:
            items = sorted(values.items(), key=lambda kv: fbn[kv[0]].number)
        else:
            items = values.items()
        out = bytearray()
        for name, value in items:
            fd = fbn[name]
            if fd.label == L_REPEATED:
                for item in value:
                    self._encode_one(out, fd, item)
                continue
            if name not in explicit and (
                fd.type != T_MESSAGE or not value._is_nonempty()
            ):
                continue
            self._encode_one(out, fd, value)
        return bytes(out)

    @staticmethod
    def _encode_one(out: bytearray, fd: FieldDescriptorMini, value) -> None:
        t = fd.type
        tb = fd.tag_bytes
        if tb is None:
            tag = bytearray()
            encode_tag(tag, fd.number, wire_type_for(t))
            tb = fd.tag_bytes = bytes(tag)
        out += tb
        if t in (T_INT32, T_INT64, T_ENUM):
            encode_signed_as_varint(out, int(value))
        elif t in (T_UINT32, T_UINT64):
            encode_varint(out, int(value))
        elif t == T_BOOL:
            encode_varint(out, 1 if value else 0)
        elif t in (T_SINT32, T_SINT64):
            encode_varint(out, zigzag(int(value)))
        elif t == T_STRING:
            raw = value.encode("utf-8")
            encode_varint(out, len(raw))
            out += raw
        elif t == T_BYTES:
            raw = bytes(value)
            encode_varint(out, len(raw))
            out += raw
        elif t == T_MESSAGE:
            raw = value.SerializeToString()
            encode_varint(out, len(raw))
            out += raw
        elif t == T_DOUBLE:
            out += struct.pack("<d", float(value))
        elif t == T_FLOAT:
            out += struct.pack("<f", float(value))
        elif t in (T_FIXED64, T_SFIXED64):
            fmt = "<q" if t == T_SFIXED64 else "<Q"
            out += struct.pack(fmt, int(value))
        elif t in (T_FIXED32, T_SFIXED32):
            fmt = "<i" if t == T_SFIXED32 else "<I"
            out += struct.pack(fmt, int(value))
        else:
            raise ValueError(f"unsupported type {t} for field {fd.name}")

    def ParseFromString(self, data: bytes) -> int:  # noqa: N802
        self._values.clear()
        self._explicit.clear()
        self._merge_from(bytes(data))
        return len(data)

    def _merge_from(self, data: bytes) -> None:
        by_number = self.DESCRIPTOR.fields_by_number
        pos = 0
        n = len(data)
        while pos < n:
            key, pos = decode_varint(data, pos)
            number, wtype = key >> 3, key & 7
            fd = by_number.get(number)
            if fd is None:
                pos = skip_field(data, pos, wtype)
                continue
            expected = wire_type_for(fd.type)
            if fd.is_repeated and fd.type in _VARINT_TYPES and wtype == W_LEN:
                # packed repeated scalars
                ln, pos = decode_varint(data, pos)
                end = pos + ln
                box = self._values.setdefault(fd.name, [])
                while pos < end:
                    raw, pos = decode_varint(data, pos)
                    box.append(self._coerce_varint(fd, raw))
                continue
            if wtype != expected:
                pos = skip_field(data, pos, wtype)
                continue
            if wtype == W_VARINT:
                raw, pos = decode_varint(data, pos)
                value = self._coerce_varint(fd, raw)
            elif wtype == W_LEN:
                ln, pos = decode_varint(data, pos)
                chunk = data[pos : pos + ln]
                if len(chunk) != ln:
                    raise ValueError("truncated field")
                pos += ln
                if fd.type == T_STRING:
                    value = chunk.decode("utf-8")
                elif fd.type == T_BYTES:
                    value = chunk
                else:
                    value = fd.message_type._concrete_class()
                    value._merge_from(chunk)
            elif wtype == W_FIXED64:
                chunk = data[pos : pos + 8]
                pos += 8
                if fd.type == T_DOUBLE:
                    value = struct.unpack("<d", chunk)[0]
                elif fd.type == T_SFIXED64:
                    value = struct.unpack("<q", chunk)[0]
                else:
                    value = struct.unpack("<Q", chunk)[0]
            else:  # W_FIXED32
                chunk = data[pos : pos + 4]
                pos += 4
                if fd.type == T_FLOAT:
                    value = struct.unpack("<f", chunk)[0]
                elif fd.type == T_SFIXED32:
                    value = struct.unpack("<i", chunk)[0]
                else:
                    value = struct.unpack("<I", chunk)[0]
            if fd.is_repeated:
                self._values.setdefault(fd.name, []).append(value)
            else:
                self._values[fd.name] = value
                self._explicit.add(fd.name)

    @staticmethod
    def _coerce_varint(fd: FieldDescriptorMini, raw: int):
        t = fd.type
        if t == T_BOOL:
            return bool(raw)
        if t in (T_INT32, T_INT64, T_ENUM):
            return _to_signed64(raw)
        if t in (T_SINT32, T_SINT64):
            return unzigzag(raw)
        return raw  # uint32/uint64

    def __repr__(self) -> str:
        inner = ", ".join(
            f"{k}={v!r}" for k, v in self._values.items()
        )
        return f"{type(self).__name__}({inner})"

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.SerializeToString() == other.SerializeToString()
        )

    def __hash__(self):  # messages are mutable; id-hash like protobuf
        return id(self)


def build_message_class(md: MessageDescriptorMini) -> type:
    """One concrete class per message descriptor; nested messages and
    nested-enum value constants become class attributes (matching the
    generated-code namespace protobuf exposes)."""
    if md._concrete_class is not None:
        return md._concrete_class
    cls = type(md.name, (ShimMessage,), {"DESCRIPTOR": md})
    md._concrete_class = cls
    for nested in md.nested_types:
        setattr(cls, nested.name, build_message_class(nested))
    for em in md.enum_types:
        for vname, vnum in em.values.items():
            setattr(cls, vname, vnum)
    return cls
