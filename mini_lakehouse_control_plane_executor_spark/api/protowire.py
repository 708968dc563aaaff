"""Minimal proto3 wire-format codec for the gRPC layer.

The reference's stable contract is protobuf BYTES over
``metadata.MetadataService`` (``proto/metadata.proto``, requirement 0 —
``.kiro/specs/mini-lakehouse/requirements.md:31-33``). This environment has
no ``google.protobuf`` runtime and no codegen, so this module implements
the (public, documented) proto3 wire format directly for the small type
subset ``metadata.proto`` uses:

- ``string`` / ``bool`` / ``uint64`` scalars (wire types 2 / 0 / 0),
- embedded messages and ``repeated`` messages (wire type 2),
- ``repeated uint64`` (packed on encode; packed AND unpacked accepted on
  decode, as the spec requires),
- ``map<string, string>`` (the spec's repeated map-entry message with
  key = field 1, value = field 2).

Proto3 semantics honored: zero-valued scalars and empty aggregates are
omitted on encode (canonical output), unknown fields are skipped on
decode (forward compatibility), and missing fields decode to their zero
defaults. Map entries are emitted key-sorted so equal messages encode to
equal bytes (deterministic, like protobuf's deterministic mode).

Messages are the plain dataclasses in ``api.grpc_api``; each is
registered with a descriptor ``{py_field_name: (field_number, kind[,
sub_message_class])}``. The codec is wire-compatible with any generated
protobuf stub for the same .proto — a Go or Python client built from
``metadata.proto`` can talk to ``serve()`` byte-for-byte.

Non-string map values (file stats carry numbers) are stringified with
``json.dumps`` on encode — ``map<string,string>`` is the proto's declared
type — and stay strings on decode, matching what a Go peer would see.
"""

from __future__ import annotations

import json

# Wire types (protobuf encoding spec).
_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5

# Field kinds accepted in descriptors.
KINDS = {"string", "bool", "uint64", "msg", "rmsg", "ruint64", "map_ss"}

_DESCRIPTORS: dict[type, dict[str, tuple]] = {}


def register(cls: type, fields: dict[str, tuple]) -> type:
    """Register ``cls`` (a dataclass whose attribute names match the
    descriptor keys) with its proto field numbers/kinds."""
    for name, spec in fields.items():
        if spec[1] not in KINDS:
            raise ValueError(f"{cls.__name__}.{name}: unknown kind {spec[1]!r}")
        if spec[1] in ("msg", "rmsg") and len(spec) != 3:
            raise ValueError(f"{cls.__name__}.{name}: {spec[1]} needs a sub-class")
    _DESCRIPTORS[cls] = fields
    return cls


# -- primitives -------------------------------------------------------------


def _uvarint(n: int) -> bytes:
    if n < 0:
        raise ValueError("uvarint cannot encode negative values")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_uvarint(data: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        if i >= len(data):
            raise ValueError("truncated varint")
        b = data[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _tag(num: int, wt: int) -> bytes:
    return _uvarint((num << 3) | wt)


def _len_field(num: int, payload: bytes) -> bytes:
    return _tag(num, _LEN) + _uvarint(len(payload)) + payload


def _str_value(v) -> str:
    return v if isinstance(v, str) else json.dumps(v)


# -- encode -----------------------------------------------------------------


def encode(msg) -> bytes:
    """Canonical proto3 bytes for a registered message instance."""
    desc = _DESCRIPTORS[type(msg)]
    out = bytearray()
    # Emit in field-number order: canonical, deterministic output.
    for name, spec in sorted(desc.items(), key=lambda kv: kv[1][0]):
        num, kind = spec[0], spec[1]
        v = getattr(msg, name)
        if kind == "string":
            if v:
                out += _len_field(num, v.encode("utf-8"))
        elif kind == "bool":
            if v:
                out += _tag(num, _VARINT) + _uvarint(1)
        elif kind == "uint64":
            if v:
                out += _tag(num, _VARINT) + _uvarint(int(v))
        elif kind == "msg":
            if v is not None:
                payload = encode(v)
                if payload:  # empty submessage == unset at the wire level
                    out += _len_field(num, payload)
        elif kind == "rmsg":
            for item in v or []:
                out += _len_field(num, encode(item))
        elif kind == "ruint64":
            if v:
                packed = b"".join(_uvarint(int(x)) for x in v)
                out += _len_field(num, packed)
        elif kind == "map_ss":
            for k in sorted(v or {}):
                entry = _len_field(1, str(k).encode("utf-8")) + _len_field(
                    2, _str_value(v[k]).encode("utf-8")
                )
                out += _len_field(num, entry)
    return bytes(out)


# -- decode -----------------------------------------------------------------


def _skip(data: bytes, i: int, wt: int) -> int:
    """Advance past an unknown field, REJECTING truncation: without the
    bounds checks a message cut off inside a skipped field decoded
    cleanly to a partial message (e.g. a CommitRequest missing trailing
    adds) instead of failing the RPC — corruption accepted selectively
    is worse than corruption rejected uniformly."""
    if wt == _VARINT:
        _, i = _read_uvarint(data, i)
        return i
    if wt == _I64:
        i += 8
    elif wt == _LEN:
        n, i = _read_uvarint(data, i)
        i += n
    elif wt == _I32:
        i += 4
    else:
        raise ValueError(f"unsupported wire type {wt}")
    if i > len(data):
        raise ValueError("truncated payload")
    return i


def decode(cls: type, data: bytes):
    """Parse proto3 bytes into a default-constructed ``cls``, skipping
    unknown fields (forward compatibility, per the spec)."""
    desc = _DESCRIPTORS[cls]
    by_num = {spec[0]: (name, spec) for name, spec in desc.items()}
    msg = cls()
    i = 0
    while i < len(data):
        key, i = _read_uvarint(data, i)
        num, wt = key >> 3, key & 0x7
        hit = by_num.get(num)
        if hit is None:
            i = _skip(data, i, wt)
            continue
        name, spec = hit
        kind = spec[1]
        if kind in ("string", "msg", "rmsg", "map_ss") or (
            kind == "ruint64" and wt == _LEN
        ):
            if wt != _LEN:
                raise ValueError(f"field {num}: expected length-delimited")
            n, i = _read_uvarint(data, i)
            chunk = data[i : i + n]
            if len(chunk) != n:
                raise ValueError(f"field {num}: truncated payload")
            i += n
            if kind == "string":
                setattr(msg, name, chunk.decode("utf-8"))
            elif kind == "msg":
                setattr(msg, name, decode(spec[2], chunk))
            elif kind == "rmsg":
                getattr(msg, name).append(decode(spec[2], chunk))
            elif kind == "ruint64":  # packed
                j = 0
                vals = getattr(msg, name)
                while j < len(chunk):
                    x, j = _read_uvarint(chunk, j)
                    vals.append(x)
            else:  # map_ss entry
                k = val = ""
                j = 0
                while j < len(chunk):
                    ekey, j = _read_uvarint(chunk, j)
                    enum, ewt = ekey >> 3, ekey & 0x7
                    if ewt == _LEN:
                        ln, j = _read_uvarint(chunk, j)
                        piece = chunk[j : j + ln]
                        if len(piece) != ln:  # truncated map-entry value
                            raise ValueError(f"field {num}: truncated payload")
                        s = piece.decode("utf-8")
                        j += ln
                        if enum == 1:
                            k = s
                        elif enum == 2:
                            val = s
                    else:
                        j = _skip(chunk, j, ewt)
                getattr(msg, name)[k] = val
        elif kind in ("bool", "uint64") or (kind == "ruint64" and wt == _VARINT):
            x, i = _read_uvarint(data, i)
            if kind == "bool":
                setattr(msg, name, bool(x))
            elif kind == "uint64":
                setattr(msg, name, x)
            else:  # unpacked repeated entry
                getattr(msg, name).append(x)
        else:
            i = _skip(data, i, wt)
    return msg
