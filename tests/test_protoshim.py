"""Unit tests for the vendored pure-Python protobuf shim
(``vendor/protoshim``) against the REAL generated module it exists to
serve: ``pyspark/sql/streaming/proto/StateMessage_pb2.py``.

The end-to-end cross-validation against the JVM's real protobuf runtime
is ``tests/test_streaming.py::test_tws_user_profiles_equals_batch``
(the state server parses the shim's bytes and the shim parses the
JVM's). These tests pin the wire-format details that e2e run depends
on: tag/varint layout, proto3 default-skipping, oneof exclusivity and
zero-length oneof arms, sign-extended negative varints, unknown-field
skipping, and packed repeated decode.
"""

from __future__ import annotations

import importlib
import sys

import pytest

from mini_lakehouse_control_plane_executor_spark.vendor import (
    ensure_protobuf,
    protobuf_available,
)

ensure_protobuf()
sm = importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_activation_is_idempotent_and_defers_to_real_package():
    path1 = ensure_protobuf()
    path2 = ensure_protobuf()
    if protobuf_available():
        # Real protobuf installed: the shim must stay out of the way.
        assert path1 is None and path2 is None
    else:
        assert path1 == path2  # no sys.path duplication
        assert sys.path.count(path1) == 1


def test_descriptor_pool_parsed_the_real_statemessage_proto():
    d = sm.StateRequest.DESCRIPTOR
    assert d.name == "StateRequest"
    assert d.full_name.endswith("streaming.state.StateRequest")
    by_num = {f.number: f.name for f in d.fields}
    assert by_num[1] == "version"
    assert by_num[2] == "statefulProcessorCall"
    assert by_num[6] == "utilsRequest"
    # The oneof groups every method arm.
    method = d.oneofs_by_name["method"]
    assert {f.name for f in method.fields} >= {
        "statefulProcessorCall",
        "stateVariableRequest",
        "implicitGroupingKeyRequest",
        "timerRequest",
        "utilsRequest",
    }
    # Enum with hoisted values (proto3 scoping).
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("INITIALIZED") == 2


def test_scalar_encoding_layout_and_default_skipping():
    # statusCode=0 (default) skipped; errorMessage field 2 string.
    msg = sm.StateResponse(statusCode=0, errorMessage="boom")
    assert msg.SerializeToString() == b"\x12\x04boom"
    # Non-default varint: field 1, value 17.
    assert sm.StateResponse(statusCode=17).SerializeToString() == b"\x08\x11"
    # Bytes field 3.
    assert sm.StateResponse(value=b"\x00\x01").SerializeToString() == b"\x1a\x02\x00\x01"


def test_oneof_arm_with_empty_message_still_serializes():
    # RemoveImplicitKey has no fields; the oneof arm must appear on the
    # wire as a zero-length submessage or the JVM can't see the method.
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    assert req.SerializeToString() == b"\x12\x00"
    parsed = sm.ImplicitGroupingKeyRequest()
    parsed.ParseFromString(b"\x12\x00")
    assert parsed.WhichOneof("method") == "removeImplicitKey"


def test_oneof_exclusivity_last_setter_wins():
    req = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k")
    )
    assert req.WhichOneof("method") == "setImplicitKey"
    # Setting the sibling arm clears the first.
    req2 = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k"),
        removeImplicitKey=sm.RemoveImplicitKey(),
    )
    data = req2.SerializeToString()
    out = sm.ImplicitGroupingKeyRequest()
    out.ParseFromString(data)
    assert out.WhichOneof("method") == "removeImplicitKey"


def test_nested_message_and_attribute_assignment_roundtrip():
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    cmd.schema = "n long, total double"
    cmd.ttl.durationMs = 5000  # auto-vivified submessage
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    out = sm.StateRequest()
    out.ParseFromString(req.SerializeToString())
    got = out.statefulProcessorCall.getValueState
    assert got.stateName == "totals"
    assert got.schema == "n long, total double"
    assert got.ttl.durationMs == 5000
    assert out.WhichOneof("method") == "statefulProcessorCall"


def test_negative_int64_sign_extended_varint():
    msg = sm.RegisterTimer(expiryTimestampMs=-1)
    data = msg.SerializeToString()
    # -1 as 64-bit two's complement: ten 0xff bytes ending 0x01.
    assert data == b"\x08" + b"\xff" * 9 + b"\x01"
    out = sm.RegisterTimer()
    out.ParseFromString(data)
    assert out.expiryTimestampMs == -1


def test_repeated_bytes_and_repeated_message_roundtrip():
    put = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
    out = sm.ListStatePut()
    out.ParseFromString(put.SerializeToString())
    assert list(out.value) == [b"a", b"bb", b""]
    assert out.fetchWithArrow is True

    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    out2 = sm.StateResponseWithMapIterator()
    out2.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in out2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert out2.requireNextFetch is True
    assert out2.errorMessage == ""  # unset scalar decodes to default


def test_proto3_optional_field_presence():
    t = sm.TimerInfo(timestampMs=9)
    assert not t.HasField("key")
    assert t.key == b""  # reading does not create presence
    assert not t.HasField("key")
    t2 = sm.TimerInfo(key=b"", timestampMs=9)  # explicitly-set empty
    assert t2.HasField("key")
    out = sm.TimerInfo()
    out.ParseFromString(t2.SerializeToString())
    assert out.HasField("key") and out.key == b""


def test_unknown_fields_skipped_on_parse():
    # field 15 varint + field 14 length-delimited, unknown to
    # StateResponse — a newer peer's message must still parse.
    data = b"\x78\x2a" + b"\x72\x03abc" + sm.StateResponse(statusCode=3).SerializeToString()
    out = sm.StateResponse()
    out.ParseFromString(data)
    assert out.statusCode == 3


def test_packed_repeated_varint_decode():
    # StateMessage has no repeated scalars, but the spec says decoders
    # must accept packed encoding wherever unpacked is legal; exercise
    # the generic path through a hand-built LEN payload on a varint
    # field of a throwaway descriptor.
    from google.protobuf import _wire

    assert list(_wire.iter_fields(b"\x0a\x03\x01\x80\x02")) == [
        (1, _wire.LEN, b"\x01\x80\x02")
    ]
    v1, i = _wire.read_uvarint(b"\x01\x80\x02", 0)
    v2, i = _wire.read_uvarint(b"\x01\x80\x02", i)
    assert (v1, v2, i) == (1, 256, 3)


def test_error_on_unknown_constructor_kwarg():
    with pytest.raises(ValueError, match="no .*bogus.* field"):
        sm.StateResponse(bogus=1)


def test_handle_state_request_bytes_match_protoc_layout():
    """The exact first message the TWS worker sends: SetHandleState
    wrapped twice. Layout derived by hand from the spec:
    StateRequest.statefulProcessorCall = field 2 (LEN), inside it
    setHandleState = field 1 (LEN), inside it state = field 1
    (varint)."""
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == b"\x12\x04\x0a\x02\x08\x02"
