"""The stdlib protobuf wire shim (repo-root ``google/``).

pyspark 4.1 ships the GENERATED StateMessage_pb2 module for
transformWithStateInPandas but not the protobuf runtime it imports; the
shim implements the public wire format so the generated module builds
real message classes. Three layers of proof, strongest last:

1. golden byte vectors computed by hand from the encoding spec;
2. construction-pattern round-trips covering every shape the pyspark
   state clients use (kwargs, scalar assignment, lazy submessages,
   repeated message fields, negative int64 varints);
3. cross-engine: the JVM's REAL protobuf (Spark's state server classes)
   parses the shim's bytes and the shim parses the JVM's — byte-equal
   re-serialization both ways.

(The end-to-end proof lives in the streaming suite: the TWS drains in
tests/test_streaming.py speak this protocol for every state call.)
"""

from __future__ import annotations

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
import pytest


def test_shim_is_the_import_target():
    import google.protobuf as gp

    assert "stdlib-wire-shim" in gp.__version__


def test_golden_vectors():
    # field 1 (version, int32) = 1 -> tag 0x08, varint 0x01
    assert sm.StateRequest(version=1).SerializeToString() == b"\x08\x01"
    # nested: StateRequest.statefulProcessorCall (field 2) wrapping
    # StatefulProcessorCall.setHandleState (field 1) wrapping
    # SetHandleState.state (field 1, enum CLOSED=5)
    call = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.CLOSED)
    )
    assert (
        sm.StateRequest(statefulProcessorCall=call).SerializeToString()
        == bytes.fromhex("12040a020805")
    )
    # strings are UTF-8 length-delimited
    m = sm.ListTimers(iteratorId="ab")
    assert m.SerializeToString() == b"\x0a\x02ab"


def test_scalar_assignment_and_lazy_submessage():
    cmd = sm.StateCallCommand()
    cmd.stateName = "history"
    cmd.schema = '{"fields":[]}'
    cmd.ttl.durationMs = 60000  # lazy submessage becomes present
    enc = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    ).SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(enc)
    g = back.statefulProcessorCall.getValueState
    assert (g.stateName, g.schema, g.ttl.durationMs) == (
        "history",
        '{"fields":[]}',
        60000,
    )
    # an untouched lazy submessage does NOT serialize
    cmd2 = sm.StateCallCommand()
    cmd2.stateName = "x"
    _ = cmd2.ttl  # read-only touch
    assert b"durationMs" not in cmd2.SerializeToString()
    assert cmd2.SerializeToString() == sm.StateCallCommand(
        stateName="x"
    ).SerializeToString()


def test_explicit_empty_submessage_serializes():
    # oneof selection: Exists() carries no fields, but assigning it must
    # put the zero-length field on the wire so the JVM sees the method
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    enc = call.SerializeToString()
    back = sm.ValueStateCall()
    back.ParseFromString(enc)
    assert back.stateName == "s"
    # the exists field round-trips as an (empty) present message
    assert enc != sm.ValueStateCall(stateName="s").SerializeToString()


def test_negative_int64_ten_byte_varint():
    t = sm.TimerInfo(timestampMs=-1)
    enc = t.SerializeToString()
    assert len(enc) == 11  # 1 tag byte + 10-byte two's-complement varint
    back = sm.TimerInfo()
    back.ParseFromString(enc)
    assert back.timestampMs == -1


def test_repeated_message_and_defaults():
    resp = sm.StateResponseWithTimer(statusCode=0, requireNextFetch=True)
    resp.timer.append(sm.TimerInfo(key=b"k1", timestampMs=123))
    resp.timer.append(sm.TimerInfo(key=b"k2", timestampMs=456))
    enc = resp.SerializeToString()
    back = sm.StateResponseWithTimer()
    back.ParseFromString(enc)
    assert [(x.key, x.timestampMs) for x in back.timer] == [
        (b"k1", 123),
        (b"k2", 456),
    ]
    assert back.requireNextFetch is True
    assert back.statusCode == 0
    assert back.errorMessage == ""  # absent scalar reads as default


def test_unknown_fields_are_skipped():
    # a parser must skip fields it does not know: feed StateResponse
    # bytes (statusCode/errorMessage/value) into TimerInfo (key/
    # timestampMs live at different numbers/types)
    resp = sm.StateResponse(statusCode=7, errorMessage="x", value=b"yz")
    t = sm.TimerInfo()
    t.ParseFromString(resp.SerializeToString())  # must not raise


def test_jvm_cross_validation(spark):
    """The decisive check: Spark's own (Java protobuf) state-message
    classes parse the shim's bytes, re-serialize byte-identically, and
    the shim parses the JVM's bytes back."""
    jvm = spark._jvm
    cmd = sm.StateCallCommand()
    cmd.stateName = "history"
    cmd.schema = '{"fields":[]}'
    cmd.ttl.durationMs = 60000
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd),
    )
    payload = req.SerializeToString()
    jreq_cls = getattr(
        jvm,
        "org.apache.spark.sql.execution.streaming.state."
        "StateMessage$StateRequest",
    )
    parsed = jreq_cls.parseFrom(payload)
    assert parsed.getVersion() == 2
    gv = parsed.getStatefulProcessorCall().getGetValueState()
    assert gv.getStateName() == "history"
    assert gv.getTtl().getDurationMs() == 60000
    jbytes = bytes(parsed.toByteArray())
    assert jbytes == payload  # byte-identical both engines
    back = sm.StateRequest()
    back.ParseFromString(jbytes)
    assert back.statefulProcessorCall.getValueState.stateName == "history"


def test_jvm_timer_request_roundtrip(spark):
    jvm = spark._jvm
    treq = sm.StateRequest(
        timerRequest=sm.TimerRequest(
            expiryTimerRequest=sm.ExpiryTimerRequest(
                expiryTimestampMs=1710528381466, iteratorId="it-1"
            )
        )
    )
    payload = treq.SerializeToString()
    jreq_cls = getattr(
        jvm,
        "org.apache.spark.sql.execution.streaming.state."
        "StateMessage$StateRequest",
    )
    parsed = jreq_cls.parseFrom(payload)
    e = parsed.getTimerRequest().getExpiryTimerRequest()
    assert e.getExpiryTimestampMs() == 1710528381466
    assert e.getIteratorId() == "it-1"
    assert bytes(parsed.toByteArray()) == payload


def test_unresolvable_field_raises():
    with pytest.raises(AttributeError):
        sm.StateRequest(not_a_field=1)
    with pytest.raises(AttributeError):
        _ = sm.StateRequest().nope
