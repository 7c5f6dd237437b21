"""The vendored mini protobuf runtime (vendor/google/protobuf — VERDICT
r8 #7): wire-format correctness against hand-computed byte strings from
the public encoding spec, proto3 presence semantics, oneof behavior, and
round-trips of the exact message shapes PySpark's state-server client
builds. The end-to-end proof is test_streaming_stateful.py's
transformWithState test, which speaks this wire format to the real JVM
state server."""

from __future__ import annotations

import pytest

from m13_sparkstreaming_python_azure_spark.session import (
    _ensure_vendored_protobuf,
)

_ensure_vendored_protobuf()
sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_hand_computed_wire_bytes():
    """field 1 int32=5000: tag 0x08, varint 0x88 0x27 (spec example)."""
    ttl = sm.TTLConfig(durationMs=5000)
    assert ttl.SerializeToString() == b"\x08\x88\x27"
    # string field: tag 0x0a, length, utf-8 bytes
    g = sm.ListStateGet(iteratorId="ab")
    assert g.SerializeToString() == b"\x0a\x02ab"
    # bool true: varint 1; repeated bytes: one tag per element
    p = sm.ListStatePut(value=[b"x", b"yz"], fetchWithArrow=True)
    assert p.SerializeToString() == b"\x0a\x01x\x0a\x02yz\x10\x01"


def test_proto3_default_scalars_not_serialized():
    assert sm.TTLConfig(durationMs=0).SerializeToString() == b""
    assert sm.StateResponse().SerializeToString() == b""
    # negative int64 serializes as 10-byte two's-complement varint
    r = sm.RegisterTimer(expiryTimestampMs=-1)
    data = r.SerializeToString()
    assert data == b"\x08" + b"\xff" * 9 + b"\x01"
    r2 = sm.RegisterTimer()
    r2.ParseFromString(data)
    assert r2.expiryTimestampMs == -1


def test_oneof_set_clears_siblings():
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand())
    assert call.WhichOneof("method") == "getValueState"
    call.getListState = sm.StateCallCommand(stateName="l")
    assert call.WhichOneof("method") == "getListState"
    assert not call.HasField("getValueState")
    rt = sm.StatefulProcessorCall()
    rt.ParseFromString(call.SerializeToString())
    assert rt.WhichOneof("method") == "getListState"
    assert rt.getListState.stateName == "l"


def test_submessage_vivification_presence_on_write_only():
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    _ = cmd.ttl.durationMs  # READ must not create presence
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == b"\x0a\x01s"
    cmd.ttl.durationMs = 7  # WRITE marks the chain present
    assert cmd.HasField("ttl")
    assert cmd.SerializeToString() == b"\x0a\x01s\x22\x02\x08\x07"


def test_nested_request_roundtrip_like_the_state_client():
    cmd = sm.StateCallCommand()
    cmd.stateName = "counts"
    cmd.schema = '{"type":"struct"}'
    cmd.ttl.durationMs = 5000
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    back = sm.StateRequest()
    back.ParseFromString(msg.SerializeToString())
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == "counts"
    assert got.schema == '{"type":"struct"}'
    assert got.ttl.durationMs == 5000
    assert back.WhichOneof("method") == "statefulProcessorCall"


def test_repeated_message_and_enum_values():
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(kv.key, kv.value) for kv in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is True
    # module-level enum values + wrapper API (protoc export shape)
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("DATA_PROCESSED") == 3
    assert sm.HandleState.Name(4) == "TIMER_PROCESSED"
    s = sm.SetHandleState(state=sm.INITIALIZED)
    assert s.SerializeToString() == b"\x08\x02"


def test_unknown_fields_are_skipped():
    # TTLConfig has only field 1; feed it an extra field 15 (varint) and
    # field 9 (length-delimited) — both must be skipped cleanly
    data = b"\x08\x07" + b"\x78\x2a" + b"\x4a\x03abc"
    t = sm.TTLConfig()
    t.ParseFromString(data)
    assert t.durationMs == 7
