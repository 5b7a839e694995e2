"""Unit tests for the vendored clean-room google.protobuf runtime
(vendor/pbshim) that carries the transformWithStateInPandas state-server
protocol. Wire vectors are hand-derived from the public encoding spec
(https://protobuf.dev/programming-guides/encoding/); the end-to-end
certification against the JVM's real protobuf parser is the tws streaming
key itself (tests/test_plans.py::test_tws_driver_key_executes_transform_with_state_exec)."""

from __future__ import annotations

import pytest

from rocana_impala_udfs_spark.vendor.pbshim import ensure_protobuf

assert ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_varint_wire_vectors():
    # field 1 (statusCode, int32): tag 0x08; 300 -> 0xAC 0x02 per the spec
    msg = sm.StateResponse(statusCode=300)
    assert msg.SerializeToString() == b"\x08\xac\x02"
    # default (0) proto3 scalar is not serialized
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""


def test_string_and_bytes_fields():
    # errorMessage field 2: tag 0x12; "hi" -> 12 02 68 69
    assert sm.StateResponse(errorMessage="hi").SerializeToString() == b"\x12\x02hi"
    # value field 3 bytes: tag 0x1a
    assert sm.StateResponse(value=b"\x00\xff").SerializeToString() == b"\x1a\x02\x00\xff"
    # utf-8 round trip
    m = sm.StateResponseWithStringTypeVal(value="héllo")
    m2 = sm.StateResponseWithStringTypeVal()
    m2.ParseFromString(m.SerializeToString())
    assert m2.value == "héllo"


def test_negative_int64_ten_byte_varint():
    m = sm.ExpiryTimerRequest(expiryTimestampMs=-1)
    data = m.SerializeToString()
    # -1 as 64-bit two's complement varint = 10 bytes of 0xFF.. 0x01
    assert data == b"\x10" + b"\xff" * 9 + b"\x01"
    m2 = sm.ExpiryTimerRequest()
    m2.ParseFromString(data)
    assert m2.expiryTimestampMs == -1


def test_submessage_presence_and_empty_payload():
    # oneof member submessage Get() is empty but must still be serialized
    call = sm.ValueStateCall(stateName="s", get=sm.Get())
    data = call.SerializeToString()
    m2 = sm.ValueStateCall()
    m2.ParseFromString(data)
    assert m2.WhichOneof("method") == "get"
    assert m2.stateName == "s"


def test_autovivified_ttl_presence_semantics():
    cmd = sm.StateCallCommand()
    _ = cmd.ttl.durationMs  # pure read
    assert not cmd.HasField("ttl")
    assert b"" == cmd.SerializeToString()
    cmd.ttl.durationMs = 7
    assert cmd.HasField("ttl")
    m2 = sm.StateCallCommand()
    m2.ParseFromString(cmd.SerializeToString())
    assert m2.ttl.durationMs == 7 and m2.HasField("ttl")


def test_oneof_last_set_wins():
    req = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k"),
        removeImplicitKey=sm.RemoveImplicitKey(),
    )
    # kwargs iterate in order: removeImplicitKey set last clears the sibling
    assert req.WhichOneof("method") == "removeImplicitKey"
    assert not req.HasField("setImplicitKey")


def test_repeated_bytes_and_messages_roundtrip():
    lg = sm.StateResponseWithListGet(value=[b"a", b"bb"], requireNextFetch=True)
    m2 = sm.StateResponseWithListGet()
    m2.ParseFromString(lg.SerializeToString())
    assert list(m2.value) == [b"a", b"bb"]
    assert m2.requireNextFetch is True

    rt = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(key=b"k", timestampMs=9), sm.TimerInfo(timestampMs=3)]
    )
    m3 = sm.StateResponseWithTimer()
    m3.ParseFromString(rt.SerializeToString())
    assert [(t.key, t.timestampMs) for t in m3.timer] == [(b"k", 9), (b"", 3)]
    # proto3_optional presence survives the round trip
    assert m3.timer[0].HasField("key") and not m3.timer[1].HasField("key")


def test_unknown_fields_are_skipped():
    m = sm.StateResponse()
    # field 15 varint (unknown) + known statusCode=5
    m.ParseFromString(b"\x78\x2a\x08\x05")
    assert m.statusCode == 5


def test_packed_repeated_varint_parse():
    # StateResponseWithListGet.value is bytes so use a synthetic check on the
    # decoder path: requireNextFetch (field 4, bool) packed form 22 01 01
    # is not legal for bool singular; instead verify the decoder handles a
    # LEN payload on a repeated varint field via TimerInfo round-trip of
    # multiple timers (non-packed messages) — packed scalars don't occur in
    # StateMessage.proto, so assert the helper itself:
    from google.protobuf._runtime import Message

    assert hasattr(Message, "MergeFromString")


def test_enum_module_level_constants_match_handle_states():
    assert sm.PRE_INIT == 0
    assert sm.CREATED == 1
    assert sm.INITIALIZED == 2
    assert sm.DATA_PROCESSED == 3
    assert sm.TIMER_PROCESSED == 4
    assert sm.CLOSED == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"
    assert sm.HandleState.Value("CLOSED") == 5


def test_nested_request_wire_bytes_stable():
    # the exact frame the api client sends for setHandleState(INITIALIZED):
    # StateRequest.statefulProcessorCall (field 2) ->
    # StatefulProcessorCall.setHandleState (field 1) ->
    # SetHandleState.state = 2
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_composite_assignment_rejected():
    req = sm.StateRequest()
    with pytest.raises(AttributeError):
        req.statefulProcessorCall = sm.StatefulProcessorCall()


def test_copyfrom_and_clear():
    a = sm.StateResponse(statusCode=3, errorMessage="x", value=b"v")
    b = sm.StateResponse()
    b.CopyFrom(a)
    assert b == a
    b.Clear()
    assert b.SerializeToString() == b""


def test_vivified_child_repeated_field_append_survives_serialize():
    """ADVICE r11: appending to a repeated field of an auto-vivified child
    must attach the child to its parent — before the fix the appended
    data silently vanished on serialize.  As of the r12 review fix the
    attach happens on first MUTATION (real protobuf semantics), not on
    first access."""
    call = sm.ListStateCall(stateName="s")
    call.appendList.value.append(b"payload")
    m2 = sm.ListStateCall()
    m2.ParseFromString(call.SerializeToString())
    assert m2.HasField("appendList")
    assert list(m2.appendList.value) == [b"payload"]


def test_reading_repeated_field_of_unset_oneof_member_is_side_effect_free():
    """r12 review: reading the repeated field of an UNSET oneof alternative
    must not register presence — the eager attach-on-access clobbered the
    currently-set oneof sibling on a pure read (reproduced before the fix:
    WhichOneof flipped from listStateGet to appendList and the request
    data vanished on serialize)."""
    call = sm.ListStateCall(stateName="s")
    call.listStateGet.iteratorId = "it1"
    # inspection-only reads of the other oneof alternative
    assert len(call.appendList.value) == 0
    assert list(call.appendList.value) == []
    assert call.WhichOneof("method") == "listStateGet"
    m2 = sm.ListStateCall()
    m2.ParseFromString(call.SerializeToString())
    assert m2.HasField("listStateGet")
    assert m2.listStateGet.iteratorId == "it1"
    assert not m2.HasField("appendList")


def test_lazy_repeated_container_aliases_until_mutation():
    """The not-yet-present repeated container is cached per field: two
    reads return the same object, a mutation promotes exactly that object
    to the canonical field value, and explicit assignment invalidates any
    stale unattached container."""
    call = sm.ListStateCall(stateName="s")
    a = call.appendList.value
    # NOTE: call.appendList vivifies a FRESH child each read until the
    # child gains presence, so alias identity is checked through one
    # held child reference (matching how the state client holds messages).
    child = call.appendList
    assert child.value is child.value
    assert not call.HasField("appendList")
    lst = child.value
    lst.append(b"x")
    assert call.HasField("appendList")
    assert call.appendList.value is lst
    del a  # the earlier unattached container from a different child is moot
    # extend on an empty iterable must NOT create presence
    other = sm.ListStateCall(stateName="t")
    other.listStateGet.iteratorId = "it"
    other.appendList.value.extend([])
    assert other.WhichOneof("method") == "listStateGet"


def test_empty_slice_assignment_does_not_create_presence():
    """ADVICE r12 #2: a no-op slice assignment (lst[0:0] = []) on the
    repeated field of an UNSET oneof alternative is non-additive and must
    not clobber the currently-set sibling; a slice assignment that DOES
    add elements is additive and must."""
    call = sm.ListStateCall(stateName="s")
    call.listStateGet.iteratorId = "it1"
    call.appendList.value[0:0] = []
    assert call.WhichOneof("method") == "listStateGet"
    m2 = sm.ListStateCall()
    m2.ParseFromString(call.SerializeToString())
    assert m2.HasField("listStateGet")
    # the additive slice-assignment still registers presence
    other = sm.ListStateCall(stateName="t")
    other.appendList.value[0:0] = [b"x"]
    assert other.WhichOneof("method") == "appendList"
    assert list(other.appendList.value) == [b"x"]
