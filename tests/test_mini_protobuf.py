"""Wire-format pins for the vendored mini protobuf runtime
(vendor/google/protobuf) — the code path transformWithStateInPandas
workers use to talk to the JVM state server. These tests pin the
encoding rules from the public protobuf docs directly, independent of
Spark, so a runtime regression surfaces here before it garbles a state
conversation (the integration path is tests/test_sessions.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

VENDOR = str(Path(__file__).resolve().parents[1] / "vendor")
if VENDOR not in sys.path:
    sys.path.append(VENDOR)

from google.protobuf._mini import (  # noqa: E402
    DecodeError,
    decode_varint,
    encode_varint,
    parse_file_descriptor,
    zigzag_decode,
    zigzag_encode,
)


class TestVarint:
    def test_small_values_single_byte(self):
        assert encode_varint(0) == b"\x00"
        assert encode_varint(1) == b"\x01"
        assert encode_varint(127) == b"\x7f"

    def test_multi_byte_continuation(self):
        # 300 = 0b100101100 -> ac 02 (protobuf docs' worked example)
        assert encode_varint(300) == b"\xac\x02"
        assert decode_varint(b"\xac\x02", 0) == (300, 2)

    def test_negative_is_ten_bytes_twos_complement(self):
        enc = encode_varint(-1)
        assert len(enc) == 10
        v, pos = decode_varint(enc, 0)
        assert v == (1 << 64) - 1  # raw; signed reinterpretation is per-type
        assert pos == 10

    def test_truncated_raises(self):
        with pytest.raises(DecodeError):
            decode_varint(b"\xac", 0)

    @pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2**32, 2**63 - 1])
    def test_round_trip(self, v):
        assert decode_varint(encode_varint(v), 0)[0] == v


class TestZigzag:
    @pytest.mark.parametrize(
        "signed,encoded", [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4)]
    )
    def test_spec_table(self, signed, encoded):
        assert zigzag_encode(signed) == encoded
        assert zigzag_decode(encoded) == signed

    @pytest.mark.parametrize("v", [0, -1, 1, -(2**31), 2**31 - 1, -(2**62)])
    def test_round_trip(self, v):
        assert zigzag_decode(zigzag_encode(v)) == v


@pytest.fixture(scope="module")
def sm():
    """The real generated module this runtime exists to execute."""
    from pyspark.sql.streaming.proto import StateMessage_pb2

    return StateMessage_pb2


class TestGeneratedMessages:
    def test_oneof_request_round_trips(self, sm):
        call = sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
        req = sm.StateRequest(version=2, statefulProcessorCall=call)
        back = sm.StateRequest.FromString(req.SerializeToString())
        assert back.version == 2
        assert back.statefulProcessorCall.setHandleState.state == sm.DATA_PROCESSED
        assert back.WhichOneof("method") == "statefulProcessorCall"

    def test_unset_scalars_read_defaults_and_skip_wire(self, sm):
        resp = sm.StateResponse()
        assert resp.statusCode == 0
        assert resp.errorMessage == ""
        assert resp.value == b""
        assert resp.SerializeToString() == b""

    def test_explicitly_set_zero_still_serializes(self, sm):
        # presence-tracked: a set field serializes even at its default —
        # always wire-valid, and what oneof semantics require
        resp = sm.StateResponse(statusCode=0)
        data = resp.SerializeToString()
        assert data != b""
        assert sm.StateResponse.FromString(data).statusCode == 0

    def test_bytes_payload_survives(self, sm):
        payload = bytes(range(256))
        k = sm.SetImplicitKey(key=payload)
        assert sm.SetImplicitKey.FromString(k.SerializeToString()).key == payload

    def test_negative_int64_round_trips(self, sm):
        t = sm.RegisterTimer(expiryTimestampMs=-5)
        assert sm.RegisterTimer.FromString(t.SerializeToString()).expiryTimestampMs == -5

    def test_unknown_fields_are_skipped_not_fatal(self, sm):
        base = sm.SetImplicitKey(key=b"k").SerializeToString()
        # append an unknown field (number 15, varint wire type): tag 0x78
        data = base + b"\x78\x2a"
        msg = sm.SetImplicitKey.FromString(data)
        assert msg.key == b"k"

    def test_enum_values_injected_at_module_scope(self, sm):
        assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
        assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)

    def test_unknown_kwarg_raises(self, sm):
        with pytest.raises(AttributeError):
            sm.SetImplicitKey(nope=1)

    def test_descriptor_parse_rejects_garbage(self):
        with pytest.raises(DecodeError):
            parse_file_descriptor(b"\xff\xff\xff")

    def test_repeated_message_field_accumulates(self, sm):
        r = sm.StateResponseWithTimer(
            statusCode=0,
            timer=[
                sm.TimerInfo(timestampMs=1),
                sm.TimerInfo(timestampMs=2),
            ],
        )
        back = sm.StateResponseWithTimer.FromString(r.SerializeToString())
        assert [t.timestampMs for t in back.timer] == [1, 2]

    def test_in_place_nested_mutation_persists(self, sm):
        """r8 ADVICE (high): PySpark's stateful_processor_api_client sets
        state TTL via in-place nested mutation — `cmd.ttl.durationMs = n`.
        The old __getattr__ returned a throwaway default view for unset
        singular message fields, so the mutation was silently dropped and
        TTL silently disabled (unbounded state growth). Pin the full
        client pattern: mutate through the lazily-materialized child,
        round-trip the wire bytes, presence survives."""
        cmd = sm.StateCallCommand()
        cmd.ttl.durationMs = 60_000
        assert cmd.HasField("ttl")
        back = sm.StateCallCommand.FromString(cmd.SerializeToString())
        assert back.HasField("ttl")
        assert back.ttl.durationMs == 60_000

    def test_merge_after_lazy_read_restores_presence(self, sm):
        """r9 ADVICE (low): reading an unset child leaves a lazy marker;
        if MergeFromString then carries that field as an explicitly
        present (even empty) submessage, the stale marker must be
        discarded so HasField/SerializeToString see the wire value."""
        cmd = sm.StateCallCommand()
        assert cmd.ttl.durationMs == 0  # lazy read — marker set
        assert not cmd.HasField("ttl")
        src = sm.StateCallCommand()
        src.ttl.durationMs = 0  # explicitly-present EMPTY submessage
        wire = src.SerializeToString()
        assert wire != b""
        cmd.MergeFromString(wire)
        assert cmd.HasField("ttl")
        assert cmd.SerializeToString() == wire

    def test_read_only_nested_access_keeps_absence(self, sm):
        """The flip side of lazy materialization: merely READING an unset
        child must not fabricate presence — no HasField flip, no bytes on
        the wire, and a oneof stays unset."""
        cmd = sm.StateCallCommand()
        assert cmd.ttl.durationMs == 0  # default view
        assert not cmd.HasField("ttl")
        assert cmd.SerializeToString() == b""
        req = sm.StateRequest()
        assert req.statefulProcessorCall.setHandleState.state == 0
        assert req.WhichOneof("method") is None
        assert req.SerializeToString() == b""


def test_ensure_vendored_protobuf_exports_env_despite_syspath_pollution():
    """r8 in-suite-only tws failure: pytest collection of THIS file puts
    the vendor dir on sys.path, which made the old importability check
    short-circuit and skip the PYTHONPATH export — Spark-spawned Python
    workers inherit env, not sys.path, so the tws driver worker crashed
    on `google.protobuf` ONLY when the whole suite ran. The check must
    key on where the module lives, not whether it imports here."""
    import os
    import subprocess
    import sys

    code = (
        "import sys, os;"
        f"sys.path.append({VENDOR!r});"  # simulate collection pollution
        "from near_public_lakehouse_spark.session import ensure_vendored_protobuf;"
        "ensure_vendored_protobuf();"
        "assert os.environ.get('PYTHONPATH', '').find('vendor') != -1, os.environ.get('PYTHONPATH')"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    subprocess.run(
        [sys.executable, "-c", code],
        check=True,
        env=env,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
