"""S6/S8 metadata parity tail (round 9): $acl passthrough + $tmp scavenge.

Reference semantics under test:
  StreamAcl.cs:11-34 — the $acl document ($r/$w/$d/$mr/$mw role lists)
  lives in the stream's metadata; SURVEY §1.1 maps it to a column of the
  stream_metadata dimension (enforcement out of scope).
  StreamMetadata.cs:23-24,141 + SystemNames.cs:79 ($tmp) +
  TFChunkScavenger.cs:677,724-736 — a stream whose latest metadata has
  BOTH $tb = DeletedStream and $tmp = true is scavenged COMPLETELY,
  metastream included; a normal soft-deleted stream keeps its $tb-only
  metadata so it can be recreated.
"""

from __future__ import annotations

import json

import pytest

from eventstore_spark.engine import EventStoreEngine
from eventstore_spark.schema import MAX_LONG
from eventstore_spark.writer import ProposedEvent


@pytest.fixture()
def engine(spark, tmp_path):
    e = EventStoreEngine(spark, str(tmp_path / "store"))
    yield e
    e.close()


def test_acl_roundtrips_into_the_metadata_dimension(engine):
    engine.append("acct-1", [ProposedEvent("Deposited", "{}")])
    acl = {"$r": ["ops", "audit"], "$w": "svc", "$d": "admins"}
    engine.set_stream_metadata("acct-1", max_count=100, acl=acl)
    row = engine.stream_metadata().where("stream_id = 'acct-1'").first()
    assert row.max_count == 100
    assert json.loads(row.acl) == acl
    assert row.is_temp is None
    # the raw metastream document carries $acl verbatim
    raw = engine.read_stream("$$acct-1").collect()[-1]
    assert json.loads(raw.data)["$acl"] == acl
    # metadata documents REPLACE (latest wins): a later doc without
    # $acl clears the column, like the reference's parsed StreamMetadata
    engine.set_stream_metadata("acct-1", max_count=50)
    row = engine.stream_metadata().where("stream_id = 'acct-1'").first()
    assert row.acl is None and row.max_count == 50


def test_temp_flag_surfaces_in_dimension(engine):
    engine.append("scratch-1", [ProposedEvent("Noted", "{}")])
    engine.set_stream_metadata("scratch-1", temp=True)
    row = engine.stream_metadata().where("stream_id = 'scratch-1'").first()
    assert row.is_temp is True


def test_scavenge_removes_soft_deleted_temp_streams_completely(engine):
    # a temp stream, later disposed: latest metadata = {$tmp, $tb=MAX}
    engine.append("scratch-1", [ProposedEvent("Noted", "{}"),
                                ProposedEvent("Noted", "{}")])
    engine.set_stream_metadata("scratch-1", temp=True)
    engine.set_stream_metadata("scratch-1", temp=True,
                               truncate_before=MAX_LONG)
    # a NORMAL stream soft-deleted the writer's way ($tb-only doc)
    engine.append("norm-1", [ProposedEvent("Noted", "{}")])
    engine.delete_stream("norm-1")
    # an untouched live stream rides along
    engine.append("live-1", [ProposedEvent("Noted", "{}")])

    engine.scavenge()
    left = {(r.stream_id, r.event_type)
            for r in engine.read_all(include_system=True,
                                     visible_only=False).collect()}
    streams_left = {s for s, _ in left}
    # temp stream: EVERYTHING gone — user rows and the metastream
    assert "scratch-1" not in streams_left
    assert "$$scratch-1" not in streams_left
    # normal soft-deleted stream: user rows gone, $tb metadata KEPT
    # (recreation stays possible)
    assert "norm-1" not in streams_left
    assert "$$norm-1" in streams_left
    assert "live-1" in streams_left
    # and recreation-after-scavenge still works for the normal stream
    engine.append("norm-1", [ProposedEvent("Noted", '{"again":1}')])
    rows = engine.read_stream("norm-1").collect()
    assert len(rows) == 1 and rows[0].event_number >= 1
