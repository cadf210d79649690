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
from eventstore_spark.operators.filters import EventFilter
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


def test_cache_control_passthrough(engine):
    engine.append("acct-2", [ProposedEvent("Deposited", "{}")])
    engine.set_stream_metadata("acct-2", cache_control_seconds=120)
    row = engine.stream_metadata().where("stream_id = 'acct-2'").first()
    assert row.cache_control_seconds == 120


def test_effective_acl_fallback_chain(engine):
    """GetEffectiveAcl (IndexReader.cs:832-850): own $acl > $settings
    default for the stream's class > SystemSettings.Default."""
    engine.append("acct-1", [ProposedEvent("Deposited", "{}")])
    # 1. nothing set anywhere: built-in defaults
    eff = engine.effective_acl("acct-1")
    assert eff["acl"] == engine.DEFAULT_USER_ACL
    assert engine.effective_acl("$ce-acct")["acl"] == engine.DEFAULT_SYSTEM_ACL
    # 2. a $settings document overrides the class default
    #    (IndexCommitter.cs:316-317: LAST $settings event wins)
    engine.append("$settings", [ProposedEvent(
        "$settings", json.dumps({
            "$userStreamAcl": {"$r": "readers", "$w": "writers"},
            "$systemStreamAcl": {"$r": "$ops"},
        }))])
    eff = engine.effective_acl("acct-1")
    assert eff["acl"] == {"$r": "readers", "$w": "writers"}
    assert eff["default_acl"] == engine.DEFAULT_USER_ACL
    assert engine.effective_acl("$ce-acct")["acl"] == {"$r": "$ops"}
    # 3. the stream's own $acl beats the settings default
    engine.set_stream_metadata("acct-1", acl={"$r": "vip"})
    eff = engine.effective_acl("acct-1")
    assert eff["acl"] == {"$r": "vip"}
    assert eff["system_acl"] == {"$r": "readers", "$w": "writers"}
    # system_settings() exposes the raw current document
    assert engine.system_settings()["$systemStreamAcl"] == {"$r": "$ops"}


def test_subscribe_with_markers_engine_surface(engine, tmp_path):
    """engine.subscribe_with_markers delegates to start_with_markers —
    the reference enumerator's in-band CaughtUp contract, first-class
    on the engine."""
    engine.append("acct-1", [ProposedEvent("Deposited", "{}"),
                             ProposedEvent("Withdrawn", "{}")])
    seen, markers = [], []
    q = engine.subscribe_with_markers(
        lambda df, b: seen.extend(r.stream_id for r in df.collect()),
        lambda kind, b: markers.append(kind),
        checkpoint_location=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    assert seen == ["acct-1", "acct-1"]
    assert "CaughtUp" in markers


def test_subscription_resolve_link_tos(engine, tmp_path):
    """ResolveLinkTos on the subscription surface (streams.proto
    ReadReq.Options; the reference enumerator resolves `$>` rows into
    ResolvedEvent link+target pairs): the batch's links resolve against
    a FRESH log snapshot, so targets committed after the subscription
    started still resolve."""
    engine.append("acct-1", [ProposedEvent("Deposited", '{"amt":1}')])
    engine.append("idx-1", [ProposedEvent("$>", "0@acct-1", is_json=False)])
    got = []
    q = engine.subscribe_with_markers(
        lambda df, b: got.extend(df.collect()),
        lambda kind, b: None,
        checkpoint_location=str(tmp_path / "ckpt2"),
        event_filter=EventFilter(stream_prefixes=("idx-",)),
        available_now=True,
        resolve_link_tos=True,
    )
    q.awaitTermination()
    assert len(got) == 1
    (r,) = got
    assert r.stream_id == "acct-1"          # the TARGET's identity
    assert json.loads(r.data)["amt"] == 1   # target payload delivered
    assert r.link_stream_id == "idx-1"      # link identity rides along
    assert r.link_event_number == 0


def test_supported_methods_reflects_live_surface(engine):
    """ServerFeatures.GetSupportedMethods analog: every listed method
    maps to a callable that actually exists on the engine, and the core
    services are all present."""
    methods = engine.supported_methods()
    pairs = {(m["service"], m["method"]) for m in methods}
    assert ("streams", "read") in pairs
    assert ("persistent_subscriptions", "update") in pairs
    assert ("projections", "reset") in pairs
    assert ("server_features", "get_supported_methods") in pairs
    assert len(pairs) == len(methods)  # no duplicates
    assert len(pairs) >= 20
