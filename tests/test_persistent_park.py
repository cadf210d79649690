"""U4 park-to-stream dead-lettering + consumer-group liveness.

Reference semantics under test:
  PersistentSubscriptionMessageParker.cs:33,68-90 (parked stream name +
  LinkTo body/metadata), :202-208 (replay truncates via $tb);
  PersistentSubscription.cs:474-502 (NakAction handling incl. Stop),
  :530-608 (ReplayParked), :673 (retry-exhaustion park reason);
  PersistentSubscriptionParams LiveBufferSize (outstanding cap).
Plus the round-8 liveness fix: a group must deliver events appended
AFTER it was created (the engine passes the events callable, not a
pinned snapshot).
"""

from __future__ import annotations

import json

import pytest

from eventstore_spark.engine import EventStoreEngine
from eventstore_spark.streaming.persistent import (
    NAK_PARK,
    NAK_STOP,
    PersistentSubscriptionSettings,
)
from eventstore_spark.writer import ProposedEvent


@pytest.fixture()
def engine(spark, tmp_path):
    e = EventStoreEngine(spark, str(tmp_path / "store"))
    yield e
    e.close()


def _pump(ps, consumer="c1", now=1000.0):
    out = ps.fetch(now=now)
    return out.get(consumer, [])


def test_live_group_sees_post_creation_appends(engine):
    engine.append("orders-1", [ProposedEvent("Placed", '{"n":1}')])
    ps = engine.persistent_subscription("grp", "orders-1")
    ps.add_consumer("c1")
    assert len(_pump(ps)) == 1
    # appended AFTER the group existed — a pinned-snapshot group would
    # never see these (the round-8 staleness fix)
    engine.append("orders-1", [ProposedEvent("Placed", '{"n":2}'),
                               ProposedEvent("Placed", '{"n":3}')])
    assert len(_pump(ps)) == 2


def test_nak_park_writes_dead_letter_stream(engine):
    engine.append("orders-1", [ProposedEvent("Placed", '{"n":1}'),
                               ProposedEvent("Placed", '{"n":2}')])
    ps = engine.persistent_subscription("grp", "orders-1")
    ps.add_consumer("c1")
    got = _pump(ps)
    assert len(got) == 2
    ps.nack([got[0]], NAK_PARK, reason="poison")
    # the delivery is dropped (checkpoint can advance past it) …
    assert got[0] not in ps._deliveries
    ps.checkpoint()
    assert ps._checkpointed_position > got[0]
    # … and the dead letter is a LINK event in the group's parked stream
    rows = engine.read_stream(ps.parked_stream_id).collect()
    assert len(rows) == 1
    assert rows[0].event_type == "$>"
    # body "{event_number}@{source}" (MessageParker GetLinkToFor)
    assert rows[0].data == "0@orders-1"
    meta = json.loads(rows[0].metadata)
    assert meta["subscriptionEventNumber"] == got[0]
    assert "poison" in meta["reason"]
    assert ps.parked() == [got[0]]
    assert ps.parked_message_count() == 1
    # parked link resolves to the original event like any link stream
    resolved = engine.read_stream(
        ps.parked_stream_id, resolve_link_tos=True
    ).collect()
    assert json.loads(resolved[0].data)["n"] == 1


def test_replay_parked_resolves_and_truncates(engine):
    engine.append("orders-1", [ProposedEvent("Placed", f'{{"n":{i}}}')
                               for i in range(3)])
    ps = engine.persistent_subscription("grp", "orders-1")
    ps.add_consumer("c1")
    got = _pump(ps)
    ps.nack(got[:2], NAK_PARK)
    ps.ack(got[2:])
    assert ps.parked_message_count() == 2
    # replay: both re-buffered with fresh retry counts, stream truncated
    assert ps.replay_parked() == 2
    assert ps.parked() == []
    assert ps.parked_message_count() == 0
    redelivered = _pump(ps, now=2000.0)
    assert sorted(redelivered) == sorted(got[:2])
    assert all(ps._deliveries[p].retry_count == 0 for p in redelivered)
    # parking after a replay lands BEYOND the truncation point
    ps.nack([redelivered[0]], NAK_PARK)
    assert ps.parked_message_count() == 1
    assert ps.parked() == [redelivered[0]]


def test_retry_exhaustion_parks_to_stream(engine):
    engine.append("orders-1", [ProposedEvent("Placed", '{"n":1}')])
    s = PersistentSubscriptionSettings(message_timeout_s=1.0, max_retry_count=1)
    ps = engine.persistent_subscription("grp", "orders-1", settings=s)
    ps.add_consumer("c1")
    t = 1000.0
    assert len(_pump(ps, now=t)) == 1
    # two timeouts blow max_retry_count=1 → parked, not redelivered
    t += 5.0
    assert _pump(ps, now=t) == [ps._buffer_head - 1]  # first redelivery
    t += 5.0
    assert _pump(ps, now=t) == []
    assert ps.parked_message_count() == 1
    meta = json.loads(
        engine.read_stream(ps.parked_stream_id).collect()[0].metadata
    )
    assert meta["reason"] == "Reached retry count of 1"


def test_live_buffer_size_caps_outstanding(engine):
    engine.append("orders-1", [ProposedEvent("Placed", f'{{"n":{i}}}')
                               for i in range(10)])
    s = PersistentSubscriptionSettings(live_buffer_size=3, read_batch_size=100)
    ps = engine.persistent_subscription("grp", "orders-1", settings=s)
    ps.add_consumer("c1")
    got = _pump(ps)
    assert len(got) == 3  # capped, not 10
    assert len(ps._deliveries) == 3
    # without acks the table stays capped …
    assert _pump(ps, now=1001.0) == []
    assert len(ps._deliveries) == 3
    # … acking frees slots for the next range
    ps.ack(got)
    assert len(_pump(ps, now=1002.0)) == 3
    assert ps.backlog() == 4  # 10 - 6 pulled


def test_nak_stop_halts_delivery_until_resume(engine):
    engine.append("orders-1", [ProposedEvent("Placed", '{"n":1}'),
                               ProposedEvent("Placed", '{"n":2}')])
    ps = engine.persistent_subscription("grp", "orders-1")
    ps.add_consumer("c1")
    got = _pump(ps)
    ps.nack([got[0]], NAK_STOP)
    assert ps.stopped is True
    assert _pump(ps, now=2000.0) == []
    ps.resume()
    # the stopped message was never consumed — it redelivers after its
    # timeout like any other outstanding message
    assert len(_pump(ps, now=3000.0)) > 0


def test_stats_metric_shape(engine):
    engine.append("orders-1", [ProposedEvent("Placed", f'{{"n":{i}}}')
                               for i in range(4)])
    ps = engine.persistent_subscription("grp", "orders-1")
    ps.add_consumer("c1")
    got = _pump(ps)
    ps.ack(got[:2])
    ps.nack([got[2]], NAK_PARK)
    st = ps.stats()
    # metrics.md §Persistent Subscriptions gauge/counter names
    assert st["connections"] == 1
    assert st["parked_messages"] == 1
    assert st["in_flight_messages"] == 1  # got[3] still out
    assert st["items_processed_total"] == 2
    assert st["last_known_event_commit_position"] == max(got)
    age = st["oldest_parked_message_seconds"]
    assert age is not None and 0.0 <= age < 3600.0
    # acking the rest empties the gauges but not the counter
    ps.ack([got[3]])
    st2 = ps.stats()
    assert st2["in_flight_messages"] == 0
    assert st2["items_processed_total"] == 3


def test_all_group_never_consumes_own_parked_stream(engine):
    engine.append("orders-1", [ProposedEvent("Placed", '{"n":1}')])
    ps = engine.persistent_subscription("grp")  # $all group
    ps.add_consumer("c1")
    got = _pump(ps)
    # unfiltered $all also delivers the group's own config event —
    # park everything delivered so far
    assert len(got) >= 1
    ps.nack(got, NAK_PARK)
    # the parked link row is in the log now, but must NOT feed the group
    # back its own dead letters (infinite park loop otherwise)
    again = _pump(ps, now=2000.0)
    delivered_streams = {ps._deliveries[p].stream_id for p in again}
    assert ps.parked_stream_id not in delivered_streams


def test_checkpoint_stream_resumes_group_across_attachments(engine):
    """The group's position survives in the `-checkpoint` STREAM
    (PersistentSubscriptionCheckpointWriter.cs:22,48-77): checkpoints
    append $SubscriptionCheckpoint events ($maxCount=2 stamped once);
    a fresh attachment with NO file checkpoint resumes past everything
    acked before."""
    import json as _json

    for i in range(6):
        engine.append("pay-1", [ProposedEvent("Paid", '{"n": %d}' % i)])
    s = PersistentSubscriptionSettings(checkpoint_after=3)
    ps = engine.persistent_subscription("ck", "pay-1", settings=s)
    ps.add_consumer("c1")
    got = _pump(ps)
    assert len(got) == 6
    ps.ack(got[:4])  # 4 acks >= checkpoint_after -> checkpoint written
    rows = engine.read_stream(ps.checkpoint_stream_id).collect()
    assert [r.event_type for r in rows] == ["$SubscriptionCheckpoint"]
    pos = int(_json.loads(rows[0].data))
    assert pos == got[4]  # lowest OUTSTANDING delivery
    # $maxCount=2 stamped once on the checkpoint stream
    md = {r.stream_id: r for r in engine.stream_metadata().collect()}
    assert md[ps.checkpoint_stream_id].max_count == 2
    # fresh attachment, no checkpoint_dir: resumes from the stream —
    # the 4 acked messages are never redelivered
    ps2 = engine.persistent_subscription("ck", "pay-1", settings=s)
    ps2.add_consumer("c1")
    got2 = _pump(ps2)
    assert got2 == got[4:]


def test_checkpoint_stream_retention_keeps_two(engine):
    """Repeated checkpoints stay bounded: $maxCount=2 keeps only the two
    most recent $SubscriptionCheckpoint events visible."""
    for i in range(9):
        engine.append("pay-2", [ProposedEvent("Paid", '{"n": %d}' % i)])
    s = PersistentSubscriptionSettings(checkpoint_after=1)
    ps = engine.persistent_subscription("ck2", "pay-2", settings=s)
    ps.add_consumer("c1")
    got = _pump(ps)
    for p in got:
        ps.ack([p])  # one checkpoint per ack
    vis = engine.read_stream(ps.checkpoint_stream_id).count()
    assert vis == 2


def test_delete_persistent_subscription_drops_group_state(engine):
    """PersistentSubscriptions.Delete analog: the group's -checkpoint and
    -parked streams are soft-deleted
    (PersistentSubscriptionCheckpointWriter.BeginDelete) and the removal
    lands in $persistentSubscriptionConfig; a later re-creation starts
    the group fresh."""
    engine.append("ship-1", [ProposedEvent("Shipped", '{"n": 0}'),
                             ProposedEvent("Shipped", '{"n": 1}')])
    s = PersistentSubscriptionSettings(checkpoint_after=1, max_retry_count=0)
    ps = engine.persistent_subscription("dg", "ship-1", settings=s)
    ps.add_consumer("c1")
    got = _pump(ps)
    ps.ack(got[:1])                       # -> checkpoint stream exists
    ps.nack(got[1:], action="park")       # -> parked stream exists
    assert engine.read_stream(ps.checkpoint_stream_id).count() >= 1
    assert engine.read_stream(ps.parked_stream_id).count() == 1

    out = engine.delete_persistent_subscription("dg", "ship-1")
    assert sorted(out["dropped_streams"]) == sorted(
        [ps.checkpoint_stream_id, ps.parked_stream_id])
    assert engine.read_stream(ps.checkpoint_stream_id).count() == 0
    assert engine.read_stream(ps.parked_stream_id).count() == 0
    cfg = [json.loads(r.data) for r in
           engine.read_stream("$persistentSubscriptionConfig").collect()]
    assert {"group": "dg", "stream": "ship-1", "deleted": True,
            "generation": 0} in cfg
    # re-created group starts fresh (no stale checkpoint resurrection)
    ps2 = engine.persistent_subscription("dg", "ship-1", settings=s)
    ps2.add_consumer("c1")
    assert len(_pump(ps2)) == 2


def test_group_config_replay_survives_recreation(engine):
    """Config records carry the group's deletion GENERATION, so a
    create→delete→re-create sequence appends three distinct records (a
    replay ends 'live', not 'deleted'), while double-deleting or
    re-attaching within one life still dedupes."""
    engine.append("inv-1", [ProposedEvent("Inv", "{}")])
    s = PersistentSubscriptionSettings()
    engine.persistent_subscription("gr", "inv-1", settings=s)
    engine.persistent_subscription("gr", "inv-1", settings=s)  # re-attach
    engine.delete_persistent_subscription("gr", "inv-1")
    engine.delete_persistent_subscription("gr", "inv-1")  # double delete
    engine.persistent_subscription("gr", "inv-1", settings=s)  # 2nd life

    docs = [json.loads(r.data) for r in
            engine.read_stream("$persistentSubscriptionConfig").collect()
            if json.loads(r.data).get("group") == "gr"]
    shapes = [(d.get("generation"), bool(d.get("deleted"))) for d in docs]
    assert shapes == [(0, False), (0, True), (1, False)]


def test_engine_replay_parked_messages_rpc_shape(engine):
    """ReplayParked at the SERVICE level (persistent.proto:13): addressed
    by (group, stream) with no live subscription object — the group is
    rebuilt from its config record, so the call works after a restart.
    Unknown groups raise (the RPC's NotFound)."""
    engine.append("orders-1", [ProposedEvent("Placed", f'{{"n":{i}}}')
                               for i in range(3)])
    ps = engine.persistent_subscription("grp", "orders-1")
    ps.add_consumer("c1")
    got = _pump(ps)
    ps.nack(got[:2], NAK_PARK)
    ps.ack(got[2:])
    ps.checkpoint()
    assert ps.parked_message_count() == 2
    del ps  # nothing live holds the group
    assert engine.replay_parked_messages("grp", "orders-1") == 2
    # the rebuilt group sees the replayed messages as available again
    ps2 = engine.persistent_subscription("grp", "orders-1")
    ps2.add_consumer("c1")
    assert ps2.parked_message_count() == 0
    redelivered = _pump(ps2, now=2000.0)
    assert len(redelivered) == 2
    with pytest.raises(LookupError):
        engine.replay_parked_messages("nope", "orders-1")
