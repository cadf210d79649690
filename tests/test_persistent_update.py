"""U4 update_persistent_subscription (round 9).

Reference semantics under test: persistent.proto:9 (Update RPC);
PersistentSubscriptionService.cs:456-550 UpdatePersistentSubscription —
the group must EXIST (onNotExist :486-489), the strategy must be
registered (ValidateStrategy :491-494), the rebuilt subscription keeps
the group's key and therefore its store-backed checkpoint stream and
parked dead-letter stream, in-flight messages redeliver from the
checkpoint under the NEW settings, and the config change is saved
(UpdateSubscriptionConfig + SaveConfiguration :547-549) so a config
replay ends in the updated state.
"""

from __future__ import annotations

import pytest

from eventstore_spark.engine import EventStoreEngine
from eventstore_spark.streaming.persistent import (
    NAK_PARK,
    PersistentSubscriptionSettings,
)
from eventstore_spark.writer import ProposedEvent


@pytest.fixture()
def engine(spark, tmp_path):
    e = EventStoreEngine(spark, str(tmp_path / "store"))
    yield e
    e.close()


def _settings(**kw):
    st = PersistentSubscriptionSettings()
    for k, v in kw.items():
        setattr(st, k, v)
    return st


def test_update_requires_existing_group(engine):
    with pytest.raises(LookupError, match="does not exist"):
        engine.update_persistent_subscription("ghost", "orders-1")
    # ... and a DELETED group is gone for update purposes too
    engine.persistent_subscription("grp", "orders-1")
    engine.delete_persistent_subscription("grp", "orders-1")
    with pytest.raises(LookupError, match="does not exist"):
        engine.update_persistent_subscription("grp", "orders-1")


def test_update_validates_consumer_strategy(engine):
    engine.persistent_subscription("grp", "orders-1")
    with pytest.raises(ValueError, match="strategy"):
        engine.update_persistent_subscription(
            "grp", "orders-1",
            settings=_settings(consumer_strategy="no_such_strategy"))


def test_update_preserves_checkpoint_and_parked_redelivers_inflight(engine):
    engine.append("orders-1", [
        ProposedEvent("Placed", '{"n":%d}' % i) for i in range(5)
    ])
    ps = engine.persistent_subscription(
        "grp", "orders-1",
        settings=_settings(message_timeout_s=30.0, checkpoint_after=1))
    ps.add_consumer("c1")
    got = ps.fetch(now=1000.0)["c1"]
    assert len(got) == 5
    ps.ack(got[:2])           # events 0,1 done
    ps.nack([got[2]], NAK_PARK, reason="poison")  # event 2 dead-lettered
    ps.checkpoint()           # store-backed checkpoint above 0,1,2
    # events 3,4 stay IN FLIGHT (unacked) across the update
    updated = engine.update_persistent_subscription(
        "grp", "orders-1",
        settings=_settings(message_timeout_s=5.0,
                           consumer_strategy="dispatch_to_single"))
    assert updated.settings.message_timeout_s == 5.0
    updated.add_consumer("c2")
    redelivered = updated.fetch(now=2000.0).get("c2", [])
    # resumes from the preserved checkpoint: exactly the unacked 3,4 —
    # the acked ones stay done, the parked one stays parked
    assert redelivered == got[3:]
    # the parked dead-letter stream carried over UNTOUCHED (the old
    # delete+recreate path dropped it)
    assert updated.parked_message_count() == 1
    rows = engine.read_stream(updated.parked_stream_id).collect()
    assert [r.data for r in rows] == ["2@orders-1"]
    # the NEW settings govern redelivery: timeout is now 5 s, so the
    # in-flight pair re-dispatches at +6 s (old timeout 30 s would not)
    again = updated.fetch(now=2006.0).get("c2", [])
    assert again == got[3:]


def test_update_config_replay_ends_in_updated_state(engine):
    engine.persistent_subscription(
        "grp", "orders-1", settings=_settings(message_timeout_s=30.0))
    engine.update_persistent_subscription(
        "grp", "orders-1", settings=_settings(message_timeout_s=7.0,
                                              max_retry_count=2))
    groups = engine.list_persistent_subscriptions()
    assert len(groups) == 1
    g = groups[0]
    assert g["group"] == "grp" and g["stream"] == "orders-1"
    assert g["messageTimeoutMs"] == 7000
    assert g["maxRetryCount"] == 2
    # A -> B -> A must END AT A: update records are rev-stamped so the
    # third record is not deduped against the first
    engine.update_persistent_subscription(
        "grp", "orders-1", settings=_settings(message_timeout_s=30.0))
    g = engine.list_persistent_subscriptions()[0]
    assert g["messageTimeoutMs"] == 30000
    assert g["maxRetryCount"] == 5  # back to the default-A settings


def test_list_survives_restart_and_drops_deleted_groups(engine, spark):
    engine.persistent_subscription("g1", "orders-1")
    engine.persistent_subscription("g2", None)  # $all group
    engine.delete_persistent_subscription("g1", "orders-1")
    # a FRESH engine over the same store rebuilds the listing purely
    # from the config stream (the server's restart path)
    e2 = EventStoreEngine(spark, engine.path)
    names = [(g["group"], g["stream"])
             for g in e2.list_persistent_subscriptions()]
    assert names == [("g2", "$all")]


def test_get_info_reports_positions_and_parked(engine):
    engine.append("orders-1", [
        ProposedEvent("Placed", "{}") for _ in range(3)
    ])
    ps = engine.persistent_subscription("grp", "orders-1")
    ps.add_consumer("c1")
    got = ps.fetch(now=1000.0)["c1"]
    ps.ack(got[:1])
    ps.nack([got[1]], NAK_PARK, reason="bad")
    ps.checkpoint()
    info = engine.get_persistent_subscription_info("grp", "orders-1")
    assert info["group"] == "grp"
    assert info["parkedMessageCount"] == 1
    assert info["checkpointedPosition"] is not None
    assert info["checkpointedPosition"] >= got[1]
    with pytest.raises(LookupError):
        engine.get_persistent_subscription_info("nope", "orders-1")


def test_update_inherits_stored_filter_and_start_from(engine):
    """The reference's Update keeps the OLD subscription's event source
    (genEventSource(oldSubscription), PersistentSubscriptionService.cs
    :500) — filter included. The group's filter and StartFrom live in
    its config entry (PersistentSubscriptionEntry Filter/StartPosition),
    so an update that names neither inherits both."""
    from eventstore_spark.operators.filters import EventFilter

    engine.append("acct-1", [ProposedEvent("Deposited", "{}")])
    engine.append("chat-1", [ProposedEvent("MessageSent", "{}")])
    filt = EventFilter(stream_prefixes=("acct-",))
    engine.persistent_subscription("flt", None, event_filter=filt)
    updated = engine.update_persistent_subscription(
        "flt", None, settings=_settings(message_timeout_s=9.0))
    # inherited filter still selects only acct- events
    updated.add_consumer("c1")
    got = updated.fetch(now=100.0).get("c1", [])
    assert len(got) == 1
    assert updated.event_filter == filt
    # and the config records carry the filter document
    g = engine.list_persistent_subscriptions()[0]
    assert g["filter"] == {"streamPrefixes": ["acct-"]}
    assert g["messageTimeoutMs"] == 9000


def test_create_start_from_skips_history_until_checkpoint_wins(engine):
    engine.append("acct-1", [ProposedEvent("Deposited", "{}"),
                             ProposedEvent("Deposited", "{}")])
    pos = max(r.log_position for r in engine.read_stream("acct-1").collect())
    # start the group at the log head: history is not delivered
    ps = engine.persistent_subscription("tail", "acct-1",
                                        start_from=pos + 1)
    ps.add_consumer("c1")
    assert ps.fetch(now=10.0).get("c1", []) == []
    engine.append("acct-1", [ProposedEvent("Deposited", '{"new":1}')])
    got = ps.fetch(now=11.0).get("c1", [])
    assert len(got) == 1
    g = engine.list_persistent_subscriptions()[0]
    assert g["startFrom"] == pos + 1


def test_restart_persistent_subscriptions_rebuilds_from_config(engine):
    """Operations.RestartPersistentSubscriptions (operations.proto:14):
    every current group rebuilds from config replay with its recorded
    settings/filter, resuming from its store-backed checkpoint."""
    from eventstore_spark.operators.filters import EventFilter

    engine.append("acct-1", [ProposedEvent("Deposited", '{"n":%d}' % i)
                             for i in range(3)])
    ps = engine.persistent_subscription(
        "g1", "acct-1", settings=_settings(message_timeout_s=12.0,
                                           checkpoint_after=1))
    ps.add_consumer("c1")
    got = ps.fetch(now=10.0)["c1"]
    ps.ack(got[:2])
    ps.checkpoint()
    engine.persistent_subscription(
        "g2", None, event_filter=EventFilter(stream_prefixes=("acct-",)))
    engine.delete_persistent_subscription("g2", None)  # deleted -> absent

    rebuilt = engine.restart_persistent_subscriptions()
    assert [p.group for p in rebuilt] == ["g1"]
    (p1,) = rebuilt
    assert p1.settings.message_timeout_s == 12.0
    p1.add_consumer("cx")
    # resumes AFTER the store-backed checkpoint: only the unacked third
    assert p1.fetch(now=20.0)["cx"] == got[2:]
