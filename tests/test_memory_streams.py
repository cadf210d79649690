"""S10: in-memory system streams (`$mem-node-state`, `$mem-gossip`).

Reference semantics under test:
  SingleEventInMemoryStream.cs:15-140 (retain-last-only, rising event
  numbers, always end-of-stream), InMemoryStreamReader.cs:12-57 (NoStream
  for unknown `$mem-` names), InMemoryLog.cs (separate commit counter →
  long-poll works), NodeStateListenerService.cs / GossipListenerService.cs
  (payload shapes), SystemNames.cs:70-72 (`$mem-` predicate).
"""

from __future__ import annotations

import json
import threading
import time

import pytest

from eventstore_spark.engine import EventStoreEngine
from eventstore_spark.writer import ProposedEvent


@pytest.fixture()
def engine(spark, tmp_path):
    e = EventStoreEngine(spark, str(tmp_path / "store"))
    yield e
    e.close()


def test_mem_stream_reads_nostream_before_any_write(engine):
    page = engine.read_stream_page("$mem-node-state")
    assert page.events.count() == 0
    assert page.last_event_number == -1
    assert page.next_event_number == -1
    assert page.is_end_of_stream is True
    # unknown $mem- names answer NoStream too (InMemoryStreamReader.cs:22)
    unknown = engine.read_stream_page("$mem-does-not-exist")
    assert unknown.events.count() == 0
    assert unknown.last_event_number == -1


def test_mem_stream_retains_only_last_event(engine):
    engine.set_node_state("Initializing")
    engine.set_node_state("Leader")
    rows = engine.read_stream("$mem-node-state").collect()
    assert len(rows) == 1  # retain-last-only
    (row,) = rows
    assert row.event_number == 1  # numbers keep rising across replacements
    assert row.event_type == "$NodeStateChanged"
    assert json.loads(row.data) == {"state": "Leader"}
    assert row.stream_id == "$mem-node-state"
    assert row.category is None  # $-prefixed → uncategorized
    page = engine.read_stream_page("$mem-node-state")
    assert page.last_event_number == 1
    assert page.next_event_number == 2
    assert page.is_end_of_stream is True


def test_mem_stream_forward_paging_edges(engine):
    engine.set_node_state("Leader")
    engine.set_node_state("ShuttingDown")  # retained event_number == 1
    # from <= last → the page contains the retained event
    assert engine.read_stream("$mem-node-state", from_event_number=0).count() == 1
    assert engine.read_stream("$mem-node-state", from_event_number=1).count() == 1
    # "from too high → empty read" (SingleEventInMemoryStream.cs:48-52)
    assert engine.read_stream("$mem-node-state", from_event_number=2).count() == 0


def test_mem_stream_backward_paging_edges(engine):
    engine.set_node_state("Leader")
    engine.set_node_state("ShuttingDown")  # retained event_number == 1
    # from the end (None/-1) → the retained event
    page = engine.read_stream_page("$mem-node-state", backward=True)
    assert page.events.count() == 1
    assert page.next_event_number == -1
    # "from too low → empty read" (SingleEventInMemoryStream.cs:94-96):
    # numbers below the retained event are superseded
    assert (
        engine.read_stream("$mem-node-state", from_event_number=0, backward=True)
        .count() == 0
    )
    assert (
        engine.read_stream("$mem-node-state", from_event_number=1, backward=True)
        .count() == 1
    )


def test_mem_read_event_point_read(engine):
    engine.set_node_state("Leader")
    engine.set_node_state("ShuttingDown")
    assert engine.read_event("$mem-node-state", -1).count() == 1
    assert engine.read_event("$mem-node-state", 1).count() == 1
    # the replaced event 0 is gone; only the retained number answers
    assert engine.read_event("$mem-node-state", 0).count() == 0
    assert engine.read_event("$mem-gossip", -1).count() == 0


def test_gossip_payload_shape_and_shared_mem_log(engine):
    r1 = engine.set_node_state("Leader")
    r2 = engine.update_gossip([{"instanceId": "n1", "state": "Leader"}])
    (row,) = engine.read_stream("$mem-gossip").collect()
    assert row.event_type == "$GossipUpdated"
    payload = json.loads(row.data)
    assert payload["nodeId"] == engine.node_id
    assert payload["members"] == [{"instanceId": "n1", "state": "Leader"}]
    # one InMemoryLog per engine: commit positions are monotonic ACROSS
    # mem streams (InMemoryLog.cs:12-16)
    assert r2["log_position"] > r1["log_position"]


def test_mem_streams_never_reach_the_log(engine):
    engine.append("order-1", [ProposedEvent("Placed", "{}")])
    engine.set_node_state("Leader")
    engine.update_gossip([])
    all_rows = engine.read_all()
    assert all_rows.where("stream_id like '$mem-%'").count() == 0
    # and client appends can't leak mem names into shared storage
    with pytest.raises(ValueError, match="in-memory"):
        engine.append("$mem-node-state", [ProposedEvent("X", "{}")])


def test_mem_long_poll_wakes_on_mem_commit(engine):
    engine.set_node_state("Initializing")  # event 0

    def later():
        time.sleep(0.4)
        engine.set_node_state("Leader")  # event 1

    t = threading.Thread(target=later)
    t.start()
    t0 = time.monotonic()
    rows = engine.poll_stream("$mem-node-state", from_event_number=1,
                              timeout_s=10.0).collect()
    elapsed = time.monotonic() - t0
    t.join()
    assert len(rows) == 1
    assert json.loads(rows[0].data) == {"state": "Leader"}
    assert elapsed < 8.0  # woke on the mem commit, not the timeout
    # timeout path: no matching event → empty result after the deadline
    assert engine.poll_stream("$mem-node-state", from_event_number=5,
                              timeout_s=0.3).count() == 0


def test_mem_long_poll_write_landing_inside_the_wait_baseline_capture(engine):
    """Check-then-wait race (fixed r9): a write landing between the
    poll's stream-state check and its wait-baseline capture must not be
    absorbed into the baseline — the old ordering (check, THEN capture
    `last_commit_position()`) stalled such a poll until the NEXT mem
    commit or the full timeout despite the event being present. The fix
    captures the baseline BEFORE the check (the same ordering the
    log-side long-poll uses against the writer's commit condition)."""
    router = engine.memory_streams
    stream = router.stream("$mem-node-state")
    stream.write("$NodeStateChanged", json.dumps({"state": "Initializing"}))

    orig = router.mem_log.last_commit_position
    fired = []

    def racing_last_commit_position():
        # Land the write "inside" the position capture — visible in the
        # returned position, concurrent with the check.
        if not fired:
            fired.append(True)
            stream.write("$NodeStateChanged", json.dumps({"state": "Leader"}))
        return orig()

    router.mem_log.last_commit_position = racing_last_commit_position
    try:
        t0 = time.monotonic()
        rows = router.poll("$mem-node-state", from_event_number=1,
                           timeout_s=5.0).collect()
        elapsed = time.monotonic() - t0
    finally:
        router.mem_log.last_commit_position = orig
    assert len(rows) == 1
    assert json.loads(rows[0].data) == {"state": "Leader"}
    assert elapsed < 2.0  # answered on the check, not the 5 s timeout


def test_mem_long_poll_concurrent_writes_never_stall_to_timeout(engine):
    """Stress the window with real concurrency: a writer thread racing
    each poll at varying offsets around the check. Every poll must
    return the event well before its timeout (the old race showed up as
    a full-timeout stall despite the event being present)."""
    router = engine.memory_streams
    stream = router.stream("$mem-gossip")
    # Warm the Spark DataFrame-construction path (the page materializer)
    # outside the timed loop: the loop times the WAIT mechanism, and the
    # first createDataFrame call costs ~1 s on a cold/loaded session —
    # enough to breach the bound without any stall.
    router.read_page("$mem-gossip").events.count()
    timeout_s = 2.0
    for i in range(12):
        delay = (i % 4) * 0.0005  # straddle the check window
        t = threading.Thread(
            target=lambda n=i, d=delay: (time.sleep(d), stream.write(
                "$GossipUpdated", json.dumps({"n": n}))))
        t0 = time.monotonic()
        t.start()
        page = router.poll("$mem-gossip", from_event_number=i,
                           timeout_s=timeout_s)
        elapsed = time.monotonic() - t0
        t.join()
        assert page.count() == 1
        assert elapsed < 1.5, f"iteration {i} stalled ({elapsed:.2f}s)"


def test_mem_write_publishes_only_after_event_visible(engine):
    """The write path's ordering invariant, pinned deterministically: at
    publish time the retained event must already be visible. The inverse
    order (publish, then assign) re-opens the stall — a poller woken by
    the publish sees no event, re-captures a baseline that includes this
    position, and parks until the NEXT write or its full timeout."""
    router = engine.memory_streams
    stream = router.stream("$mem-node-state")
    log = router.mem_log
    orig = log.publish_commit_position
    seen = []

    def checking_publish(pos):
        last = stream._last
        seen.append(last is not None and last["log_position"] == pos)
        orig(pos)

    log.publish_commit_position = checking_publish
    try:
        stream.write("$NodeStateChanged", json.dumps({"state": "leader"}))
        stream.write("$NodeStateChanged", json.dumps({"state": "follower"}))
    finally:
        log.publish_commit_position = orig
    assert seen == [True, True]
