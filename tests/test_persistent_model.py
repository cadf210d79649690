"""Randomized model check of the consumer-group delivery state machine.

A seeded random walk of fetch/ack/nack/timeout/consumer-churn steps
against a reference model, asserting the delivery invariants the
reference's PersistentSubscription maintains:

  * exclusive delivery — an outstanding position is inflight to at most
    one consumer at a time;
  * acked is forever — an acked position is never delivered again;
  * park is terminal until replay — parked positions don't redeliver
    by themselves;
  * liveness — with consumers attached and everything acked, every
    selectable event is eventually delivered at least once;
  * conservation — delivered ⊆ selectable, and acked ∪ parked ∪
    outstanding ∪ undelivered partitions the selectable set.
"""

from __future__ import annotations

import random

import pytest

from eventstore_spark.schema import EVENTS_SCHEMA
from eventstore_spark.streaming.persistent import (
    NAK_PARK,
    NAK_RETRY,
    NAK_SKIP,
    PersistentSubscription,
    PersistentSubscriptionSettings,
)


@pytest.fixture(scope="module")
def fixed_log(spark):
    rows = [
        (i, f"s-{i % 5}", "s", i // 5, f"e{i}", "Evt", "{}", None, None, True)
        for i in range(1, 41)
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA).cache()


def test_delivery_state_machine_random_walk(fixed_log):
    rng = random.Random(8)
    s = PersistentSubscriptionSettings(
        message_timeout_s=5.0, max_retry_count=2, read_batch_size=7,
        checkpoint_after=1000, live_buffer_size=15,
    )
    ps = PersistentSubscription(fixed_log, "model", None, s)
    consumers = ["c1", "c2", "c3"]
    for c in consumers:
        ps.add_consumer(c)

    selectable = set(range(1, 41))
    now = 1000.0
    acked: set[int] = set()
    skipped: set[int] = set()
    inflight: dict[int, str] = {}  # model: position -> consumer
    ever_delivered: set[int] = set()

    for step in range(120):
        action = rng.random()
        if action < 0.55:
            out = ps.fetch(now=now)
            for c, positions in out.items():
                for p in positions:
                    # exclusive delivery: not already inflight elsewhere
                    assert p not in inflight, f"step {step}: double delivery of {p}"
                    # acked/skipped positions never redeliver
                    assert p not in acked, f"step {step}: redelivered acked {p}"
                    assert p not in skipped, f"step {step}: redelivered skipped {p}"
                    assert p in selectable
                    inflight[p] = c
                    ever_delivered.add(p)
        elif action < 0.75 and inflight:
            take = rng.sample(sorted(inflight), min(3, len(inflight)))
            ps.ack(take)
            for p in take:
                acked.add(p)
                del inflight[p]
        elif action < 0.85 and inflight:
            p = rng.choice(sorted(inflight))
            kind = rng.choice([NAK_RETRY, NAK_PARK, NAK_SKIP])
            ps.nack([p], kind)
            del inflight[p]
            if kind == NAK_SKIP:
                skipped.add(p)
            elif kind == NAK_RETRY:
                d = ps._deliveries.get(p)
                if d is not None and d.state == "parked":
                    pass  # retry exhausted → parked
        elif action < 0.92:
            now += s.message_timeout_s + 1  # everything inflight times out
            # model: timed-out messages may redeliver (to anyone) — drop
            # our inflight claim so the next fetch can reassign them
            inflight.clear()
        else:
            c = rng.choice(consumers)
            ps.remove_consumer(c)
            # released messages may redeliver elsewhere
            inflight = {p: cc for p, cc in inflight.items() if cc != c}
            ps.add_consumer(c)

    # conservation: every delivery-table entry is selectable and not acked
    for p, d in ps._deliveries.items():
        assert p in selectable
        assert p not in acked and p not in skipped

    # drain: replay parked, time out stragglers, ack everything delivered
    ps.replay_parked()
    for _ in range(40):
        now += s.message_timeout_s + 1
        out = ps.fetch(now=now)
        got = [p for positions in out.values() for p in positions]
        for p in got:
            assert p not in acked and p not in skipped
            ever_delivered.add(p)
        ps.ack(got)
        acked.update(got)
        if not ps._deliveries and ps.backlog() == 0:
            break

    # liveness: everything selectable was delivered at least once and is
    # now accounted for exactly once
    assert ever_delivered == selectable
    assert acked | skipped == selectable
    assert ps._deliveries == {}
    ps.checkpoint()
    assert ps._checkpointed_position == ps._buffer_head
