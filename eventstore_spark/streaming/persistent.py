"""Persistent subscriptions — server-side consumer groups (SURVEY §2.6 U4-U5).

Reference: PersistentSubscription.cs — a per-group server state machine:
buffered fetch, per-message delivery state, MessageTimeout redelivery,
MaxRetryCount then PARK to `$persistentsubscription-<src>::<grp>-parked`,
ack/nack (NakAction Park/Retry/Skip/Stop), periodic checkpoints; consumer
strategies RoundRobin / DispatchToSingle / Pinned (ConsumerStrategy/*.cs).

Spark-first shape: the LOG stays a DataFrame; what a consumer group adds is
a small DELIVERY-STATE table (one row per in-delivery message per group —
bounded by buffer size, not by log size). That table lives driver-side and
persists as parquet; message payloads are only ever touched as DataFrame
batches fetched by log_position range. At scale this is the same design:
delivery state is OLTP-small (the reference caps it with LiveBufferSize),
while the firehose remains columnar.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..operators.filters import EventFilter
from ..operators.system_projections import (
    is_system_stream_name,
    system_stream_predicate,
)

# NakAction (persistent.proto / PersistentSubscription.cs)
NAK_RETRY = "retry"
NAK_PARK = "park"
NAK_SKIP = "skip"


@dataclass
class PersistentSubscriptionSettings:
    """Mirrors PersistentSubscriptionParams.cs:10-141 (subset that affects
    delivery semantics)."""

    message_timeout_s: float = 30.0
    max_retry_count: int = 5
    read_batch_size: int = 100
    checkpoint_after: int = 100  # messages acked between checkpoints
    # ConsumerStrategy/*.cs: round_robin | dispatch_to_single | pinned
    # (hash source stream) | pinned_by_correlation (hash $correlationId)
    consumer_strategy: str = "round_robin"


@dataclass
class _Delivery:
    log_position: int
    stream_id: str
    retry_count: int = 0
    state: str = "available"  # available | inflight | parked
    consumer: str | None = None
    deadline: float = 0.0
    correlation_id: str | None = None


class PersistentSubscription:
    """One consumer group over a stream selector of the log."""

    def __init__(
        self,
        events: DataFrame,
        group: str,
        stream_id: str | None = None,
        settings: PersistentSubscriptionSettings | None = None,
        checkpoint_dir: str | None = None,
        start_from: int = 0,
        event_filter: EventFilter | None = None,
    ):
        # server-side filters are a create-time property of $all groups
        # (persistent.proto:7-15 CreateReq allows a filter only with the
        # `all` stream option; PersistentSubscriptionParams.cs:10-141)
        if event_filter is not None and stream_id is not None:
            raise ValueError(
                "event_filter is only valid for $all persistent "
                "subscriptions (stream_id=None)"
            )
        self.events = events
        self.group = group
        self.stream_id = stream_id
        self.event_filter = event_filter
        # Consumer groups on SYSTEM stream names ($ce-X / $et-T / $bc-id)
        # — the reference's most common real-world shape (the docs direct
        # users at `$by_category` streams via persistent groups with
        # ResolveLinkTos, docs/server/features/persistent-subscriptions.md:
        # 85-92). The group's selector becomes the system stream's row
        # predicate over $all; deliveries carry the RESOLVED-link identity
        # (the source stream_id), so the Pinned strategy hashes the source
        # of the resolved event exactly like
        # PinnedPersistentSubscriptionConsumerStrategy.cs:9.
        self._system_predicate = None
        if stream_id is not None and is_system_stream_name(stream_id):
            pred = system_stream_predicate(stream_id)
            if pred is None:
                raise ValueError(
                    f"system stream '{stream_id}' cannot back a persistent "
                    "subscription (first-event-per-stream views are batch "
                    "reads, not event feeds)"
                )
            self._system_predicate = pred
        self.settings = settings or PersistentSubscriptionSettings()
        self.checkpoint_dir = checkpoint_dir
        self.consumers: list[str] = []
        self._rr = 0
        self._deliveries: dict[int, _Delivery] = {}
        self._checkpointed_position = start_from  # everything below is done
        self._acked_since_checkpoint = 0
        self._buffer_head = start_from
        if checkpoint_dir:
            self._load_checkpoint()

    # -- consumer management ------------------------------------------------
    def add_consumer(self, consumer_id: str) -> None:
        if consumer_id not in self.consumers:
            self.consumers.append(consumer_id)

    def remove_consumer(self, consumer_id: str) -> None:
        self.consumers = [c for c in self.consumers if c != consumer_id]
        for d in self._deliveries.values():
            if d.consumer == consumer_id and d.state == "inflight":
                d.state, d.consumer = "available", None

    def _pick_consumer(self, delivery: _Delivery) -> str | None:
        if not self.consumers:
            return None
        strat = self.settings.consumer_strategy
        if strat == "dispatch_to_single":
            # DispatchToSinglePersistentSubscriptionConsumerStrategy.cs:8 —
            # everything goes to ONE consumer; the next in line takes over
            # only when that consumer disconnects (remove_consumer).
            return self.consumers[0]
        if strat in ("pinned", "pinned_by_correlation"):
            # Pinned: hash the source stream so one stream's events always
            # go to the same consumer (Pinned…ConsumerStrategy.cs:9).
            # PinnedByCorrelation…cs:12: same, keyed by the event's
            # $correlationId (falling back to the stream when absent) so a
            # whole correlated conversation lands on one consumer — and a
            # redelivery re-hashes to the SAME consumer.
            import hashlib

            key = delivery.stream_id
            if strat == "pinned_by_correlation" and delivery.correlation_id:
                key = delivery.correlation_id
            h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
            return self.consumers[h % len(self.consumers)]
        c = self.consumers[self._rr % len(self.consumers)]
        self._rr += 1
        return c

    # -- fetch / deliver ----------------------------------------------------
    def _selected(self) -> DataFrame:
        """The group's selector applied to the log (Catalyst predicates —
        they ride the pruned scan)."""
        src = self.events
        if self._system_predicate is not None:
            # name-routed group: the system stream's predicate rides the
            # same pruned range scan; stream_id stays the SOURCE stream
            # (resolved-link identity) for pinned dispatch
            src = src.where(self._system_predicate)
        elif self.stream_id is not None:
            src = src.where(F.col("stream_id") == self.stream_id)
        elif self.event_filter is not None:
            # the filter is a Catalyst predicate, so it rides the pruned
            # range scan (pushed to parquet) — non-matching events never
            # enter the delivery buffer and never cost a retry slot
            src = src.where(self.event_filter.predicate())
        return src

    def _pending_batch_df(self) -> DataFrame:
        """The pruned range scan ``_refill`` collects (exposed so plan
        tests can pin that the stream/filter predicates reach the scan)."""
        return (
            self._selected()
            .where(F.col("log_position") >= self._buffer_head)
            .orderBy("log_position")
            .limit(self.settings.read_batch_size)
            .select(
                "log_position", "stream_id",
                F.get_json_object("metadata", "$.$correlationId").alias("corr"),
            )
        )

    def backlog(self) -> int:
        """Messages matching this group's selector NOT yet pulled into the
        delivery buffer — the per-group behind-count the reference's
        subscription statistics expose (PersistentSubscription.cs
        statistics / FellBehind pressure; round 6, the group-level
        counterpart of ``subscriptions.subscription_backlog``). One
        pruned range count; the buffer itself is bounded by
        read_batch_size, so this is the unbounded-side observable."""
        return int(
            self._selected()
            .where(F.col("log_position") >= self._buffer_head)
            .count()
        )

    def _refill(self, now: float) -> None:
        """Pull the next read batch of undelivered events into the buffer
        (StreamBuffer.cs analog) — one pruned range scan of the log."""
        have = len([d for d in self._deliveries.values() if d.state == "available"])
        if have >= self.settings.read_batch_size:
            return
        batch = self._pending_batch_df().collect()
        for r in batch:
            if r.log_position not in self._deliveries:
                self._deliveries[r.log_position] = _Delivery(
                    r.log_position, r.stream_id, correlation_id=r.corr
                )
            self._buffer_head = max(self._buffer_head, r.log_position + 1)

    def _redeliver_timeouts(self, now: float) -> None:
        """MessageTimeout → retry or park (PersistentSubscription.cs:449+)."""
        for d in self._deliveries.values():
            if d.state == "inflight" and now > d.deadline:
                d.retry_count += 1
                if d.retry_count > self.settings.max_retry_count:
                    d.state, d.consumer = "parked", None
                else:
                    d.state, d.consumer = "available", None

    def fetch(self, now: float | None = None) -> dict[str, list[int]]:
        """Deliver available messages to consumers; returns
        consumer -> [log_position]. Call repeatedly (micro-batch pump)."""
        now = time.time() if now is None else now
        self._refill(now)
        self._redeliver_timeouts(now)
        out: dict[str, list[int]] = {c: [] for c in self.consumers}
        for pos in sorted(self._deliveries):
            d = self._deliveries[pos]
            if d.state != "available":
                continue
            c = self._pick_consumer(d)
            if c is None:
                break
            d.state, d.consumer = "inflight", c
            d.deadline = now + self.settings.message_timeout_s
            out[c].append(pos)
        return out

    # -- ack / nack ---------------------------------------------------------
    def ack(self, positions: list[int]) -> None:
        for p in positions:
            self._deliveries.pop(p, None)
            self._acked_since_checkpoint += 1
        self._maybe_checkpoint()

    def nack(self, positions: list[int], action: str = NAK_RETRY) -> None:
        for p in positions:
            d = self._deliveries.get(p)
            if d is None:
                continue
            if action == NAK_SKIP:
                self._deliveries.pop(p, None)
                self._acked_since_checkpoint += 1
            elif action == NAK_PARK:
                d.state, d.consumer = "parked", None
            else:  # retry
                d.retry_count += 1
                if d.retry_count > self.settings.max_retry_count:
                    d.state, d.consumer = "parked", None
                else:
                    d.state, d.consumer = "available", None
        self._maybe_checkpoint()

    # -- parked messages (dead-letter) ---------------------------------------
    def parked(self) -> list[int]:
        return sorted(p for p, d in self._deliveries.items() if d.state == "parked")

    def replay_parked(self) -> int:
        """ReplayParked: parked → available with reset retry count."""
        n = 0
        for d in self._deliveries.values():
            if d.state == "parked":
                d.state, d.retry_count, n = "available", 0, n + 1
        return n

    # -- checkpointing --------------------------------------------------------
    def _maybe_checkpoint(self) -> None:
        if self._acked_since_checkpoint >= self.settings.checkpoint_after:
            self.checkpoint()

    def checkpoint(self) -> None:
        """Persist (checkpoint position = lowest outstanding, outstanding
        delivery state) — DefaultCheckpointManager analog."""
        outstanding = sorted(self._deliveries)
        self._checkpointed_position = (
            outstanding[0] if outstanding else self._buffer_head
        )
        self._acked_since_checkpoint = 0
        if not self.checkpoint_dir:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        doc = {
            "checkpointed_position": self._checkpointed_position,
            "buffer_head": self._buffer_head,
            "deliveries": [
                {
                    "log_position": d.log_position,
                    "stream_id": d.stream_id,
                    "retry_count": d.retry_count,
                    "state": "available" if d.state == "inflight" else d.state,
                    "correlation_id": d.correlation_id,
                }
                for d in self._deliveries.values()
            ],
        }
        tmp = os.path.join(self.checkpoint_dir, f"_{self.group}.json.tmp")
        dst = os.path.join(self.checkpoint_dir, f"{self.group}.json")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, dst)

    def _load_checkpoint(self) -> None:
        path = os.path.join(self.checkpoint_dir, f"{self.group}.json")
        if not os.path.exists(path):
            return
        with open(path) as f:
            doc = json.load(f)
        self._checkpointed_position = doc["checkpointed_position"]
        self._buffer_head = doc["buffer_head"]
        for d in doc["deliveries"]:
            self._deliveries[d["log_position"]] = _Delivery(
                d["log_position"], d["stream_id"], d["retry_count"], d["state"],
                correlation_id=d.get("correlation_id"),
            )

    def stats(self) -> dict:
        states: dict[str, int] = {}
        for d in self._deliveries.values():
            states[d.state] = states.get(d.state, 0) + 1
        return {
            "group": self.group,
            "checkpointed_position": self._checkpointed_position,
            "buffer_head": self._buffer_head,
            "outstanding": states,
            "consumers": list(self.consumers),
        }
