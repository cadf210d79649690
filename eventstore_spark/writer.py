"""Append protocol: total order, expected-version, idempotency (SURVEY §3.2).

Reference write path: Streams.Append → RequestManager → single
StorageWriterService thread runs IndexWriter.CheckCommit (expected version
vs current, idempotency by EventId → CommitDecision Ok / WrongExpectedVersion
/ Deleted / Idempotent, /root/reference/src/EventStore.Core/Services/Storage/
ReaderIndex/IndexWriter.cs:179-255, CommitDecision.cs:6-14) then appends to
the chunked log.

Spark is an analytics engine, not an OLTP store — the design keeps the
reference's ONE invariant that matters (a single globally ordered writer
assigning ``log_position``/``event_number``) and makes each append batch one
atomic columnar commit:

  * all appends serialize through one ``EventLogWriter`` (the "writer
    thread"); on a cluster this is the driver of a Structured Streaming
    ``foreachBatch`` job draining an append queue — writes are micro-batched,
    so throughput scales with batch size while order stays total;
  * each committed batch lands as one immutable parquet file inside the
    log directory (commit = atomic rename; a crashed half-written file is
    invisible because files are staged under ``_tmp``);
  * ``stream_stats`` (last event_number per stream + last position) is the
    writer's in-memory index, rebuilt from the log on open — the analog of
    the reference's last-event-number cache (IndexBackend).

Readers never coordinate with the writer: they read the directory as a
plain parquet table (plus ``load()`` here).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from .schema import (
    EVENTS_SCHEMA,
    METADATA_EVENT_TYPE,
    STREAM_DELETED_EVENT_TYPE,
    MAX_LONG,
)

# ExpectedVersion sentinel values (Data/ExpectedVersion.cs:6-13)
ANY = -2
NO_STREAM = -1
STREAM_EXISTS = -4


class WrongExpectedVersionError(Exception):
    def __init__(self, stream_id: str, expected: int, current: int):
        super().__init__(
            f"append to '{stream_id}': expected version {expected}, current {current}"
        )
        self.expected, self.current = expected, current


class StreamDeletedError(Exception):
    pass


@dataclass
class ProposedEvent:
    """What a client appends (Data/Event.cs:10-42)."""

    event_type: str
    data: str | None = None
    metadata: str | None = None
    event_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    is_json: bool = True


def _category(stream_id: str) -> str | None:
    i = stream_id.find("-")
    return stream_id[:i] if i > 0 else None


class EventLogWriter:
    """Single-writer append head over a parquet log directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._last_position = 0
        # stream -> (last_event_number, tombstoned)
        self._stats: dict[str, list] = {}
        # stream -> {event_id: event_number} for idempotency checks
        self._ids: dict[str, dict[str, int]] = {}
        self._batch_seq = 0
        self._recover()

    # -- recovery: rebuild writer state from the committed log --
    def _recover(self) -> None:
        if not any(f.endswith(".parquet") for f in os.listdir(self.path)):
            return
        df = self.spark.read.schema(EVENTS_SCHEMA).parquet(self.path)
        rows = (
            df.groupBy("stream_id")
            .agg({"event_number": "max", "log_position": "max"})
            .collect()
        )
        for r in rows:
            self._stats[r["stream_id"]] = [r["max(event_number)"], False]
            self._last_position = max(self._last_position, r["max(log_position)"])
        for r in df.select("stream_id", "event_id", "event_number", "event_type").collect():
            self._ids.setdefault(r.stream_id, {})[r.event_id] = r.event_number
            if r.event_type == STREAM_DELETED_EVENT_TYPE:
                self._stats[r.stream_id][1] = True

    # -- the commit check (IndexWriter.CheckCommit analog) --
    def _check(self, stream_id: str, events: list[ProposedEvent], expected: int):
        last, tombstoned = self._stats.get(stream_id, [NO_STREAM, False])
        if tombstoned:
            raise StreamDeletedError(stream_id)
        if expected == ANY:
            pass
        elif expected == STREAM_EXISTS:
            if last == NO_STREAM:
                raise WrongExpectedVersionError(stream_id, expected, last)
        elif expected != last:
            # NO_STREAM is exact version -1. On mismatch, check idempotent
            # replay (CommitDecision.Idempotent): the same ids already
            # committed at expected+1..expected+len.
            known = self._ids.get(stream_id, {})
            if events and all(
                ev.event_id in known and known[ev.event_id] == expected + 1 + i
                for i, ev in enumerate(events)
            ):
                return "idempotent"
            raise WrongExpectedVersionError(stream_id, expected, last)
        # ANY-mode dedupe: every id already present → idempotent no-op
        known = self._ids.get(stream_id, {})
        if events and all(ev.event_id in known for ev in events):
            return "idempotent"
        return "ok"

    def append(
        self,
        stream_id: str,
        events: list[ProposedEvent],
        expected_version: int = ANY,
        created: datetime | None = None,
    ) -> int:
        """Append a batch to one stream; returns the new last event_number.

        The whole batch commits atomically (one parquet file, renamed in).
        """
        decision = self._check(stream_id, events, expected_version)
        if decision == "idempotent":
            return self._stats[stream_id][0]
        now = created or datetime.now(timezone.utc)
        last = self._stats.get(stream_id, [NO_STREAM, False])[0]
        known = self._ids.setdefault(stream_id, {})
        rows = []
        for ev in events:
            if ev.event_id in known:  # partial idempotent overlap → skip row
                continue
            self._last_position += 1
            last += 1
            known[ev.event_id] = last
            rows.append(
                (
                    self._last_position, stream_id, _category(stream_id), last,
                    ev.event_id, ev.event_type, ev.data, ev.metadata, now, ev.is_json,
                )
            )
            if ev.event_type == STREAM_DELETED_EVENT_TYPE:
                self._stats.setdefault(stream_id, [NO_STREAM, False])[1] = True
        self._stats.setdefault(stream_id, [NO_STREAM, False])[0] = last
        if self._stats[stream_id][0] is None:
            self._stats[stream_id][0] = last
        if rows:
            self._commit(rows)
        return last

    def append_df(self, batch: DataFrame) -> None:
        """Bulk path: append pre-shaped envelope rows (no per-stream checks)
        assigning positions after the current head — used by projection
        emission sinks (foreachBatch) where event ids are deterministic."""
        rows = batch.collect()  # emission batches are small relative to log
        out = []
        for r in rows:
            sid = r["stream_id"]
            known = self._ids.setdefault(sid, {})
            if r["event_id"] in known:
                continue  # exactly-once by deterministic id
            self._last_position += 1
            st = self._stats.setdefault(sid, [NO_STREAM, False])
            st[0] += 1
            known[r["event_id"]] = st[0]
            out.append(
                (
                    self._last_position, sid, _category(sid), st[0],
                    r["event_id"], r["event_type"], r["data"], r["metadata"],
                    datetime.now(timezone.utc), bool(r["event_type"] != "$>"),
                )
            )
        if out:
            self._commit(out)

    def _commit(self, rows: list[tuple]) -> None:
        self._batch_seq += 1
        df = self.spark.createDataFrame(rows, EVENTS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    # -- delete surface (S8) --
    def soft_delete(self, stream_id: str, metadata_writer=None) -> None:
        """Soft delete = set $tb to MAX_LONG via the metastream
        (StorageWriterService.cs:374-416); new appends recreate the stream."""
        self.append(
            f"$${stream_id}",
            [ProposedEvent(METADATA_EVENT_TYPE, data=f'{{"$tb": {MAX_LONG}}}')],
        )

    def hard_delete(self, stream_id: str) -> None:
        """Tombstone: a $streamDeleted event; stream can never be recreated."""
        self.append(
            stream_id,
            [ProposedEvent(STREAM_DELETED_EVENT_TYPE, data=None, is_json=False)],
        )

    def load(self) -> DataFrame:
        return self.spark.read.schema(EVENTS_SCHEMA).parquet(self.path)
