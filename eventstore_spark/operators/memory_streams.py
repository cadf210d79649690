"""S10: in-memory system streams (`$mem-node-state`, `$mem-gossip`).

Reference: src/EventStore.Core/Services/Storage/InMemory/
  - InMemoryLog.cs:13-17 — a commit-position counter SEPARATE from the
    physical log, so the long-poll machinery can observe mem writes.
  - SingleEventInMemoryStream.cs:15-140 — a stream that retains ONLY its
    latest event; event numbers keep increasing, reads always answer
    from memory and are always end-of-stream.
  - InMemoryStreamReader.cs:12-57 — name router; unknown `$mem-` names
    read as NoStream.
  - NodeStateListenerService.cs:14-41 / GossipListenerService.cs:13-52 —
    the two standard mem streams, fed by node state changes / gossip
    updates, event types `$NodeStateChanged` / `$GossipUpdated`.
  - SystemNames.cs:50-52,70-72 — stream names and the `$mem-` predicate.

Design note (why this is driver-side state and not a Spark plan): these
are node-OPS status streams whose whole contract is "the current value,
served from memory, never from storage" — the reference itself keeps a
single EventRecord per stream and never writes the log. Routing them
through parquet would invert the semantics (and publish node-local
status into shared storage). Reads materialize the one retained row into
a DataFrame with the standard envelope schema so every downstream
surface (filters, joins, display) works uniformly; that createDataFrame
is O(1), not a scan. At 100 TB nothing changes: the log never sees these
rows and `$all` reads stay mem-free (InMemoryLog.cs's "does not support
$all style reads").
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from .. import schema
from ..sources.readers import StreamPage

NODE_STATE_STREAM = "$mem-node-state"  # SystemNames.cs:50
GOSSIP_STREAM = "$mem-gossip"  # SystemNames.cs:51
NODE_STATE_EVENT_TYPE = "$NodeStateChanged"  # NodeStateListenerService.cs:20
GOSSIP_EVENT_TYPE = "$GossipUpdated"  # GossipListenerService.cs:19

NO_STREAM = -1  # ExpectedVersion.NoStream


def is_in_memory_stream(stream_id: str) -> bool:
    """SystemNames.cs:70-72."""
    return stream_id.startswith("$mem-")


class MemoryLog:
    """InMemoryLog.cs: a monotonic commit-position counter shared by all
    mem streams of one engine, with a condition so long-poll reads can
    park on mem commits exactly like log reads park on the writer's."""

    def __init__(self):
        self._pos = 0   # published: every event at <= _pos is visible
        self._next = 0  # reserved: positions handed to in-flight writes
        self._cond = threading.Condition()

    def last_commit_position(self) -> int:
        with self._cond:
            return self._pos

    def reserve_commit_position(self) -> int:
        """Hand out the next position WITHOUT publishing it. The writer
        makes its event visible first and only then publishes — a
        publish-before-visible order lets a poller absorb the write into
        its next wait baseline (it wakes, sees no event yet, re-captures
        a baseline that already includes this position) and stall until
        the NEXT write or its full timeout."""
        with self._cond:
            self._next += 1
            return self._next

    def publish_commit_position(self, pos: int) -> None:
        """Make ``pos`` observable and wake parked polls. max() keeps the
        published position monotonic when two streams' writes publish out
        of reservation order (per-stream order is still serialized by the
        stream's own write lock)."""
        with self._cond:
            if pos > self._pos:
                self._pos = pos
            self._cond.notify_all()

    def wait_for_commit(self, seen_position: int, timeout_s: float) -> int:
        """Park until the commit position advances past ``seen_position``
        (or timeout); returns the current position."""
        deadline = time.monotonic() + timeout_s
        with self._cond:
            while self._pos <= seen_position:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cond.wait(remaining)
            return self._pos


class SingleEventMemoryStream:
    """SingleEventInMemoryStream.cs: one retained event, rising numbers.

    Threading mirrors the reference's comment — one write at a time
    (locked), reads concurrent with writes (a read takes a snapshot of
    the last-event reference)."""

    def __init__(self, mem_log: MemoryLog, stream_name: str):
        self._log = mem_log
        self.stream_name = stream_name
        self._event_number = 0
        self._last: dict | None = None
        self._write_lock = threading.Lock()

    def write(self, event_type: str, data: str) -> dict:
        """SingleEventInMemoryStream.cs:119-139: stamp the next mem
        commit position and REPLACE the retained event."""
        with self._write_lock:
            pos = self._log.reserve_commit_position()
            row = {
                "log_position": pos,
                "stream_id": self.stream_name,
                # `$mem-` ids are `$`-prefixed → uncategorized (the
                # extractor parity rule for every system stream)
                "category": None,
                "event_number": self._event_number,
                "event_id": str(uuid.uuid4()),
                "event_type": event_type,
                "data": data,
                "metadata": None,
                "created": datetime.now(timezone.utc).replace(tzinfo=None),
                "is_json": True,  # PrepareFlags.IsJson, :18
            }
            self._last = row
            self._event_number += 1
            # Event is visible; NOW publish the position (wakes polls).
            self._log.publish_commit_position(pos)
            return row

    # -- reads: (rows, next_event_number, last_event_number) -----------
    def read_forward(self, from_event_number: int = 0):
        """SingleEventInMemoryStream.cs:29-73: NoStream when never
        written; else the single retained event iff the page starts at
        or before it ("from too high → empty read")."""
        last = self._last
        if last is None:
            return [], NO_STREAM, NO_STREAM
        last_en = last["event_number"]
        rows = [] if from_event_number > last_en else [last]
        return rows, last_en + 1, last_en

    def read_backward(self, from_event_number: int | None = None):
        """SingleEventInMemoryStream.cs:75-117: from<0/None reads from
        the end; a page starting BELOW the retained event is empty
        ("from too low" — those numbers were superseded)."""
        last = self._last
        if last is None:
            return [], NO_STREAM, NO_STREAM
        last_en = last["event_number"]
        if from_event_number is None or from_event_number < 0:
            from_event_number = last_en
        rows = [] if from_event_number < last_en else [last]
        return rows, -1, last_en


class MemoryStreamRouter:
    """InMemoryStreamReader.cs: dispatch by exact stream name; unknown
    `$mem-` names answer NoStream (empty, last=-1)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.mem_log = MemoryLog()
        self._streams: dict[str, SingleEventMemoryStream] = {}

    def stream(self, name: str) -> SingleEventMemoryStream:
        if name not in self._streams:
            self._streams[name] = SingleEventMemoryStream(self.mem_log, name)
        return self._streams[name]

    def _frame(self, rows: list[dict]) -> DataFrame:
        return self.spark.createDataFrame(rows, schema=schema.EVENTS_SCHEMA)

    def read_event(self, stream_id: str, event_number: int) -> DataFrame:
        """S1 over a mem stream: only the retained event is addressable
        (event_number == -1 means last, like the log reader)."""
        s = self._streams.get(stream_id)
        last = s._last if s is not None else None
        if last is None or event_number not in (-1, last["event_number"]):
            return self._frame([])
        return self._frame([last])

    def read_stream(self, stream_id: str, from_event_number: int | None = None,
                    backward: bool = False) -> DataFrame:
        page = self.read_page(stream_id, from_event_number, backward=backward)
        return page.events

    def read_page(self, stream_id: str, from_event_number: int | None = None,
                  max_count: int = 100, backward: bool = False) -> StreamPage:
        s = self._streams.get(stream_id)
        if s is None:
            rows, nxt, last = [], NO_STREAM, NO_STREAM  # InMemoryStreamReader.cs:22-35
        elif backward:
            rows, nxt, last = s.read_backward(from_event_number)
        else:
            rows, nxt, last = s.read_forward(
                0 if from_event_number is None else from_event_number
            )
        if max_count is not None and max_count >= 0:
            rows = rows[:max_count]
        return StreamPage(
            events=self._frame(rows),
            next_event_number=nxt,
            last_event_number=last,
            is_end_of_stream=True,  # always, SingleEventInMemoryStream.cs:70
        )

    def poll(self, stream_id: str, from_event_number: int,
             timeout_s: float) -> DataFrame:
        """U3 long-poll against the MEM log's commit condition — the
        reference tracks LastCommitPosition precisely so the long-poll
        mechanism covers mem streams (InMemoryLog.cs:9-12)."""
        deadline = time.monotonic() + timeout_s
        while True:
            # Capture the commit baseline BEFORE inspecting stream state:
            # a write landing between the check and the wait would
            # otherwise be absorbed into the baseline and the poll would
            # stall until the NEXT write or the full timeout despite the
            # event already being present (same ordering the log-side
            # long-poll uses against the writer's commit condition).
            baseline = self.mem_log.last_commit_position()
            s = self._streams.get(stream_id)
            last = s._last if s is not None else None
            if last is not None and last["event_number"] >= from_event_number:
                return self.read_stream(stream_id, from_event_number)
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return self.read_stream(stream_id, from_event_number)
            self.mem_log.wait_for_commit(baseline, remaining)


class NodeStateListener:
    """NodeStateListenerService.cs: serialize each node-state change as
    `{"state": <name>}` into `$mem-node-state`."""

    def __init__(self, router: MemoryStreamRouter):
        self._stream = router.stream(NODE_STATE_STREAM)

    def handle(self, state: str) -> dict:
        return self._stream.write(
            NODE_STATE_EVENT_TYPE, json.dumps({"state": state})
        )


class GossipListener:
    """GossipListenerService.cs: serialize each gossip update as
    `{"nodeId": ..., "members": [...]}` into `$mem-gossip`."""

    def __init__(self, router: MemoryStreamRouter, node_id: str):
        self._stream = router.stream(GOSSIP_STREAM)
        self._node_id = node_id

    def handle(self, members: list[dict]) -> dict:
        payload = {"nodeId": self._node_id, "members": list(members)}
        return self._stream.write(GOSSIP_EVENT_TYPE, json.dumps(payload))
