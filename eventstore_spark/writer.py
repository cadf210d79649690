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
  * the single-writer invariant is ENFORCED, not just documented
    (round 5). In-process: every writer on one directory shares a
    ``_PathCore`` (append mutex + position allocator + per-stream cache
    generations), so two writer objects can never interleave positions
    or serve stale stream state. Cross-process: a ``_writer.lock`` file
    carries (pid, fencing token); a live foreign holder makes writer
    construction raise ``WriterFencedError``, a dead holder's lock is
    stolen atomically, and the token is re-verified before every commit
    so a fenced-out writer fails its NEXT commit instead of corrupting
    the order. Final backstop: manifest publication is a CAS on the
    generation number (``manifest.ManifestConflictError``). The
    reference enforces the same invariant structurally — one
    StorageWriterService thread owns the log (StorageWriterService.cs:283);
    cluster fencing there is the election/epoch of the replication layer;
  * each committed batch lands as immutable parquet files inside the log
    directory;
  * writer state is LAZY and BOUNDED: opening a writer reads exactly one
    scalar (max log_position) from the log; per-stream last-event-number /
    tombstone / recent-event-ids load on first touch of that stream via a
    pruned scan — the analog of the reference's LRU last-event-number cache
    (IndexBackend) plus its bounded near-head idempotency check
    (IndexWriter.cs:179-255 only consults recent commits). Nothing is ever
    O(log size) on the driver.

Bulk emission appends (``append_df``) stay DISTRIBUTED end to end: dedupe
is a left-anti join against the log, per-stream event numbers come from a
window partitioned by stream, and global positions come from per-stream
contiguous blocks allocated on the driver from one tiny per-stream count —
no ``collect()`` of event rows ever happens.

Readers never coordinate with the writer: they read the directory as a
plain parquet table (plus ``load()`` here).
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import manifest
from .schema import (
    EVENTS_SCHEMA,
    METADATA_EVENT_TYPE,
    METASTREAM_PREFIX,
    STREAM_DELETED_EVENT_TYPE,
    MAX_LONG,
)

# ExpectedVersion sentinel values (Data/ExpectedVersion.cs:6-13)
ANY = -2
NO_STREAM = -1
STREAM_EXISTS = -4

# TFConsts.cs:9-11: max log record 16 MB; gRPC maxAppendSize default 1 MiB
# (Grpc/Streams.Append.cs:18 validates the whole append against it).
MAX_RECORD_SIZE = 16 * 1024 * 1024
DEFAULT_MAX_APPEND_SIZE = 1024 * 1024

# How many most-recent events per stream back the idempotency check. The
# reference's CheckCommit similarly only consults commits near the head —
# a replay of an ancient batch is NOT detected as idempotent there either.
IDEMPOTENCY_WINDOW = 256


class WrongExpectedVersionError(Exception):
    def __init__(self, stream_id: str, expected: int, current: int):
        super().__init__(
            f"append to '{stream_id}': expected version {expected}, current {current}"
        )
        self.expected, self.current = expected, current


class StreamDeletedError(Exception):
    pass


class RecordTooLargeError(Exception):
    """A single event exceeds MAX_RECORD_SIZE (TFConsts.MaxLogRecordSize)."""


class WriterFencedError(Exception):
    """The single-writer lock for this log directory is held by another
    LIVE process (at construction), or was taken over after this writer
    acquired it (at commit). The fenced writer must not publish."""


class MaxAppendSizeExceededError(Exception):
    """The whole append exceeds the configured maxAppendSize
    (Grpc/Streams.Append.cs:18)."""


@dataclass
class ProposedEvent:
    """What a client appends (Data/Event.cs:10-42)."""

    event_type: str
    data: str | None = None
    metadata: str | None = None
    event_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    is_json: bool = True

    def byte_size(self) -> int:
        return len((self.data or "").encode()) + len((self.metadata or "").encode())


def _category(stream_id: str) -> str | None:
    # reference extractor edges (StreamCategoryExtractorByFirstSeparator
    # .cs:15-19, matched by schema.category_of): position > 0 AND never
    # for $-prefixed ids — stored and computed categories must agree, or
    # category-pushdown readers that prefer the stored column would keep
    # the old semantics (round-8 review finding)
    if stream_id.startswith("$"):
        return None
    i = stream_id.find("-")
    return stream_id[:i] if i > 0 else None


# ---------------------------------------------------------------------------
# Single-writer enforcement (round 5)
# ---------------------------------------------------------------------------

LOCK_FILE = "_writer.lock"  # underscore → invisible to Spark's file listing


class _PathCore:
    """Process-wide shared write head for ONE log directory.

    Every ``EventLogWriter`` opened on the same directory in this process
    shares a core, which is what makes multiple writer OBJECTS safe:

      * ``mutex`` serializes whole appends (an RLock — the soft-delete
        recreate path re-enters ``append`` for the metastream write);
      * ``last_position`` is the committed head every writer syncs to
        before allocating, so positions from different writer objects
        never collide;
      * ``stream_gen[sid]`` bumps on every commit touching ``sid``; a
        writer whose cached per-stream state was taken at an older
        generation reloads from the log before trusting it;
      * the commit condition/epoch (U3 long-poll wakeups) lives here, so
        a waiter parked via one writer object wakes on a commit made
        through another;
      * ``fence_token`` is this process's claim in the cross-process
        ``_writer.lock`` file.
    """

    def __init__(self, path: str):
        self.path = path
        self.mutex = threading.RLock()
        self.cond = threading.Condition()
        self.epoch = 0
        self.last_position: int | None = None  # None until first recovery
        self.stream_gen: dict[str, int] = {}
        self.fence_token: str | None = None
        # manifest generation this process last observed/published — the
        # base every append publish CASes against (manifest.append_files
        # base_seq). None until the first writer on this path syncs it.
        self.manifest_seq: int | None = None


_CORES: dict[str, _PathCore] = {}
_CORES_GUARD = threading.Lock()


def _core_for(path: str) -> _PathCore:
    key = os.path.realpath(path)
    with _CORES_GUARD:
        core = _CORES.get(key)
        if core is None:
            core = _CORES[key] = _PathCore(path)
        return core


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _pid_start_time(pid: int) -> int | None:
    """Kernel start time (jiffies since boot) of ``pid`` — the
    pid-recycling disambiguator: a recycled pid has a different start
    time, so a lock whose holder died and whose pid was reused is still
    judged stale instead of held hostage by the unrelated new process.
    None when /proc isn't available (non-Linux) — liveness then falls
    back to pid-only."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        # field 22 counts from 1, AFTER the parenthesized comm (which may
        # itself contain spaces/parens) — split on the LAST ')'
        return int(stat.rsplit(")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


def _holder_alive(cur: dict) -> bool:
    """Is the lock's recorded holder still the SAME live process?"""
    pid = cur.get("pid")
    if pid is None or pid == os.getpid() or not _pid_alive(pid):
        return False
    recorded = cur.get("pid_start")
    if recorded is not None:
        now = _pid_start_time(pid)
        if now is not None and now != recorded:
            return False  # pid recycled — the recorded holder is dead
    return True


def _read_lock(lock_path: str) -> dict:
    try:
        with open(lock_path) as f:
            return json.load(f) or {}
    except (FileNotFoundError, ValueError):
        return {}


def _acquire_fence(core: _PathCore, timeout_s: float = 0.0) -> None:
    """Claim the cross-process writer lock for ``core.path`` (idempotent
    per process). A lock held by a LIVE foreign pid raises
    ``WriterFencedError`` — or, with ``timeout_s`` > 0, is re-probed
    until the holder releases/dies or the deadline passes (the "second
    writer waits" mode). A dead holder's lock — the crash-recovery path —
    is stolen with an atomic replace and re-read to confirm we won a
    concurrent steal race."""
    if core.fence_token is not None:
        return
    import time as _time

    lock = os.path.join(core.path, LOCK_FILE)
    token = uuid.uuid4().hex
    payload = json.dumps(
        {
            "pid": os.getpid(),
            "pid_start": _pid_start_time(os.getpid()),
            "token": token,
            "acquired_at": datetime.now(timezone.utc).isoformat(),
        }
    )
    deadline = _time.monotonic() + timeout_s
    attempts = 0
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            core.fence_token = token
            return
        except FileExistsError:
            cur = _read_lock(lock)
            if _holder_alive(cur):
                if _time.monotonic() < deadline:  # waiting mode: re-probe
                    _time.sleep(0.05)
                    continue
                raise WriterFencedError(
                    f"log {core.path} is owned by live writer pid "
                    f"{cur.get('pid')}; close it (or let it die) before "
                    "opening a writer here"
                )
            # stale (dead pid / corrupt / our own pre-crash claim): steal
            tmp = lock + f".{token[:8]}.tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, lock)
            if _read_lock(lock).get("token") == token:  # we won the steal
                core.fence_token = token
                return
            # a concurrent stealer overwrote us — re-evaluate their claim
            attempts += 1
            if attempts >= 8 and _time.monotonic() >= deadline:
                raise WriterFencedError(
                    f"could not acquire writer lock for {core.path}"
                )


def _verify_fence(core: _PathCore) -> None:
    """The commit-time check: our token must still be the one on disk.
    Catches a steal by another process (e.g. ours was wrongly judged
    dead) before anything is published under a lost claim."""
    if core.fence_token is None:
        raise WriterFencedError(
            f"writer for {core.path} was closed — open a new EventLogWriter"
        )
    cur = _read_lock(os.path.join(core.path, LOCK_FILE))
    if cur.get("token") != core.fence_token:
        raise WriterFencedError(
            f"writer lock for {core.path} was taken over by pid "
            f"{cur.get('pid')} — this writer is fenced and must not commit"
        )


def _release_fence(core: _PathCore) -> None:
    if core.fence_token is None:
        return
    lock = os.path.join(core.path, LOCK_FILE)
    if _read_lock(lock).get("token") == core.fence_token:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass
    core.fence_token = None


class EventLogWriter:
    """Single-writer append head over a parquet log directory."""

    def __init__(self, spark: SparkSession, path: str,
                 max_append_size: int = DEFAULT_MAX_APPEND_SIZE,
                 lock_timeout_s: float = 0.0,
                 group_commit_window_ms: float = 0.0,
                 read_only: bool = False):
        self.spark = spark
        self.path = path
        # read_only: serve load()/load_at() WITHOUT claiming the
        # single-writer lock — the reference serves any number of read
        # connections beside its one writer; here N analyst processes
        # open read-only handles while ONE process owns the append head.
        # Appends through a read-only handle raise WriterFencedError.
        self._read_only = read_only
        # group commit (RequestManager batching): >0 gathers concurrent
        # append() calls for this many ms and commits them as one file
        self._group_window = group_commit_window_ms / 1000.0
        self._group_q: list = []
        self._group_cond = threading.Condition()
        self._group_thread: threading.Thread | None = None
        self._group_stop = threading.Event()
        self.max_append_size = max_append_size
        os.makedirs(path, exist_ok=True)
        # shared per-directory write head: in-process total-order +
        # cross-process fencing (see _PathCore / _acquire_fence)
        self._core = _core_for(path)
        self._last_position = 0
        # stream -> [last_event_number, tombstoned]; filled lazily per
        # stream (LRU-cache analog of IndexBackend's last-event-number).
        self._stats: dict[str, list] = {}
        # stream -> core.stream_gen value at which _stats/_ids/_meta_cache
        # for that stream were taken; a foreign commit bumps the core gen
        # and invalidates this writer's cached view of the stream.
        self._cache_gen: dict[str, int] = {}
        # stream -> {event_id: event_number}, bounded to the most recent
        # IDEMPOTENCY_WINDOW events per stream.
        self._ids: dict[str, dict[str, int]] = {}
        # stream -> current metadata DOCUMENT (parsed JSON of the latest
        # $metadata event), lazily read from the metastream; drives
        # soft-delete recreate. Kept current on every metastream append.
        self._meta_cache: dict[str, dict] = {}
        if read_only:
            return  # no fence, no recovery scan — reads resolve lazily
        with self._core.mutex:
            _acquire_fence(self._core, timeout_s=lock_timeout_s)
            self._recover()
            if self._core.last_position is not None:
                self._last_position = max(
                    self._last_position, self._core.last_position
                )
            self._core.last_position = self._last_position
            if self._core.manifest_seq is None:
                cur = manifest.latest(path)
                self._core.manifest_seq = -1 if cur is None else cur[0]

    @property
    def read_only(self) -> bool:
        return self._read_only

    def _has_files(self) -> bool:
        files = manifest.snapshot_files(self.path)
        if files is None:
            return any(f.endswith(".parquet") for f in os.listdir(self.path))
        return bool(files)

    # -- recovery: one scalar read, never a full-log collect --
    def _recover(self) -> None:
        if not self._has_files():
            return
        row = self.load().agg(F.max("log_position")).first()
        self._last_position = int(row[0] or 0)

    def _stream_state(self, stream_id: str) -> list:
        """[last_event_number, tombstoned] for a stream, loading it from
        the log on first touch via one pruned per-stream scan bounded to
        the IDEMPOTENCY_WINDOW most recent events.

        The cache is only authoritative when the id map is loaded too:
        ``append_df`` maintains ``_stats`` (numbering) but not ``_ids``
        (idempotency), so a stream whose ids were invalidated by a bulk
        append reloads BOTH here — otherwise an idempotent retry through
        ``append()`` would see an empty id map and dupe or reject.

        Cache validity is generation-checked against the shared core:
        a commit to this stream through ANOTHER writer object bumps
        ``core.stream_gen[sid]`` and forces a reload here."""
        st = self._stats.get(stream_id)
        if (
            st is not None
            and stream_id in self._ids
            and self._cache_gen.get(stream_id, 0)
            == self._core.stream_gen.get(stream_id, 0)
        ):
            return st
        rows = []
        if self._has_files():
            rows = (
                self.load()
                .where(F.col("stream_id") == stream_id)
                .orderBy(F.col("event_number").desc())
                .limit(IDEMPOTENCY_WINDOW)
                .select("event_number", "event_id", "event_type")
                .collect()
            )
        last = int(rows[0]["event_number"]) if rows else NO_STREAM
        # A tombstone is always the stream's final event (appends are
        # rejected afterwards), so the bounded window always contains it.
        tomb = bool(rows) and rows[0]["event_type"] == STREAM_DELETED_EVENT_TYPE
        st = [last, tomb]
        self._stats[stream_id] = st
        # latest position wins for a re-committed id (rows arrive DESC;
        # build ASC so the most recent commit overwrites) — matches
        # _remember_id's append-time bookkeeping
        self._ids[stream_id] = {
            r["event_id"]: int(r["event_number"]) for r in reversed(rows)
        }
        self._cache_gen[stream_id] = self._core.stream_gen.get(stream_id, 0)
        return st

    def _remember_id(self, stream_id: str, event_id: str, event_number: int) -> None:
        known = self._ids.setdefault(stream_id, {})
        known[event_id] = event_number
        if len(known) > 2 * IDEMPOTENCY_WINDOW:  # trim to the recent window
            cutoff = event_number - IDEMPOTENCY_WINDOW
            for k in [k for k, v in known.items() if v < cutoff]:
                del known[k]

    # -- size validation (Grpc/Streams.Append.cs:18, TFConsts.cs:9-11) --
    def _validate_sizes(self, events: list[ProposedEvent]) -> None:
        total = 0
        for ev in events:
            n = ev.byte_size()
            if n > MAX_RECORD_SIZE:
                raise RecordTooLargeError(
                    f"event {ev.event_id} is {n} bytes; max record size is "
                    f"{MAX_RECORD_SIZE}"
                )
            total += n
        if total > self.max_append_size:
            raise MaxAppendSizeExceededError(
                f"append of {total} bytes exceeds maxAppendSize "
                f"{self.max_append_size}"
            )

    # -- the commit check (IndexWriter.CheckCommit analog) --
    def _check(self, stream_id: str, events: list[ProposedEvent], expected: int):
        """Returns ``"ok"`` or ``("idempotent", end_event_number)`` where
        ``end_event_number`` is the REPLAYED BATCH's own final event
        number (CommitCheckResult carries startEventNumber/endEventNumber
        of the original commit — a delayed retry must get its own
        positions back, not the stream's advanced head)."""
        last, tombstoned = self._stream_state(stream_id)
        if tombstoned:
            raise StreamDeletedError(stream_id)
        # a tombstone mid-batch would leave events committed ABOVE the
        # $streamDeleted, breaking "the tombstone is the stream's final
        # event" which tombstone detection depends on — reject before
        # any mutation (the delete surface writes it as a lone event)
        tomb_idx = next(
            (i for i, ev in enumerate(events)
             if ev.event_type == STREAM_DELETED_EVENT_TYPE), None)
        if tomb_idx is not None and tomb_idx != len(events) - 1:
            raise StreamDeletedError(stream_id)
        if expected == ANY:
            pass
        elif expected == STREAM_EXISTS:
            # StreamExists on a soft-deleted stream is CommitDecision.
            # Deleted (IndexWriter.CheckCommit:192-193) — unlike ANY /
            # NoStream, it does NOT recreate.
            if self._is_soft_deleted(stream_id):
                raise StreamDeletedError(stream_id)
            if last == NO_STREAM:
                # the stream also "exists" when only its METASTREAM has
                # events — metadata was set before the first append
                # (CheckCommit:195-200)
                meta_last, _ = self._stream_state(f"$${stream_id}")
                if meta_last == NO_STREAM:
                    raise WrongExpectedVersionError(stream_id, expected, last)
        elif expected != last:
            # NO_STREAM is exact version -1. On mismatch, walk the batch
            # against expected+1..expected+len (CheckCommit:236-280):
            # full positional match → CommitDecision.Idempotent; a
            # PARTIAL prefix match → CorruptedIdempotency, which the
            # reference answers as WrongExpectedVersion
            # (StorageWriterService.cs:688-691); a first-position miss
            # with NoStream on a soft-deleted stream → Ok (the recreate
            # path, CheckCommit:255-256).
            known = self._ids.get(stream_id, {})
            if expected < last and events:
                for i, ev in enumerate(events):
                    if known.get(ev.event_id) == expected + 1 + i:
                        continue
                    if i == 0 and expected == NO_STREAM \
                            and self._is_soft_deleted(stream_id):
                        return "ok"  # soft-delete recreate
                    raise WrongExpectedVersionError(stream_id, expected, last)
                # idempotent replay reports the BATCH's own end number
                return ("idempotent", expected + len(events))
            raise WrongExpectedVersionError(stream_id, expected, last)
        else:
            # EXACT expected match is CommitDecision.Ok — the write
            # proceeds even when ids were committed at unrelated
            # positions (IndexWriter.CheckCommit:287; the positionless
            # dedupe below is an ANY/StreamExists-mode behavior only,
            # :204-233)
            return "ok"
        # ANY/STREAM_EXISTS positionless dedupe (CheckCommit:204-233):
        # the FIRST event id decides — unknown first id is a fresh write
        # for the WHOLE batch (later ids are not consulted; re-used ids
        # commit again at new positions); known first id requires every
        # id known → idempotent with the replayed batch's own end
        # position, else CorruptedIdempotency → WrongExpectedVersion
        known = self._ids.get(stream_id, {})
        if events and events[0].event_id in known:
            if all(ev.event_id in known for ev in events):
                return ("idempotent", known[events[-1].event_id])
            raise WrongExpectedVersionError(stream_id, expected, last)
        return "ok"

    def _is_soft_deleted(self, stream_id: str) -> bool:
        """The reference's IIndexWriter.IsSoftDeleted: current metadata
        carries TruncateBefore == long.Max (`$tb` = MAX_LONG)."""
        if stream_id.startswith("$"):
            return False
        return self._current_meta(stream_id).get("$tb") == MAX_LONG

    def _current_meta(self, stream_id: str) -> dict:
        """The stream's current metadata document (latest $metadata event of
        `$$stream`, whole-document semantics — a metadata write REPLACES the
        document, StreamMetadata.cs:60-150), lazily read and cached; the
        cache invalidates when another writer commits to the metastream
        (generation check on `$$stream` against the shared core)."""
        meta_id = f"$${stream_id}"
        meta_gen_key = f"meta:{stream_id}"
        if (
            stream_id in self._meta_cache
            and self._cache_gen.get(meta_gen_key, 0)
            == self._core.stream_gen.get(meta_id, 0)
        ):
            return self._meta_cache[stream_id]
        doc: dict = {}
        if self._has_files():
            rows = (
                self.load()
                .where(
                    (F.col("stream_id") == meta_id)
                    & (F.col("event_type") == METADATA_EVENT_TYPE)
                )
                .orderBy(F.col("event_number").desc())
                .limit(1)
                .select("data")
                .collect()
            )
            if rows and rows[0]["data"]:
                try:
                    doc = json.loads(rows[0]["data"]) or {}
                except ValueError:
                    doc = {}
        self._meta_cache[stream_id] = doc
        self._cache_gen[meta_gen_key] = self._core.stream_gen.get(meta_id, 0)
        return doc

    def append(
        self,
        stream_id: str,
        events: list[ProposedEvent],
        expected_version: int = ANY,
        created: datetime | None = None,
    ) -> int:
        """Append a batch to one stream; returns the new last event_number.

        The whole batch commits atomically (one parquet file). Appending to
        a soft-deleted stream RECREATES it (StorageWriterService.cs:374-416):
        event numbers continue after the old last, and $tb is rewritten to
        the first new event number so the old events stay invisible while
        the new ones show.

        Serialized through the shared per-directory mutex; the fencing
        token is verified BEFORE any state moves, and a failed/fenced
        commit rolls the touched streams' in-memory state back to the
        durable log, so numbering stays intact for the retry.

        With ``group_commit_window_ms`` > 0, concurrent ``append()``
        calls are gathered by a collector thread and committed as ONE
        parquet file + ONE manifest publish — the group-commit of the
        reference's RequestManager pipeline (many in-flight appends, one
        storage write), amortizing the per-commit fsync/manifest cost
        across callers. Results (and per-append errors such as
        WrongExpectedVersion) resolve per caller.
        """
        if self._read_only:
            raise WriterFencedError(
                f"writer for {self.path} is read-only — appends go through "
                "the owning writer process"
            )
        self._validate_append(stream_id, events, expected_version)
        if self._group_window > 0:
            return self._append_grouped(stream_id, events, expected_version, created)
        with self._core.mutex:
            _verify_fence(self._core)
            rows: list[tuple] = []
            touched: set[str] = set()
            try:
                last = self._apply_append(
                    stream_id, events, expected_version, created, rows, touched
                )
            except BaseException:
                if touched:  # mid-apply failure → restore from the log
                    self._rollback(touched)
                raise
            if rows:
                try:
                    self._commit(rows)
                except BaseException:
                    self._rollback(touched)
                    raise
            return last

    def _apply_append(self, stream_id, events, expected_version, created,
                      rows_sink: list, touched: set) -> int:
        """Check one append and APPLY it to in-memory state, emitting its
        rows into ``rows_sink`` for the caller to commit (possibly merged
        with other appends' rows — group commit). All validations run
        BEFORE any mutation, so a rejected append never dirties state;
        after a failed physical commit the caller rolls ``touched``
        streams back to the durable log via ``_rollback``."""
        self._last_position = max(
            self._last_position, self._core.last_position or 0
        )
        self._validate_sizes(events)
        decision = self._check(stream_id, events, expected_version)
        if decision != "ok":
            return decision[1]  # ("idempotent", batch's own end number)
        now = created or datetime.now(timezone.utc)
        st = self._stream_state(stream_id)
        touched.add(stream_id)
        last = st[0]
        # once _check said "ok" the WHOLE batch commits fresh — the
        # reference never partially skips rows inside one transaction
        # (CheckCommit:204-233: a known id after an unknown FIRST id is
        # simply re-committed at a new position; a known FIRST id with a
        # later unknown one was already rejected as CorruptedIdempotency)
        first_new = None
        for ev in events:
            self._last_position += 1
            last += 1
            if first_new is None:
                first_new = last
            self._remember_id(stream_id, ev.event_id, last)
            rows_sink.append(
                (
                    self._last_position, stream_id, _category(stream_id), last,
                    ev.event_id, ev.event_type, ev.data, ev.metadata, now, ev.is_json,
                )
            )
            if ev.event_type == STREAM_DELETED_EVENT_TYPE:
                st[1] = True
        st[0] = last
        self._core.last_position = self._last_position
        if first_new is not None:
            self._bump_stream_gen(stream_id)
            # keep the metadata cache current: a $metadata append to `$$X`
            # REPLACES X's document (the reference's GetStreamRawMeta always
            # reads the latest; a stale cached $tb would mis-trigger
            # recreate after set_stream_metadata overwrote it).
            if stream_id.startswith("$$"):
                orig = stream_id[2:]
                for ev in events:
                    if ev.event_type == METADATA_EVENT_TYPE:
                        try:
                            doc = json.loads(ev.data or "{}") or {}
                        except ValueError:
                            doc = {}
                        self._set_meta_cache(orig, doc)
            # soft-delete recreate: a stream whose $tb == MAX_LONG comes
            # back to life on append — rewrite $tb to the first new number,
            # PRESERVING the rest of the metadata document
            # (SoftUndeleteRawMeta, StorageWriterService.cs:438-449). The
            # metastream rows join the SAME sink → same atomic commit.
            if not stream_id.startswith("$"):
                if self._current_meta(stream_id).get("$tb") == MAX_LONG:
                    doc = dict(self._current_meta(stream_id))
                    doc["$tb"] = first_new
                    self._apply_append(
                        f"$${stream_id}",
                        [ProposedEvent(METADATA_EVENT_TYPE,
                                       data=json.dumps(doc, sort_keys=True))],
                        ANY, created, rows_sink, touched,
                    )
        return last

    def _rollback(self, touched: set) -> None:
        """A physical commit failed after state was applied: restore the
        in-memory view from the DURABLE log — drop the touched streams'
        caches (they reload lazily), bump their shared generations so
        sibling writer objects drop theirs too, and re-read the committed
        head position."""
        for sid in touched:
            self._stats.pop(sid, None)
            self._ids.pop(sid, None)
            self._cache_gen.pop(sid, None)
            self._core.stream_gen[sid] = self._core.stream_gen.get(sid, 0) + 1
            if sid.startswith("$$"):
                self._meta_cache.pop(sid[2:], None)
                self._cache_gen.pop(f"meta:{sid[2:]}", None)
        self._last_position = 0
        self._recover()
        self._core.last_position = self._last_position

    # -- group commit (RequestManager batching analog) --
    def _append_grouped(self, stream_id, events, expected_version, created) -> int:
        box: dict = {"done": threading.Event()}
        with self._group_cond:
            # append() after close() must FAIL like the non-grouped path
            # does (via _verify_fence), not park forever on a collector
            # that exited (ADVICE r5)
            if self._group_stop.is_set():
                raise WriterFencedError(
                    f"writer for {self.path} was closed — open a new "
                    "EventLogWriter"
                )
            self._group_q.append((stream_id, events, expected_version, created, box))
            if self._group_thread is None or not self._group_thread.is_alive():
                self._group_thread = threading.Thread(
                    target=self._collector_loop, daemon=True
                )
                self._group_thread.start()
            self._group_cond.notify_all()
        box["done"].wait()
        if "error" in box:
            raise box["error"]
        return box["result"]

    def _drain_group_queue(self) -> None:
        """Fail any queued appends instead of leaving their callers
        parked (the close()-races-enqueue window: the up-front stop check
        in _append_grouped can pass just before close() sets the flag)."""
        with self._group_cond:
            leftover, self._group_q[:] = list(self._group_q), []
        for *_ignored, box in leftover:
            if not box["done"].is_set():
                box.setdefault(
                    "error",
                    WriterFencedError(
                        f"writer for {self.path} was closed — open a new "
                        "EventLogWriter"
                    ),
                )
                box["done"].set()

    def _collector_loop(self) -> None:
        import time as _time

        while not self._group_stop.is_set():
            with self._group_cond:
                while not self._group_q and not self._group_stop.is_set():
                    self._group_cond.wait(timeout=0.5)
                if self._group_stop.is_set() and not self._group_q:
                    return
            _time.sleep(self._group_window)  # gather the group
            with self._group_cond:
                batch = list(self._group_q)
                self._group_q.clear()
            try:
                with self._core.mutex:
                    self._commit_group(batch)
            finally:
                # the collector must NEVER leave a caller parked: any
                # box not resolved by _commit_group (unexpected error)
                # fails loudly instead of hanging its append()
                for *_ignored, box in batch:
                    if not box["done"].is_set():
                        box.setdefault(
                            "error",
                            RuntimeError("group commit failed unexpectedly"),
                        )
                        box["done"].set()
        self._drain_group_queue()  # stop raced an enqueue — fail it loudly

    def _commit_group(self, batch: list) -> None:
        rows: list[tuple] = []
        touched: set[str] = set()
        try:
            _verify_fence(self._core)
        except BaseException as e:
            for *_ignored, box in batch:
                box["error"] = e
                box["done"].set()
            return
        aborted = None
        for sid, events, expected, created, box in batch:
            if aborted is not None:
                box["error"] = aborted
                continue
            rows_before, touched_before = len(rows), set(touched)
            try:
                box["result"] = self._apply_append(
                    sid, events, expected, created, rows, touched
                )
            except BaseException as e:
                if len(rows) > rows_before or touched != touched_before:
                    # MID-APPLY failure (infrastructure, not a rejection):
                    # state for this append is half-applied and later
                    # appends would check against it — abort the whole
                    # group, restore from the durable log, commit nothing
                    del rows[rows_before:]
                    self._rollback(touched)
                    aborted = e
                box["error"] = e  # rejection, or first aborted append
        if aborted is not None:
            for *_ignored, box in batch:
                box.pop("result", None)
                box.setdefault("error", aborted)
        if rows and aborted is None:
            try:
                self._commit(rows)
            except BaseException as e:
                self._rollback(touched)
                for *_ignored, box in batch:
                    box.pop("result", None)
                    box.setdefault("error", e)
        for *_ignored, box in batch:
            box["done"].set()

    def _publish_append(self, names: list[str]) -> None:
        """Publish an append commit's files to the manifest as a CAS
        against the generation this process last observed. A conflict
        means the snapshot moved underneath us: either a maintenance
        rewrite published in between (legitimate — re-sync the base and
        retry, the union is recomputed from the NEW snapshot) or our
        lock was stolen and the thief published (the fencing race
        ADVICE r5 called out) — ``_verify_fence`` then raises before any
        retry, so a fenced-out writer's publish FAILS instead of
        last-reader-winning over the thief's commit."""
        attempts = 0
        while True:
            try:
                self._core.manifest_seq = manifest.append_files(
                    self.path, names, base_seq=self._core.manifest_seq
                )
                return
            except manifest.ManifestConflictError:
                _verify_fence(self._core)  # fenced → raise, never retry
                attempts += 1
                if attempts >= 8:
                    raise
                cur = manifest.latest(self.path)
                self._core.manifest_seq = -1 if cur is None else cur[0]

    def _bump_stream_gen(self, stream_id: str) -> None:
        """Record a commit touching ``stream_id`` in the shared core and
        mark this writer's own caches as taken at the new generation."""
        gen = self._core.stream_gen.get(stream_id, 0) + 1
        self._core.stream_gen[stream_id] = gen
        self._cache_gen[stream_id] = gen
        if stream_id.startswith("$$"):
            self._cache_gen[f"meta:{stream_id[2:]}"] = gen

    def _set_meta_cache(self, stream_id: str, doc: dict) -> None:
        self._meta_cache[stream_id] = doc
        self._cache_gen[f"meta:{stream_id}"] = self._core.stream_gen.get(
            f"$${stream_id}", 0
        )

    def append_df(self, batch: DataFrame, created: datetime | None = None) -> None:
        """Bulk path: append pre-shaped envelope rows (stream_id,
        event_type, data, metadata, event_id) — used by projection emission
        sinks where event ids are deterministic.

        Fully distributed: exactly-once dedupe is a left-anti join against
        the committed log on (stream_id, event_id); event numbers are a
        window partitioned by stream; global log positions come from
        per-stream contiguous blocks allocated from one per-stream count
        (one driver row per TOUCHED stream, never one per event). A
        $by_event_type-scale rebuild (one link per log event) never
        collects event rows to the driver.

        Within-stream numbering follows SOURCE order when the batch carries
        it (``source_log_position``/``emit_seq``, as projection emissions
        do — the reference appends emissions in fold order); otherwise the
        deterministic event_id order. Driver-side numbering state commits
        only AFTER the write succeeds — a failed Spark job leaves the
        writer's dense-numbering invariant intact for the retry.
        """
        if self._read_only:
            raise WriterFencedError(
                f"writer for {self.path} is read-only — appends go through "
                "the owning writer process"
            )
        with self._core.mutex:
            self._append_df_locked(batch, created)

    def _append_df_locked(self, batch: DataFrame, created) -> None:
        _verify_fence(self._core)
        self._last_position = max(
            self._last_position, self._core.last_position or 0
        )
        order_cols = [
            c for c in ("source_log_position", "emit_seq") if c in batch.columns
        ]
        b = batch.select(
            "stream_id", "event_type", "data", "metadata", "event_id", *order_cols
        ).dropDuplicates(["stream_id", "event_id"])
        if self._has_files():
            # exactly-once anti-join, PRUNED to the batch's own streams:
            # the log side filters on the touched stream set (one tiny
            # distinct over the batch), so the scan prunes by row-group
            # stats / buckets instead of shuffling the whole log. A batch
            # touching an enormous stream set falls back to the full
            # anti-join rather than building an oversized isin plan.
            log = self.load().select("stream_id", "event_id")
            sids = [
                r["stream_id"]
                for r in b.select("stream_id").distinct().limit(10_001).collect()
            ]
            if len(sids) <= 10_000:
                log = log.where(F.col("stream_id").isin(sids))
            b = b.join(log, ["stream_id", "event_id"], "left_anti")
        b = b.cache()
        try:
            # one job yields per-stream counts AND the size guard: the
            # single-event path validates MAX_RECORD_SIZE (TFConsts parity)
            # in _validate_sizes; the bulk path must enforce the same bound
            # or projection emissions could commit unreadably large rows.
            counts = b.groupBy("stream_id").agg(
                F.count(F.lit(1)).alias("count"),
                F.max(
                    F.coalesce(F.octet_length("data"), F.lit(0))
                    + F.coalesce(F.octet_length("metadata"), F.lit(0))
                ).alias("max_size"),
            ).collect()
            if not counts:
                return
            touched = sorted(r["stream_id"] for r in counts)
            # one batched job fills last-event-number for cold streams; a
            # stream cached at an older shared generation (written through
            # another writer object) counts as cold and reloads
            missing = [
                s for s in touched
                if s not in self._stats
                or self._cache_gen.get(s, 0) != self._core.stream_gen.get(s, 0)
            ]
            for s in missing:  # drop stale views before the reload
                self._stats.pop(s, None)
                self._ids.pop(s, None)
                self._cache_gen[s] = self._core.stream_gen.get(s, 0)
            if missing and self._has_files():
                got = (
                    self.load()
                    .where(F.col("stream_id").isin(missing))
                    .groupBy("stream_id")
                    .agg(
                        F.max("event_number").alias("last"),
                        F.max(
                            (F.col("event_type") == STREAM_DELETED_EVENT_TYPE).cast("int")
                        ).alias("tomb"),
                    )
                    .collect()
                )
                for r in got:
                    self._stats[r["stream_id"]] = [int(r["last"]), bool(r["tomb"])]
            # tombstoned streams drop their rows silently below, so they
            # must not trip the size guard either: an oversize event bound
            # for a deleted stream was never going to commit, and aborting
            # the whole batch for it would fail every LIVE stream's rows
            live = [
                r for r in counts
                if not self._stats.setdefault(r["stream_id"], [NO_STREAM, False])[1]
            ]
            oversized = [r for r in live if int(r["max_size"] or 0) > MAX_RECORD_SIZE]
            if oversized:
                raise RecordTooLargeError(
                    "bulk append contains events over MAX_RECORD_SIZE in streams: "
                    + ", ".join(sorted(r["stream_id"] for r in oversized)[:5])
                )
            by_stream = {r["stream_id"]: int(r["count"]) for r in live}
            alloc = []  # (stream_id, en_base, pos_base)
            new_last = self._last_position
            for sid in sorted(by_stream):
                st = self._stats[sid]
                alloc.append((sid, st[0], new_last))
                new_last += by_stream[sid]
            if not alloc:
                return
            am = self.spark.createDataFrame(
                alloc, "stream_id string, en_base long, pos_base long"
            )
            order = [F.col(c) for c in order_cols] + [F.col("event_id")]
            w = Window.partitionBy("stream_id").orderBy(*order)
            now = created or datetime.now(timezone.utc)
            from .schema import category_of as _category_of

            out = (
                b.join(F.broadcast(am), "stream_id")
                .withColumn("_rn", F.row_number().over(w).cast("long"))
                .select(
                    (F.col("pos_base") + F.col("_rn")).alias("log_position"),
                    F.col("stream_id"),
                    (F.col("en_base") + F.col("_rn")).alias("event_number"),
                    "event_id", "event_type", "data", "metadata",
                    F.lit(now).alias("created"),
                    (F.col("event_type") != "$>").alias("is_json"),
                )
                # one source of truth for the stored category column —
                # schema.category_of (reference extractor edges included)
                .withColumn("category", _category_of(F.col("stream_id")))
                .select([f.name for f in EVENTS_SCHEMA.fields])
            )
            # capture the dir listing BEFORE the write so the manifest
            # gains exactly the files this commit adds — never resurrecting
            # superseded (scavenged, pre-vacuum) files that are still on
            # disk inside their grace period
            pre = {f for f in os.listdir(self.path) if f.endswith(".parquet")}
            out.write.mode("append").parquet(self.path)
            self._publish_append(
                [f for f in os.listdir(self.path)
                 if f.endswith(".parquet") and f not in pre],
            )
            # the write committed — only now advance the numbering state
            self._last_position = self._core.last_position = new_last
            for sid, en_base, _pos in alloc:
                self._stats[sid][0] = en_base + by_stream[sid]
                # the bulk path doesn't know which event_ids landed per
                # stream (collecting them would be one row per EVENT);
                # invalidate the id map so the next append() reloads it
                # from the log and idempotent retries keep working.
                self._ids.pop(sid, None)
                self._bump_stream_gen(sid)
            self._notify_commit()
        finally:
            b.unpersist()

    # pyarrow schema mirroring EVENTS_SCHEMA (timestamp µs UTC — what
    # Spark's TimestampType reads back bit-identically).
    _ARROW_FIELDS = (
        ("log_position", "int64"), ("stream_id", "string"), ("category", "string"),
        ("event_number", "int64"), ("event_id", "string"), ("event_type", "string"),
        ("data", "string"), ("metadata", "string"), ("created", "ts"),
        ("is_json", "bool"),
    )

    def _commit(self, rows: list[tuple]) -> None:
        """Write one commit file directly with pyarrow on the driver — the
        StorageWriterService analog: the single writer appends to the log
        without a cluster round-trip. (Routing a 1-row batch through
        ``spark.createDataFrame(...).write`` costs seconds per commit —
        a Python-RDD-backed plan plus a full write job — for data that
        never needs an executor.) Readers see the file atomically: written
        dot-prefixed (ignored by Spark's file index), then renamed in.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        types = {
            "int64": pa.int64(), "string": pa.string(), "bool": pa.bool_(),
            "ts": pa.timestamp("us", tz="UTC"),
        }
        schema = pa.schema([(n, types[t]) for n, t in self._ARROW_FIELDS])
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        )
        name = f"part-writer-{rows[-1][0]:020d}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.path, "." + name + ".tmp")
        pq.write_table(table, tmp, compression="snappy")
        os.rename(tmp, os.path.join(self.path, name))
        self._publish_append([name])
        self._notify_commit()

    # -- commit wake-ups (U3 long-poll support) --
    # The condition lives in the shared _PathCore, so a waiter parked via
    # one writer object wakes on commits made through any writer on the
    # same directory in this process.
    def _notify_commit(self) -> None:
        with self._core.cond:
            self._core.epoch += 1
            self._core.cond.notify_all()

    def commit_epoch(self) -> int:
        """Monotone counter of committed writes to this log (process-wide)."""
        with self._core.cond:
            return self._core.epoch

    def wait_for_commit(self, seen_epoch: int, timeout_s: float) -> int:
        """Block until a commit after ``seen_epoch`` lands or the timeout
        elapses; returns the current epoch (== ``seen_epoch`` on timeout)."""
        with self._core.cond:
            self._core.cond.wait_for(
                lambda: self._core.epoch > seen_epoch, timeout=timeout_s
            )
            return self._core.epoch

    def close(self) -> None:
        """Release the cross-process writer lock held by THIS PROCESS for
        the log directory (all in-process writer objects share the claim
        via the _PathCore). A crashed process needs no close — its lock is
        detected stale by pid-liveness and stolen by the next writer."""
        if self._read_only:
            return  # never held the fence — and must not release the
            # owning writer's claim through the shared core
        self._group_stop.set()
        with self._group_cond:
            self._group_cond.notify_all()
        if self._group_thread is not None:
            self._group_thread.join(timeout=5)
        self._drain_group_queue()  # never leave an enqueued caller parked
        with self._core.mutex:
            _release_fence(self._core)

    def log_signature(self) -> frozenset:
        """Cheap change detector for logs written by ANOTHER process (no
        in-process commit notify): the set of committed parquet file names.
        One os.listdir — never a Spark job."""
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return frozenset()
        return frozenset(n for n in names if n.endswith(".parquet"))

    # -- delete surface (S8) --
    @staticmethod
    def _validate_append(stream_id: str, events, expected_version: int) -> None:
        """Structural write validation, the reference's exact rules:

        * stream id must not be empty or the bare metastream prefix
          (`SystemStreams.IsInvalidStream`: null/empty or "$$" —
          SystemNames.cs:55-58; ClientMessage.WriteEvents:186);
        * expected version must be an exact number ≥ 0 or one of
          NoStream/Any/StreamExists — below StreamExists(-4) or the
          historical Invalid(-3) are rejected (ClientMessage.cs:189-191);
        * every event needs a non-empty type and id (Data/Event.cs:30-35).

        ACL-style rules (who may write `$`-streams) are out of scope —
        this is the access-independent validation every writer applies."""
        if not stream_id or stream_id == METASTREAM_PREFIX:
            raise ValueError(
                f"invalid stream id {stream_id!r} (empty or bare '$$')")
        if expected_version < STREAM_EXISTS or expected_version == -3:
            raise ValueError(
                f"invalid expected_version {expected_version} (exact ≥ 0, "
                f"NO_STREAM {NO_STREAM}, ANY {ANY}, or "
                f"STREAM_EXISTS {STREAM_EXISTS})")
        for ev in events:
            if not ev.event_type:
                raise ValueError("empty eventType provided")
            if not ev.event_id:
                raise ValueError("empty eventId provided")

    def last_event_number(self, stream_id: str) -> int:
        """The stream's last event number, NO_STREAM when never written
        (IndexReader.GetStreamLastEventNumber — the head lookup every
        commit check starts from)."""
        return int(self._stream_state(stream_id)[0])

    def soft_delete(self, stream_id: str, metadata_writer=None) -> None:
        """Soft delete = write a FRESH metadata document containing only
        $tb = MAX_LONG (StorageWriterService.cs:510 constructs
        ``new StreamMetadata(truncateBefore: DeletedStream)`` — prior
        maxAge/maxCount are deliberately discarded by the delete; the
        recreate path's SoftUndeleteRawMeta preserves whatever document
        exists THEN, which is this $tb-only one). New appends recreate
        the stream."""
        self.append(
            f"$${stream_id}",
            [ProposedEvent(METADATA_EVENT_TYPE, data=f'{{"$tb": {MAX_LONG}}}')],
        )
        self._set_meta_cache(stream_id, {"$tb": MAX_LONG})

    def hard_delete(self, stream_id: str) -> None:
        """Tombstone: a $streamDeleted event; stream can never be recreated."""
        self.append(
            stream_id,
            [ProposedEvent(STREAM_DELETED_EVENT_TYPE, data=None, is_json=False)],
        )

    def load(self) -> DataFrame:
        """The committed log as a DataFrame — a PINNED SNAPSHOT: when the
        log has a manifest (see ``manifest.py``), the file list is resolved
        here, at DataFrame creation, so a concurrent maintenance rewrite
        can never FileNotFound this reader (superseded files are retained
        until ``vacuum``'s grace period expires). Plain directories (no
        manifest yet) read as before."""
        files = manifest.snapshot_files(self.path)
        if files is None:
            return self.spark.read.schema(EVENTS_SCHEMA).parquet(self.path)
        return self._load_files(files)

    def load_at(self, seq: int) -> DataFrame:
        """Time travel: the log as of manifest generation ``seq`` (see
        ``manifest.history``). Raises if that generation was never
        published or has been vacuumed away."""
        files = manifest.files_at(self.path, seq)
        if files is None:
            raise ValueError(
                f"manifest generation {seq} not available for {self.path} "
                "(never published, or removed by vacuum)"
            )
        return self._load_files(files)

    def _load_files(self, files: list[str]) -> DataFrame:
        if not files:
            return self.spark.createDataFrame([], EVENTS_SCHEMA)
        # archive-aware: names resolve to the hot tier when present, else
        # to the cold tier (manifest.resolve_files) — the transparent
        # read-through of the reference's archiving feature
        return self.spark.read.schema(EVENTS_SCHEMA).parquet(
            *manifest.resolve_files(self.path, files)
        )
