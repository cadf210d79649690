"""Property-based coverage of the append protocol (S7/S8): random op
sequences against a pure-Python model of the reference's commit decision
(IndexWriter.CheckCommit semantics — Ok / WrongExpectedVersion / Deleted /
Idempotent, CommitDecision.cs:6-14) must agree with EventLogWriter on
every per-op outcome AND the final committed log.

The model is deliberately independent code (dicts + lists, no Spark), so
a bug in the writer's staged-state bookkeeping, idempotency window, or
recreate path shows up as a divergence hypothesis then shrinks."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eventstore_spark.writer import (
    ANY, NO_STREAM, STREAM_EXISTS,
    EventLogWriter, ProposedEvent,
    StreamDeletedError, WrongExpectedVersionError,
)

STREAMS = ["acct-1", "acct-2", "chat-1"]
EVENT_IDS = [f"e{i}" for i in range(8)]


class Model:
    """Reference semantics in plain Python."""

    def __init__(self):
        self.events: dict[str, list[str]] = {}   # stream -> event_ids in order
        self.tomb: dict[str, bool] = {}
        self.tb: dict[str, int | None] = {}      # $tb from soft delete
        self.meta_exists: dict[str, bool] = {}   # metastream has events

    def last(self, sid):
        return len(self.events.get(sid, [])) - 1

    def append(self, sid, ids, expected):
        # latest position wins — duplicate ids CAN be re-committed at new
        # positions (fresh-first-id ANY writes), like the reference's
        # committed-events cache
        known = {eid: n for n, eid in enumerate(self.events.get(sid, []))}
        if self.tomb.get(sid):
            raise StreamDeletedError(sid)
        last = self.last(sid)
        soft_deleted = self.tb.get(sid) == "deleted"
        if expected == ANY:
            dedupe = True
        elif expected == STREAM_EXISTS:
            # soft-deleted → CommitDecision.Deleted (CheckCommit:192-193)
            if soft_deleted:
                raise StreamDeletedError(sid)
            # metastream-only existence passes (CheckCommit:195-200)
            if last == NO_STREAM and not self.meta_exists.get(sid):
                raise WrongExpectedVersionError(sid, expected, last)
            dedupe = True
        elif expected != last:
            # exact-mode positional walk (CheckCommit:236-280)
            if not (expected < last and ids):
                raise WrongExpectedVersionError(sid, expected, last)
            for i, eid in enumerate(ids):
                if known.get(eid) == expected + 1 + i:
                    continue
                if i == 0 and expected == NO_STREAM and soft_deleted:
                    break  # recreate path: whole batch appends fresh
                # first-miss → WrongExpectedVersion; later miss →
                # CorruptedIdempotency → same client-visible error
                raise WrongExpectedVersionError(sid, expected, last)
            else:
                return expected + len(ids)  # idempotent replay
            dedupe = False
        else:
            # exact expected match = CommitDecision.Ok: the write
            # proceeds; positionless dedupe is ANY/STREAM_EXISTS-only
            # (IndexWriter.CheckCommit:204-233,287)
            dedupe = False
        if dedupe and ids and ids[0] in known:
            if all(eid in known for eid in ids):
                return known[ids[-1]]  # full dedupe, own end number
            # partial prefix → CorruptedIdempotency → WrongExpectedVersion
            raise WrongExpectedVersionError(sid, expected, last)
        first_new = None
        for eid in ids:
            self.events.setdefault(sid, []).append(eid)
            if first_new is None:
                first_new = self.last(sid)
        # soft-delete recreate: $tb moves to the first new number
        if first_new is not None and self.tb.get(sid) == "deleted":
            self.tb[sid] = first_new
        return self.last(sid)

    def soft_delete(self, sid):
        self.tb[sid] = "deleted"
        self.meta_exists[sid] = True

    def hard_delete(self, sid):
        if self.tomb.get(sid):
            raise StreamDeletedError(sid)
        self.events.setdefault(sid, []).append(f"$tomb-{sid}")
        self.tomb[sid] = True


ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.sampled_from(STREAMS),
            st.lists(st.sampled_from(EVENT_IDS), min_size=1, max_size=3,
                     unique=True),
            st.sampled_from([ANY, ANY, ANY, NO_STREAM, STREAM_EXISTS,
                             0, 1, 2, 5]),
        ),
        st.tuples(st.just("soft_delete"), st.sampled_from(STREAMS)),
        st.tuples(st.just("hard_delete"), st.sampled_from(STREAMS)),
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sequence=ops)
def test_append_protocol_matches_model(spark, tmp_path_factory, sequence):
    path = str(tmp_path_factory.mktemp("prop") / "log")
    w = EventLogWriter(spark, path)
    m = Model()
    for op in sequence:
        kind = op[0]
        if kind == "append":
            _, sid, ids, expected = op
            evs = [ProposedEvent("E", '{"v": 1}', event_id=eid) for eid in ids]
            try:
                want = m.append(sid, ids, expected)
                got = w.append(sid, evs, expected_version=expected)
                assert got == want, (op, got, want)
            except (WrongExpectedVersionError, StreamDeletedError) as e:
                with pytest.raises(type(e)):
                    w.append(sid, evs, expected_version=expected)
        elif kind == "soft_delete":
            m.soft_delete(op[1])
            w.soft_delete(op[1])
        else:
            try:
                m.hard_delete(op[1])
                w.hard_delete(op[1])
            except StreamDeletedError:
                with pytest.raises(StreamDeletedError):
                    w.hard_delete(op[1])
    # final committed log agrees stream by stream, in order
    rows = w.load().collect()
    got_by_stream: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        if r.stream_id.startswith("$$"):
            continue  # metastream bookkeeping is outside the model
        got_by_stream.setdefault(r.stream_id, []).append(
            (r.event_number, r.event_id)
        )
    for sid, want_ids in m.events.items():
        got = [eid for _, eid in sorted(got_by_stream.get(sid, []))]
        want = [
            eid if not eid.startswith("$tomb-") else got[n]
            for n, eid in enumerate(want_ids)
        ]  # tombstone event ids are writer-generated uuids; match by slot
        assert len(got) == len(want_ids), sid
        for n, eid in enumerate(want_ids):
            if not eid.startswith("$tomb-"):
                assert got[n] == eid, (sid, n)
    # positions globally dense
    positions = sorted(r.log_position for r in rows)
    assert positions == list(range(1, len(rows) + 1))
