"""Append-protocol semantics (S7/S8) — pytest analog of the reference's
IndexWriter.CheckCommit and Idempotency test fixtures."""

import pytest

from eventstore_spark.writer import (
    ANY, NO_STREAM, STREAM_EXISTS,
    EventLogWriter, ProposedEvent,
    StreamDeletedError, WrongExpectedVersionError,
)


@pytest.fixture()
def log(spark, tmp_path):
    return EventLogWriter(spark, str(tmp_path / "log"))


def test_append_assigns_positions(log):
    last = log.append("account-1", [ProposedEvent("A", "{}"), ProposedEvent("B", "{}")])
    assert last == 1
    df = log.load().orderBy("log_position").collect()
    assert [(r.stream_id, r.event_number, r.log_position) for r in df] == [
        ("account-1", 0, 1), ("account-1", 1, 2),
    ]
    assert df[0].category == "account"


def test_expected_version_checks(log):
    log.append("s-1", [ProposedEvent("A")], expected_version=NO_STREAM)
    with pytest.raises(WrongExpectedVersionError):
        log.append("s-1", [ProposedEvent("B")], expected_version=NO_STREAM)
    with pytest.raises(WrongExpectedVersionError):
        log.append("s-1", [ProposedEvent("B")], expected_version=5)
    log.append("s-1", [ProposedEvent("B")], expected_version=0)
    with pytest.raises(WrongExpectedVersionError):
        log.append("s-2", [ProposedEvent("X")], expected_version=STREAM_EXISTS)
    log.append("s-1", [ProposedEvent("C")], expected_version=STREAM_EXISTS)


def test_idempotent_replay(log):
    evs = [ProposedEvent("A", event_id="e1"), ProposedEvent("B", event_id="e2")]
    last1 = log.append("s-1", evs, expected_version=NO_STREAM)
    # exact replay with the same expected version → idempotent, no new rows
    last2 = log.append("s-1", evs, expected_version=NO_STREAM)
    assert last1 == last2 == 1
    assert log.load().count() == 2
    # replay in ANY mode → also deduped
    log.append("s-1", evs, expected_version=ANY)
    assert log.load().count() == 2


def test_hard_delete_blocks_appends(log):
    log.append("s-1", [ProposedEvent("A")])
    log.hard_delete("s-1")
    with pytest.raises(StreamDeletedError):
        log.append("s-1", [ProposedEvent("B")])


def test_soft_delete_writes_metastream(log):
    log.append("s-1", [ProposedEvent("A")])
    log.soft_delete("s-1")
    rows = log.load().where("stream_id = '$$s-1'").collect()
    assert len(rows) == 1 and rows[0].event_type == "$metadata"


def test_recovery_from_disk(spark, tmp_path):
    path = str(tmp_path / "log")
    w1 = EventLogWriter(spark, path)
    w1.append("s-1", [ProposedEvent("A", event_id="e1")])
    w1.append("s-2", [ProposedEvent("B")])
    # new writer instance rebuilds stats and continues the total order
    w2 = EventLogWriter(spark, path)
    last = w2.append("s-1", [ProposedEvent("C")], expected_version=0)
    assert last == 1
    df = w2.load()
    assert df.count() == 3
    assert df.agg({"log_position": "max"}).collect()[0][0] == 3
    # idempotency map survives recovery
    w2.append("s-1", [ProposedEvent("A", event_id="e1")], expected_version=ANY)
    assert w2.load().count() == 3
