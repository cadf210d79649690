"""Read-surface semantics (S1-S5), mirroring the reference's storage-reader
test style (EventStore.Core.Tests/Services/Storage/ReadIndexTestScenario)."""

from pyspark.sql import functions as F

from eventstore_spark.operators.filters import EventFilter, default_all_filter
from eventstore_spark.sources import readers as R


def nums(df, col="event_number"):
    return [r[col] for r in df.collect()]


def test_read_event_point(bank_events):
    got = R.read_event(bank_events, "account-1", 1).collect()
    assert len(got) == 1 and got[0].event_id == "a2"


def test_read_event_last(bank_events):
    got = R.read_event(bank_events, "account-1", -1).collect()
    assert got[0].event_id == "a3"


def test_read_event_missing(bank_events):
    assert R.read_event(bank_events, "account-1", 99).count() == 0
    assert R.read_event(bank_events, "nope", 0).count() == 0


def test_read_stream_forward_paging(bank_events):
    assert nums(R.read_stream_forward(bank_events, "account-1", 1, 2)) == [1, 2]
    assert nums(R.read_stream_forward(bank_events, "chat-1")) == [0, 1, 2]


def test_read_stream_backward(bank_events):
    assert nums(R.read_stream_backward(bank_events, "chat-1", max_count=2)) == [2, 1]
    assert nums(R.read_stream_backward(bank_events, "chat-1", from_event_number=1)) == [1, 0]


def test_read_all_order(bank_events):
    assert nums(R.read_all_forward(bank_events, 4, 3), "log_position") == [4, 5, 6]
    assert nums(R.read_all_backward(bank_events, max_count=2), "log_position") == [11, 10]


def test_filtered_all_prefix_and_regex(bank_events):
    f = EventFilter(stream_prefixes=("account-",))
    assert R.read_all_filtered(bank_events, f).count() == 5
    f2 = EventFilter(event_type_regex="^(Deposited|Withdrawn)$", stream_regex="-2$")
    assert nums(R.read_all_filtered(bank_events, f2), "log_position") == [2, 8]


def test_default_all_filter_hides_system(spark, bank_events):
    noisy = bank_events.union(
        spark.createDataFrame(
            [(99, "$persistentsubscription-s::g-checkpoint", None, 0, "x", "chk", None, None, None, True)],
            bank_events.schema,
        )
    )
    got = R.read_all_filtered(noisy, None, apply_default_filter=True)
    assert not [r for r in got.collect() if r.stream_id.startswith("$")]


def test_event_filter_empty_predicate(bank_events):
    assert bank_events.where(EventFilter().predicate()).count() == bank_events.count()
