"""The five standard ("system") projections as derived views (SURVEY §2.5).

Reference registers these at ProjectionManager.RegisterSystemProjections
(/root/reference/src/EventStore.Projections.Core/Services/Management/
ProjectionManager.cs:883-924). There each is a continuous JS projection
emitting LINK events into `$ce-`/`$et-`/... streams — i.e. physical copies
of the log used as secondary indexes. On a columnar table they collapse
into derived columns + views: no copy, no link indirection, and the
"index" property comes from partition/Z-order layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import category_of


def streams_directory(events: DataFrame) -> DataFrame:
    """Y1 `$streams`: one row per stream = its first event's position.

    Reference: Standard/IndexStreams.cs:15 (links first event of each
    stream into `$streams`). Map-side partial agg then final — one shuffle
    on stream_id, the table's native key.
    """
    return events.groupBy("stream_id").agg(
        F.min("log_position").alias("first_log_position"),
        F.max("event_number").alias("last_event_number"),
        F.count(F.lit(1)).alias("event_count"),
    )


def by_category(events: DataFrame, category: str | None = None) -> DataFrame:
    """Y2 `$by_category` ($ce-<cat>): events of all streams whose category
    matches; category = stream_id before first '-'.

    Reference: Standard/CategorizeEventsByStreamPath.cs:17-82.
    """
    out = events.withColumn("category", category_of(F.col("stream_id")))
    if category is not None:
        out = out.where(F.col("category") == category)
    return out


def stream_by_category(events: DataFrame, category: str | None = None) -> DataFrame:
    """Y3 `$stream_by_category` ($category-<cat>): one row per STREAM.

    Reference: Standard/CategorizeStreamByPath.cs:15 — links each stream's
    first event into `$category-<cat>`.
    """
    out = (
        events.withColumn("category", category_of(F.col("stream_id")))
        .groupBy("category", "stream_id")
        .agg(F.min("log_position").alias("first_log_position"))
    )
    if category is not None:
        out = out.where(F.col("category") == category)
    return out


def by_event_type(events: DataFrame, event_type: str | None = None) -> DataFrame:
    """Y4 `$by_event_type` ($et-<type>).

    Reference: Standard/IndexEventsByEventType.cs:17-60. At scale the
    event_type predicate prunes via dictionary/min-max stats; optionally
    keep a secondary partition on event_type for hot types.
    """
    if event_type is None:
        return events
    return events.where(F.col("event_type") == event_type)


def by_correlation_id(events: DataFrame, correlation_id: str | None = None) -> DataFrame:
    """Y5 `$by_correlation_id` ($bc-<id>): group events by the
    `$correlationId` property of their metadata JSON.

    Reference: Standard/ByCorrelationId.cs:19 (correlationIdProperty
    defaults to "$correlationId").
    """
    out = events.withColumn(
        "correlation_id", F.get_json_object(F.col("metadata"), "$.$correlationId")
    )
    if correlation_id is not None:
        out = out.where(F.col("correlation_id") == correlation_id)
    return out
