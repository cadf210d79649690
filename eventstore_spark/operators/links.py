"""Link events and link resolution (ResolveLinkTos).

A link event has event_type `$>` and body ``"{number}@{stream}"``
(/root/reference/src/EventStore.Core/Services/SystemNames.cs:97). Reading
with ResolveLinkTos pairs (target event, link event)
(/root/reference/src/EventStore.Core/Data/ResolvedEvent.cs:8-59).

Spark-first: resolution is a LEFT JOIN from link rows to the log on
(stream_id, event_number) — an equi-join on the table's layout key, so it
co-locates without extra shuffle when both sides share the bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import LINK_EVENT_TYPE


def parse_link(data_col):
    """'3@account-1' -> struct(target_event_number long, target_stream string).

    Mirrors the emit format at JintProjectionStateHandler.cs:325.
    Split at the FIRST '@' (stream ids may contain '@').
    """
    pos = F.instr(data_col, "@")
    return F.struct(
        F.substring(data_col, F.lit(1), pos - 1).cast("long").alias("target_event_number"),
        F.substring(data_col, pos + 1, F.lit(2_000_000_000)).alias("target_stream"),
    )


def resolve_links(events: DataFrame, resolve_link_tos: bool = True,
                  targets_from: DataFrame | None = None) -> DataFrame:
    """Return the envelope with link rows resolved to their targets.

    Non-link rows pass through with ``link_*`` columns null. Link rows are
    joined to the target event; unresolved links (deleted/scavenged target)
    keep the link row with null target payload — matching the reference,
    which delivers the link with a null event when resolution fails.

    ``targets_from`` lets a caller resolve a PAGE of link rows against the
    whole log (engine.read_stream does this so the page is filtered/ordered
    by the link's own identity, then resolved — matching the reference,
    which pages by the link's position, ResolvedEvent.cs:8-33).
    """
    if not resolve_link_tos:
        return events

    is_link = F.col("event_type") == LINK_EVENT_TYPE
    links = events.where(is_link).select(
        F.col("log_position").alias("link_log_position"),
        F.col("stream_id").alias("link_stream_id"),
        F.col("event_number").alias("link_event_number"),
        parse_link(F.col("data")).alias("t"),
    ).select("link_log_position", "link_stream_id", "link_event_number", "t.*")

    targets = (targets_from if targets_from is not None else events).select(
        F.col("stream_id").alias("target_stream"),
        F.col("event_number").alias("target_event_number"),
        "log_position", "category", "event_id", "event_type", "data",
        "metadata", "created", "is_json",
    )

    resolved = links.join(
        targets, ["target_stream", "target_event_number"], "left"
    ).select(
        F.coalesce(F.col("log_position"), F.col("link_log_position")).alias("log_position"),
        F.col("target_stream").alias("stream_id"),
        "category",
        F.col("target_event_number").alias("event_number"),
        "event_id", "event_type", "data", "metadata", "created", "is_json",
        "link_stream_id", "link_event_number", "link_log_position",
    )

    plain = events.where(~is_link).select(
        "log_position", "stream_id", "category", "event_number", "event_id",
        "event_type", "data", "metadata", "created", "is_json",
        F.lit(None).cast("string").alias("link_stream_id"),
        F.lit(None).cast("long").alias("link_event_number"),
        F.lit(None).cast("long").alias("link_log_position"),
    )
    return plain.unionByName(resolved)
