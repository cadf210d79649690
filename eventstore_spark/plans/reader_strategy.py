"""Source planner: projection spec -> Catalyst predicate (SURVEY §3.3).

The reference's ReaderStrategy (/root/reference/src/EventStore.Projections
.Core/Services/Processing/Strategies/ReaderStrategy.cs:179-240) is its
physical planner: it picks StreamEventReader / MultiStreamEventReader /
$ce-reader / TransactionFileEventReader / EventByTypeIndexEventReader.

On a columnar log all five collapse into one pruned scan: the "reader
choice" becomes a predicate (stream_id ∈ ..., category = ..., event_type ∈
...) that Catalyst pushes into parquet. The EventByTypeIndex dual-mode
trick (read $et- index streams until caught up, then switch to the raw log,
EventByTypeIndexEventReader.cs:57-116) is subsumed by min/max + dictionary
pruning on event_type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import category_of


def source_predicate(proj) -> Column:
    """Build the scan predicate for a Projection spec."""
    # fromAll reads the USER event feed: `$`-prefixed system streams
    # (projection results/checkpoints, link indexes) are excluded by
    # default, as the reference's default $all filter does — otherwise a
    # from_all fold would consume its own emissions/checkpoints on re-run
    # and its state would drift between identical runs.
    pred = ~F.col("stream_id").startswith("$")
    if proj.streams:
        pred = (
            F.col("stream_id") == proj.streams[0]
            if len(proj.streams) == 1
            else F.col("stream_id").isin(*proj.streams)
        )
    elif proj.categories:
        cat = F.coalesce(F.col("category"), category_of(F.col("stream_id")))
        pred = cat == proj.categories[0] if len(proj.categories) == 1 else cat.isin(
            *proj.categories
        )
    # typed-handler pushdown (P5): only events with registered handlers are
    # read when there is no $any/$deleted catch-all.
    handlers = getattr(proj, "handlers", {})
    if proj.event_types_hint and "$any" not in handlers and "$deleted" not in handlers:
        pred = pred & F.col("event_type").isin(*proj.event_types_hint)
    return pred


def deletion_notice_source(events: DataFrame, proj) -> DataFrame | None:
    """Soft-delete metastream writes (`$$X` $metadata with $tb = max),
    normalized to `$streamDeleted`-shaped rows of the OWNER stream, for
    specs with a `$deleted` handler — the reference's projection
    subscription turns BOTH deletion shapes into the partition-deleted
    notification (StreamDeletedHelper.cs:35-63;
    EventSubscriptionBasedProjectionProcessingPhase). Hard tombstones
    need no normalization: they are ordinary rows of the user stream and
    already flow through the spec predicate. None when the spec has no
    `$deleted` handler (the fold would skip the rows anyway — same
    semantics, no extra scan branch).

    A separate pushed-filter branch UNIONed by the caller, never a
    per-row rewrite of the main scan — the spec predicate stays on
    storage columns so stream/category/type pushdown survives."""
    if "$deleted" not in getattr(proj, "handlers", {}):
        return None
    from ..operators.system_projections import (
        origin_stream,
        softdelete_meta_row,
    )

    owner = origin_stream()
    pred = softdelete_meta_row()
    if proj.streams:
        pred = pred & (
            owner == proj.streams[0] if len(proj.streams) == 1
            else owner.isin(*proj.streams)
        )
    elif proj.categories:
        oc = category_of(owner)
        pred = pred & (
            oc == proj.categories[0] if len(proj.categories) == 1
            else oc.isin(*proj.categories)
        )
    else:
        pred = pred & ~owner.startswith("$")
    nul = F.lit(None).cast("string")
    return events.where(pred).select(
        F.col("log_position"),
        owner.alias("stream_id"),
        category_of(owner).alias("category"),
        F.col("event_number"),
        F.col("event_id"),
        F.lit("$streamDeleted").alias("event_type"),
        nul.alias("data"),
        nul.alias("metadata"),
        F.col("created"),
        F.lit(False).alias("is_json"),
    )


def select_source(events: DataFrame, proj) -> DataFrame:
    base = events.where(source_predicate(proj))
    if (getattr(proj, "partition_fn", None) is not None
            or getattr(proj, "partition_col", None) is not None):
        # custom partitionBy: deletion rows never reach the user's
        # partition extractor — a null-body tombstone through a user
        # partition fn would crash or mis-partition, and the reference
        # maps deletions to custom partitions through its stream→
        # partition checkpoint state, which the columnar runtime does
        # not model. (foreachStream's partition IS the stream, so
        # deletions partition naturally there.)
        from ..operators.system_projections import tombstone_row

        return base.where(~tombstone_row())
    soft = deletion_notice_source(events, proj)
    if soft is not None:
        base = base.unionByName(soft.select(*base.columns))
    return base
