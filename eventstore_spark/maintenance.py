"""Scavenging — the log-compaction maintenance job (SURVEY §4).

Reference: a phased scavenger (Accumulator → Calculator → ChunkExecutor →
ChunkMerger → IndexExecutor → Cleaner, TransactionLog/Scavenging/
Scavenger.cs) that removes deleted/truncated/expired events and merges
chunks, checkpointed and resumable.

Columnar translation: scavenge = one declarative anti-visibility DELETE +
file compaction, expressed as "rewrite the log directory keeping only
rows that retention still admits", in one Spark job:

  keep = visible user events  ∪  latest $metadata per metastream
       ∪  tombstone markers (so hard-deleted streams stay dead)

log_position values are preserved (the reference scavenger also keeps
positions stable — readers' checkpoints stay valid). Output is coalesced
into few files — the ChunkMerger analog. On a transactional table format
(Delta/Iceberg) this is DELETE + OPTIMIZE; on the plain parquet dir used
here it's a staged rewrite with an atomic directory swap.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators.retention import visible_events
from .schema import EVENTS_SCHEMA, METASTREAM_PREFIX


def scavenge(
    spark: SparkSession,
    path: str,
    stream_metadata=None,
    now_ts=None,
    target_files: int = 8,
) -> dict:
    """Run a scavenge over a log directory; returns stats."""
    df = spark.read.schema(EVENTS_SCHEMA).parquet(path)
    before = df.count()

    is_meta = F.col("stream_id").startswith(METASTREAM_PREFIX)
    user = df.where(~is_meta)

    # latest metadata event per metastream survives (it defines retention)
    from pyspark.sql.window import Window

    metas = df.where(is_meta)
    w = Window.partitionBy("stream_id").orderBy(F.col("event_number").desc())
    latest_meta = (
        metas.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    )

    tombstones = user.where(F.col("event_type") == "$streamDeleted")

    kept_user = visible_events(user, stream_metadata, now_ts=now_ts)
    kept = kept_user.unionByName(latest_meta).unionByName(tombstones).dropDuplicates(
        ["log_position"]
    )

    staging = path.rstrip("/") + f"._scavenge_{int(time.time() * 1000)}"
    kept.coalesce(target_files).write.mode("overwrite").parquet(staging)
    after = spark.read.schema(EVENTS_SCHEMA).parquet(staging).count()

    # atomic-ish swap (single-writer invariant: no concurrent appends during
    # scavenge — same constraint as the reference's chunk switch-over)
    old = path.rstrip("/") + "._scavenged_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)

    return {"events_before": before, "events_after": after, "removed": before - after}


def bucket_log(
    spark: SparkSession,
    path: str,
    table: str,
    buckets: int = 32,
    location: str | None = None,
) -> dict:
    """Publish the log as a Spark BUCKETED table hash-clustered on
    ``stream_id`` — the co-location layout for stream-keyed work at scale.

    ``optimize_layout`` (range + sort) optimizes point/range READS of one
    stream; bucketing optimizes stream-keyed COMPUTE: with the table
    bucketed and sorted on (stream_id, event_number), Catalyst's scan
    reports hash(stream_id) output partitioning, so

      - per-stream aggregations ($streams-style stats),
      - log-to-log joins on stream_id (link resolution, rebuilds), and
      - the projection runtime's grouped folds (applyInPandas requires a
        ClusteredDistribution on the group key — satisfied by the
        bucketed scan)

    all plan with ZERO Exchange (pinned by tests/test_plans.py). At 100 TB
    that removes the full-log shuffle from every by-stream pass; the
    shuffle is paid once here, at publish time. The reference's analog is
    the PTable index keyed by stream hash (SURVEY §4) — same idea: cluster
    once by the access key, serve every later pass from the clustering.

    ``location`` makes the table external at that path (tests); otherwise
    it lands in the session warehouse. Rewrite-in-full, single-writer
    invariant, like scavenge/optimize_layout.
    """
    df = spark.read.schema(EVENTS_SCHEMA).parquet(path)
    # pre-repartition on the bucket key so each task writes only its own
    # buckets (without it every task can open `buckets` files at once)
    writer = (
        df.repartition(buckets, "stream_id")
        .write.mode("overwrite")
        .bucketBy(buckets, "stream_id")
        .sortBy("stream_id", "event_number")
        .format("parquet")
    )
    if location:
        writer = writer.option("path", location)
    writer.saveAsTable(table)
    # count AFTER the rewrite, from the published table — no second pass
    # over the source log just for stats
    n = spark.table(table).count()
    return {"events": n, "table": table, "buckets": buckets}


def optimize_layout(spark: SparkSession, path: str, target_files: int = 8) -> dict:
    """Rewrite the log for read locality WITHOUT removing anything — the
    ChunkMerger/Z-order analog of the reference's compaction (SURVEY §4:
    "Parquet row-group min/max pruning + Z-order on (stream_id,
    event_number) replaces the PTable index").

    Appends land as many small per-commit files in arrival order; after
    enough commits, per-stream reads touch every file. This job
    repartitions BY RANGE on (stream_id, event_number) and sorts within
    partitions, so each output file covers a contiguous (stream, number)
    range and parquet footer min/max stats prune per-stream reads to a
    couple of files. log_position values are untouched — checkpoints and
    $all order stay valid. Single-writer invariant: no concurrent appends
    during the swap (same constraint as scavenge / the reference's chunk
    switch-over).
    """
    df = spark.read.schema(EVENTS_SCHEMA).parquet(path)
    n = df.count()
    staging = path.rstrip("/") + f"._optimize_{int(time.time() * 1000)}"
    (
        df.repartitionByRange(target_files, "stream_id", "event_number")
        .sortWithinPartitions("stream_id", "event_number")
        .write.mode("overwrite")
        .parquet(staging)
    )
    after = spark.read.schema(EVENTS_SCHEMA).parquet(staging).count()
    if after != n:  # paranoia: never swap in a lossy rewrite
        shutil.rmtree(staging)
        raise RuntimeError(f"optimize_layout row mismatch: {n} -> {after}")
    old = path.rstrip("/") + "._optimized_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {"events": n, "files": len(files)}
