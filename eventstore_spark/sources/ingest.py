"""Corpus/event ingestion from non-parquet formats (r10).

Training corpora arrive as JSONL shards, CSV exports, and WARC crawls;
the reference ingests through its append APIs, and this engine's
parquet envelope is the at-rest format — these readers are the bridge.
Design rules, all scale-driven:

  * SCHEMAS ARE PINNED, never inferred — schema inference is a full
    extra pass over the data (at 100 TB, a second 100-TB scan) and can
    silently produce a different schema per shard batch. Every reader
    takes/carries an explicit StructType.
  * Corrupt rows are QUARANTINED, not dropped: PERMISSIVE mode with a
    `_corrupt_record` column kept, so a bad shard is a filterable fact
    (the `badRecordsPath`-style discipline) instead of silent data loss.
  * WARC reading is Spark-native: records are split by the WARC version
    marker using the text source's custom `lineSep` — a distributed
    scan that never concatenates a whole archive on one task. (Header
    parsing is regex-lite by design — response records and their
    target URIs — the same 90% the WET extracts serve; a full HTTP
    parser is a decode step, not a scan step.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents table contract (TESTDATA.md): the shape every corpus
# operator in operators/{textops,corpus,dedup}.py consumes
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])


def _with_quarantine(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )


def documents_from_jsonl(spark: SparkSession, path: str,
                         schema: T.StructType = DOCUMENTS_SCHEMA
                         ) -> DataFrame:
    """JSONL shards → the documents contract. Pinned schema (no
    inference pass); malformed lines land in `_corrupt_record` — filter
    `is_corrupt` to quarantine, never silently drop.

    Scale shape: the JSON source is splittable per line, so a 100-TB
    shard set parallelizes by file blocks; column pruning pushes into
    the Jackson parser (unreferenced JSON fields are never materialized).
    """
    df = (
        spark.read.schema(_with_quarantine(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.withColumn(
        "is_corrupt", F.col("_corrupt_record").isNotNull()
    ).drop("_corrupt_record")


def documents_from_csv(spark: SparkSession, path: str,
                       schema: T.StructType = DOCUMENTS_SCHEMA,
                       header: bool = True, sep: str = ",",
                       multiline: bool = False) -> DataFrame:
    """CSV exports → the documents contract, same pinned-schema and
    quarantine discipline as JSONL.

    ``multiline=False`` (default) keeps the source SPLITTABLE — quoted
    embedded newlines force whole-file tasks (multiLine=true), which is
    the right trade only when the data demands it; say so explicitly.
    """
    df = (
        spark.read.schema(_with_quarantine(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("multiLine", str(multiline).lower())
        .csv(path)
    )
    return df.withColumn(
        "is_corrupt", F.col("_corrupt_record").isNotNull()
    ).drop("_corrupt_record")


# WARC/1.0 and WARC/1.1 both split on the shared version-line prefix;
# the record body resumes after the blank line that ends the headers.
_WARC_DELIM = "WARC/1."


def warc_records(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC record scan: split archives on the WARC version
    marker via the text source's custom record delimiter — each task
    reads its own byte range, no per-archive concatenation.

    Returns (warc_type, target_uri, record_id, content_length, payload)
    — payload is the record body after the header block, with the HTTP
    response header block additionally stripped for `response` records
    (the WET-style text path). Gzip'd archives (.warc.gz) decompress
    through the codec but become one split per FILE — store uncompressed
    or block-gzip'd (bgzf) for scan parallelism; say so instead of
    hiding it.
    """
    raw = spark.read.option("lineSep", _WARC_DELIM).text(path)
    rec = raw.where(F.length(F.trim("value")) > 0).select(
        F.concat(F.lit(_WARC_DELIM), F.col("value")).alias("rec")
    )
    hdr = F.regexp_extract("rec", r"(?s)^(.*?)\r?\n\r?\n", 1)
    header_of = lambda name: F.regexp_extract(  # noqa: E731
        hdr, rf"(?im)^{name}:\s*(\S+)\s*$", 1)
    body = F.expr(
        "substring(rec, length(regexp_extract(rec, '(?s)^(.*?\\r?\\n\\r?\\n)', 1)) + 1)"
    )
    out = rec.select(
        header_of("WARC-Type").alias("warc_type"),
        F.regexp_replace(header_of("WARC-Target-URI"), r"^<|>$", "")
        .alias("target_uri"),
        F.regexp_replace(header_of("WARC-Record-ID"), r"^<|>$", "")
        .alias("record_id"),
        header_of("Content-Length").cast("long").alias("content_length"),
        body.alias("_body"),
    )
    # response records embed an HTTP message: strip ITS header block too
    payload = F.when(
        (F.col("warc_type") == "response")
        & F.col("_body").startswith("HTTP/"),
        F.expr(
            "substring(_body, length(regexp_extract(_body, "
            "'(?s)^(.*?\\r?\\n\\r?\\n)', 1)) + 1)"
        ),
    ).otherwise(F.col("_body"))
    return out.select(
        "warc_type", "target_uri", "record_id", "content_length",
        # records end with CRLF CRLF by spec (rtrim strips only spaces)
        F.regexp_replace(payload, r"[\r\n]+$", "").alias("payload"),
    ).where(F.col("warc_type") != "")


def documents_from_warc(spark: SparkSession, path: str,
                        source: str = "warc") -> DataFrame:
    """WARC response records → the documents contract: payload as text,
    doc ids from a hash of the record id (stable across re-reads —
    positional ids would renumber under different split plans).
    Compose with ``textops.html_extract_text`` for markup payloads and
    the quality/dedup operators downstream.
    """
    rec = warc_records(spark, path).where(F.col("warc_type") == "response")
    return rec.select(
        F.conv(F.substring(F.md5("record_id"), 1, 15), 16, 10)
        .cast("long").alias("doc_id"),
        F.col("payload").alias("text"),
        F.lit("").alias("lang"),
        F.lit(source).alias("source"),
        F.length("payload").cast("long").alias("n_chars"),
    )


def documents_stream_from_jsonl(spark: SparkSession, path: str,
                                schema: T.StructType = DOCUMENTS_SCHEMA,
                                max_files_per_trigger: int | None = None
                                ) -> DataFrame:
    """Structured-Streaming twin of ``documents_from_jsonl``: new JSONL
    shards landing under ``path`` flow through the same pinned schema and
    quarantine contract as micro-batches — the continuous-ingest shape
    (crawl output directory → cleaning pipeline) with exactly-once file
    tracking from the source's checkpoint.

    ``max_files_per_trigger`` bounds each micro-batch (backpressure when
    a backfill dumps thousands of shards at once).
    """
    r = (
        spark.readStream.schema(_with_quarantine(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.json(path).withColumn(
        "is_corrupt", F.col("_corrupt_record").isNotNull()
    ).drop("_corrupt_record")


def documents_to_jsonl(docs: DataFrame, path: str,
                       num_shards: int = 32) -> None:
    """Export the documents contract as sharded JSONL — the interchange
    format every external tokenizer/trainer accepts, and the exact
    inverse of :func:`documents_from_jsonl` (a written corpus reads
    back bit-equal through the same pinned schema).

    Scale shape: one round-robin repartition to ``num_shards`` writer
    tasks, each streaming `to_json(struct(...))` rows to its own file —
    JSON serialization is JVM-side codegen, no Python, no collect; at
    100 TB pick num_shards so files land near block size.
    """
    cols = [c for c in docs.columns if c != "is_corrupt"]
    (
        docs.select(F.to_json(F.struct(*[F.col(c) for c in cols]))
                    .alias("value"))
        .repartition(num_shards)
        .write.mode("overwrite").text(path)
    )
