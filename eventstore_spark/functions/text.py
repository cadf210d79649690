"""Text-analysis functions for large-scale training-data pipelines.

All hot-path functions are built from JVM-side ``pyspark.sql.functions``
(whole-stage codegen, no Python in the loop) and each has an exactly
equivalent DuckDB SQL form (used by the oracle) — the determinism contract
is: identical strings/integers in both engines, doubles produced by the
identical operation sequence.

Token model: lowercase, split on whitespace runs (a deliberately simple,
deterministic "BPE-ish" baseline); shingles are word n-grams.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword list — a deterministic quality-signal vocabulary.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "at", "by", "from", "as", "that", "this", "it", "be",
)


def normalize(text: Column) -> Column:
    """lower + trim + collapse whitespace runs to single spaces."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def tokens(text: Column) -> Column:
    """array<string> of whitespace tokens of the normalized text."""
    return F.split(normalize(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (space-joined).

    Docs shorter than n tokens get one shingle = the whole normalized text,
    so every doc participates in minhash.

    Built as a zip_with CHAIN over n shifted slices — not
    transform(sequence, i -> slice(toks, i, n)): a derived array
    referenced inside a per-element lambda re-evaluates its whole
    expression per element after projection collapse (O(len²) splits;
    measured 53 s -> 6.5 s on a 3M-shingle explode at sf1).
    """
    toks = tokens(text)
    k = F.size(toks)
    m = k - n + 1
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(k >= n, grams).otherwise(F.array(normalize(text)))


# Spark-SQL text: adjacent-token bigrams of a staged `_toks` array column.
# Guarded so size<2 yields [] — sequence(1,0) would count DOWN in Spark.
# zip_with over two slices, NOT transform(sequence, i -> _toks[i-1] ...):
# after projection collapse, every `_toks[i]` subscript re-evaluates the
# whole upstream split expression, turning bigram construction O(len^2)
# per row — measured 94 s -> 5.4 s on a 6.1M-gram explode at sf1. The
# slice form references the array a constant number of times.
SPARK_SQL_BIGRAMS = (
    "IF(size(_toks) < 2, array(), "
    "zip_with(slice(_toks, 1, size(_toks) - 1), "
    "slice(_toks, 2, size(_toks) - 1), (a, b) -> concat(a, ' ', b)))"
)


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[.,;:!?]")).cast("long")


def stopword_count(text: Column) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t))).cast("long")


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality in [0,1]: rewards moderate length,
    a sane stopword ratio, and low punctuation density.

    score = 0.4*min(1, n_tokens/100) + 0.4*min(1, 4*stop_ratio)
          + 0.2*(1 - min(1, 10*punct_ratio))
    """
    nt = token_count(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / F.greatest(nt, F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )
    return (
        F.lit(0.4) * F.least(F.lit(1.0), nt / F.lit(100.0))
        + F.lit(0.4) * F.least(F.lit(1.0), F.lit(4.0) * stop_ratio)
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0), F.lit(10.0) * punct_ratio))
    )


# BPE-ish sub-word tokenization: letter runs, digit runs, and single
# punctuation marks as separate tokens — the shape a byte-pair-encoding
# vocabulary produces, as a deterministic regex both engines run
# identically (the alternatives are disjoint character classes, so
# leftmost-first vs leftmost-longest engines agree).
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    return F.regexp_extract_all(normalize(text), F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def sql_bpe_token_count(c: str) -> str:
    norm = SQL_NORMALIZE.format(c=c)
    return rf"CAST(len(regexp_extract_all({norm}, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)"


# Rolling (Rabin-Karp-style polynomial) document fingerprint. Unlike the
# md5 fingerprint above, this is an order-sensitive fold over token hashes —
# the incremental-hash family the reference uses for stream-id indexing
# (src/EventStore.Core/Index/Hashes/Murmur3AUnsafe.cs:8) re-expressed as a
# codegen'd left fold. acc stays < 2^31 so acc*B + h fits a BIGINT in both
# engines.
ROLL_B = 131
ROLL_P = 2147483647  # 2^31 - 1


def rolling_fingerprint(text: Column) -> Column:
    """h = fold(tokens, 0, (acc, t) -> (acc * B + h32(t)) mod P)."""
    th = F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % ROLL_P,
    )
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_B + x) % ROLL_P,
    )


def sql_rolling_fingerprint(c: str) -> str:
    toks = SQL_TOKENS.format(c=c)
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform({toks}, "
        f"t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % {ROLL_P})), "
        f"(acc, x) -> (acc * {ROLL_B} + x) % {ROLL_P})"
    )


# Marker vocabularies for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "mit", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "pour", "dans"),
    "es": ("el", "los", "las", "es", "para", "por", "una"),
}


def lang_votes(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")
    return out


def lang_id(text: Column) -> Column:
    """argmax over marker votes; ties → first language in sorted order, all
    zero → 'und'. Implemented as array_max over (votes, -rank) structs so
    each vote expression is evaluated once (a chained when() scan doubles
    every subtree per language and overflows codegen)."""
    votes = lang_votes(text)
    langs = sorted(LANG_MARKERS)
    best = F.array_max(
        F.array(
            *[
                F.struct(votes[lang].alias("n"), F.lit(-rank).alias("nr"))
                for rank, lang in enumerate(langs)
            ]
        )
    )
    out = F.when(best["n"] <= 0, F.lit("und"))
    for rank, lang in enumerate(langs):
        out = out.when(best["nr"] == -rank, F.lit(lang))
    return out.otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# DuckDB SQL fragments (oracle forms of the above; kept adjacent so the two
# definitions evolve together)
# ---------------------------------------------------------------------------

SQL_NORMALIZE = "regexp_replace(trim(lower({c})), '\\s+', ' ', 'g')"
SQL_TOKENS = f"string_split({SQL_NORMALIZE}, ' ')"
SQL_TOKEN_COUNT = f"CAST(len({SQL_TOKENS}) AS BIGINT)"
SQL_FINGERPRINT = f"md5({SQL_NORMALIZE})"
SQL_PUNCT_COUNT = "CAST(len(regexp_extract_all({c}, '[.,;:!?]')) AS BIGINT)"


def sql_stopword_count(c: str) -> str:
    toks = SQL_TOKENS.format(c=c)
    inlist = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"CAST(len(list_filter({toks}, t -> t IN ({inlist}))) AS BIGINT)"


def sql_quality_score(c: str) -> str:
    nt = f"CAST({SQL_TOKEN_COUNT.format(c=c)} AS DOUBLE)"
    stop = f"CAST({sql_stopword_count(c)} AS DOUBLE)"
    punct = f"CAST({SQL_PUNCT_COUNT.format(c=c)} AS DOUBLE)"
    ln = f"CAST(length({c}) AS DOUBLE)"
    return (
        f"0.4 * least(1.0, {nt} / 100.0)"
        f" + 0.4 * least(1.0, 4.0 * ({stop} / greatest({nt}, 1.0)))"
        f" + 0.2 * (1.0 - least(1.0, 10.0 * ({punct} / greatest({ln}, 1.0))))"
    )


def sql_lang_id(c: str) -> str:
    toks = SQL_TOKENS.format(c=c)
    expr = "'und'"
    best = "CAST(0 AS BIGINT)"
    # build nested CASE mirroring lang_id's fixed-order strictly-greater scan
    votes = {
        lang: f"CAST(len(list_filter({toks}, t -> t IN ({', '.join(chr(39)+m+chr(39) for m in markers)}))) AS BIGINT)"
        for lang, markers in LANG_MARKERS.items()
    }
    for lang in sorted(LANG_MARKERS):
        v = votes[lang]
        expr = f"CASE WHEN {v} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({v}, {best})"
    return expr


def sql_shingles(c: str, n: int = 3) -> str:
    toks = SQL_TOKENS.format(c=c)
    norm = SQL_NORMALIZE.format(c=c)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        f"ELSE [{norm}] END"
    )
