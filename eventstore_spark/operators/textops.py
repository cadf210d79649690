"""Document-table text-analysis operators (composition of functions/text).

One codegen'd projection pass over the documents table — language ID,
quality scoring, token counting and fingerprinting are all plain column
expressions; nothing leaves the JVM, filters on the results push down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ..schema import spread


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Annotate every document with the full text-quality profile.

    Tokenization (the expensive regex work) runs ONCE into ``_toks``; every
    metric derives from that column, so the whole profile is one projection
    pass instead of re-splitting per metric.
    """
    c = F.col(text_col)
    toks = F.col("_toks")
    sw = F.array(*[F.lit(s) for s in X.STOPWORDS])

    staged = spread(docs).select(
        "doc_id", c.alias("_text"), X.normalize(c).alias("_norm")
    ).withColumn("_toks", F.split(F.col("_norm"), " "))

    nt = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("long")
    n_punct = F.regexp_count(F.col("_text"), F.lit(r"[.,;:!?]")).cast("long")

    # lang votes from the same token array. Argmax via array_max over
    # (votes, -rank) structs: each vote expression is evaluated ONCE — a
    # chained when() scan doubles every vote subtree per language, which
    # blows past codegen limits and falls back to interpreted eval.
    langs = sorted(X.LANG_MARKERS)
    vote_structs = []
    for rank, lang in enumerate(langs):
        arr = F.array(*[F.lit(m) for m in X.LANG_MARKERS[lang]])
        v = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")
        vote_structs.append(F.struct(v.alias("n"), F.lit(-rank).alias("nr")))
    best = F.array_max(F.array(*vote_structs))
    best_lang = F.when(best["n"] <= 0, F.lit("und"))
    for rank, lang in enumerate(langs):
        best_lang = best_lang.when(best["nr"] == -rank, F.lit(lang))
    best_lang = best_lang.otherwise(F.lit("und"))

    ntd = nt.cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(ntd, F.lit(1.0))
    punct_ratio = n_punct.cast("double") / F.greatest(
        F.length(F.col("_text")).cast("double"), F.lit(1.0)
    )
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), ntd / F.lit(100.0))
        + F.lit(0.4) * F.least(F.lit(1.0), F.lit(4.0) * stop_ratio)
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0), F.lit(10.0) * punct_ratio))
    )

    return staged.select(
        "doc_id",
        best_lang.alias("lang_pred"),
        nt.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        quality.alias("quality"),
        F.md5(F.col("_norm")).alias("fp"),
    )


def sql_analyze_documents(table: str = "documents", text_col: str = "text") -> str:
    c = text_col
    return f"""
SELECT doc_id,
       {X.sql_lang_id(c)} AS lang_pred,
       {X.SQL_TOKEN_COUNT.format(c=c)} AS n_tokens,
       {X.sql_stopword_count(c)} AS n_stopwords,
       {X.SQL_PUNCT_COUNT.format(c=c)} AS n_punct,
       {X.sql_quality_score(c)} AS quality,
       {X.SQL_FINGERPRINT.format(c=c)} AS fp
FROM {table}
"""


def quality_filter(docs: DataFrame, min_quality: float = 0.3,
                   min_tokens: int = 10, text_col: str = "text") -> DataFrame:
    """The classic pipeline gate: drop short/low-quality docs."""
    c = F.col(text_col)
    return docs.where(
        (X.quality_score(c) >= min_quality) & (X.token_count(c) >= min_tokens)
    )
