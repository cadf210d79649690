"""Randomized cross-engine equivalence for the text/vector function layer.

Every oracle in `__spark_entry__.oracle_sql()` rests on the claim that
`functions/text.py`'s Spark expressions and their `SQL_*`/`sql_*` DuckDB
twins compute IDENTICAL values. The driver checks that on its synthetic
corpus; this test checks it on adversarial strings (unicode, empty,
whitespace runs, newlines/tabs, long repeats, punctuation soup, digits)
generated from a seeded RNG — one Spark job and one DuckDB query over the
whole set, compared column by column.
"""

import random
import string

import pandas as pd
import pytest

from pyspark.sql import functions as F

from eventstore_spark.functions import text as X

duckdb = pytest.importorskip("duckdb")

ALPHABETS = [
    string.ascii_lowercase + " ",
    string.ascii_letters + string.digits + " .,;:!?\t\n",
    "the a of to in is  \n\t",                    # stopwords + whitespace runs
    "äöüßéñ中文字 спасибо emoji🙂 ",              # non-ASCII
    ".,;:!?.,;:!?",                               # punctuation soup
    "0123456789-. ",
]


def _random_texts(n=120, seed=20260813):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        ab = rng.choice(ALPHABETS)
        ln = rng.choice([0, 1, 2, 7, 40, 200])
        s = "".join(rng.choice(ab) for _ in range(ln))
        if rng.random() < 0.2:
            s = " " + s + "  "
        if rng.random() < 0.15:
            s = s + " " + s  # force repetition
        out.append((i, s))
    return out


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """The same texts visible to both engines via one parquet file (going
    through parquet, not literals, so string encoding matches the real
    pipeline)."""
    path = str(tmp_path_factory.mktemp("xeng") / "texts.parquet")
    pdf = pd.DataFrame(_random_texts(), columns=["doc_id", "text"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _compare(spark, parquet_path, spark_cols: dict, duck_exprs: dict):
    sdf = (
        spark.read.parquet(parquet_path)
        .select("doc_id", *[c.alias(k) for k, c in spark_cols.items()])
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    sel = ", ".join(f"{e} AS {k}" for k, e in duck_exprs.items())
    con = duckdb.connect()
    odf = (
        con.execute(f"SELECT doc_id, {sel} FROM '{parquet_path}/*.parquet' ORDER BY doc_id")
        .fetchdf()
        .sort_values("doc_id", ignore_index=True)
    )
    for k in spark_cols:
        sv, ov = sdf[k], odf[k]
        for i in range(len(sv)):
            a, b = sv.iloc[i], ov.iloc[i]
            import numpy as np

            if isinstance(a, (list, tuple, np.ndarray)):
                a = list(a)
                b = list(b)
            assert (a == b) or (pd.isna(a) and pd.isna(b)), (
                f"{k} diverges at doc {i}: spark={a!r} duck={b!r}"
            )


def test_token_and_fingerprint_functions_match(spark, corpus):
    c = "text"
    _compare(
        spark, corpus,
        {
            "n_tokens": X.token_count(F.col(c)),
            "fp": X.fingerprint(F.col(c)),
            "n_punct": X.punct_count(F.col(c)),
            "n_stop": X.stopword_count(F.col(c)),
        },
        {
            "n_tokens": X.SQL_TOKEN_COUNT.format(c=c),
            "fp": X.SQL_FINGERPRINT.format(c=c),
            "n_punct": X.SQL_PUNCT_COUNT.format(c=c),
            "n_stop": X.sql_stopword_count(c),
        },
    )


def test_lang_and_quality_match(spark, corpus):
    c = "text"
    _compare(
        spark, corpus,
        {
            "lang": X.lang_id(F.col(c)),
            # quality is a double produced by the pinned operation order
            "quality": X.quality_score(F.col(c)),
        },
        {
            "lang": X.sql_lang_id(c),
            "quality": X.sql_quality_score(c),
        },
    )


def test_bpe_and_rolling_fingerprint_match(spark, corpus):
    c = "text"
    _compare(
        spark, corpus,
        {
            "bpe": X.bpe_token_count(F.col(c)),
            "rh": X.rolling_fingerprint(F.col(c)),
        },
        {
            "bpe": X.sql_bpe_token_count(c),
            "rh": X.sql_rolling_fingerprint(c),
        },
    )
