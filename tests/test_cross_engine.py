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


@pytest.fixture(scope="module")
def vectors(spark, tmp_path_factory):
    """Random float32 embeddings (including near-zero and repeated
    vectors) in one parquet file both engines read."""
    import numpy as np

    rng = random.Random(42)
    rows = []
    for i in range(60):
        if i % 10 == 0:
            v = [0.0] * 8
            v[i % 8] = 1.0
        else:
            v = [round(rng.uniform(-1, 1), 4) for _ in range(8)]
        rows.append((i, [float(x) for x in v]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    path = str(tmp_path_factory.mktemp("xvec") / "emb.parquet")
    spark.createDataFrame(pdf, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    return path


def test_vector_math_matches(spark, vectors):
    from eventstore_spark.functions.vectors import cosine, norm, sql_cosine, sql_norm

    sdf = (
        spark.read.parquet(vectors)
        .withColumn("n", norm(F.col("embedding")))
        .withColumn("c", cosine(F.col("embedding"), F.col("embedding")))
        .select("vec_id", "n", "c")
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    con = duckdb.connect()
    odf = (
        con.execute(
            f"SELECT vec_id, {sql_norm('embedding', 8)} AS n, "
            f"{sql_cosine('embedding', 'embedding', 8)} AS c "
            f"FROM '{vectors}/*.parquet' ORDER BY vec_id"
        )
        .fetchdf()
        .sort_values("vec_id", ignore_index=True)
    )
    for i in range(len(sdf)):
        assert sdf.n.iloc[i] == odf.n.iloc[i], f"norm diverges at {i}"
        a, b = sdf.c.iloc[i], odf.c.iloc[i]
        assert (a == b) or (pd.isna(a) and pd.isna(b)), f"cosine diverges at {i}: {a} vs {b}"


def test_lsh_buckets_match(spark, vectors):
    from eventstore_spark.operators.similarity import _sql_bucket_expr, lsh_bucket

    sdf = (
        spark.read.parquet(vectors)
        .select(
            "vec_id",
            lsh_bucket("embedding", 0, 4, 8).alias("b0"),
            lsh_bucket("embedding", 1, 4, 8).alias("b1"),
        )
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    con = duckdb.connect()
    odf = (
        con.execute(
            f"SELECT vec_id, {_sql_bucket_expr('embedding', 0, 4, 8)} AS b0, "
            f"{_sql_bucket_expr('embedding', 1, 4, 8)} AS b1 "
            f"FROM '{vectors}/*.parquet' ORDER BY vec_id"
        )
        .fetchdf()
        .sort_values("vec_id", ignore_index=True)
    )
    assert list(sdf.b0) == list(odf.b0)
    assert list(sdf.b1) == list(odf.b1)


def test_minhash_pairs_match_end_to_end(spark, corpus):
    """The whole minhash pipeline (shingle → signature → band → bucket
    join → jaccard verify) on the adversarial corpus: Spark pairs ==
    DuckDB pairs exactly."""
    from eventstore_spark.operators.dedup import minhash_lsh_pairs, sql_minhash_pairs

    docs = spark.read.parquet(corpus)
    sdf = minhash_lsh_pairs(docs, threshold=0.3).toPandas()
    spairs = sorted((int(r.a), int(r.b), float(r.jaccard)) for _, r in sdf.iterrows())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus}/*.parquet'")
    odf = con.execute(sql_minhash_pairs(threshold=0.3)).fetchdf()
    opairs = sorted((int(r.a), int(r.b), float(r.jaccard)) for _, r in odf.iterrows())
    assert spairs == opairs
    assert spairs, "corpus produced no near-dup pairs — fixture lost its repeats"


def test_repetition_profile_matches(spark, corpus):
    from eventstore_spark.operators.corpus import (
        repetition_profile,
        sql_repetition_profile,
    )

    docs = spark.read.parquet(corpus)
    sdf = (
        repetition_profile(docs)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus}/*.parquet'")
    odf = (
        con.execute(sql_repetition_profile())
        .fetchdf()
        .sort_values("doc_id", ignore_index=True)
    )
    for c in ("n_tokens", "top_token_frac", "top_bigram_frac",
              "dup_line_frac", "symbol_ratio"):
        for i in range(len(sdf)):
            a, b = sdf[c].iloc[i], odf[c].iloc[i]
            assert (a == b) or (pd.isna(a) and pd.isna(b)), (
                f"{c} diverges at doc {i}: spark={a!r} duck={b!r}"
            )


def test_lm_score_matches(spark, corpus):
    """Unigram LM scoring end-to-end on the adversarial corpus, with a
    small top_v so the OOV floor path is actually exercised: fixed-point
    micronat totals must match DuckDB exactly, including docs made
    entirely of out-of-vocab tokens."""
    from eventstore_spark.operators.textops import lm_score, sql_lm_score

    docs = spark.read.parquet(corpus)
    sdf = (
        lm_score(docs, top_v=20)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus}/*.parquet'")
    odf = (
        con.execute(sql_lm_score(top_v=20))
        .fetchdf()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(sdf) == len(odf) > 0
    for c in ("doc_id", "n_tokens", "lp_micro_total"):
        assert sdf[c].astype("int64").tolist() == odf[c].astype("int64").tolist(), c
    # lm_score is one float division of exact ints — must be bit-identical
    assert sdf["lm_score"].tolist() == odf["lm_score"].tolist()
    # OOV floor really fired (top_v=20 must leave tokens out-of-vocab,
    # else the floor path went untested and this test is vacuous)
    n_vocab = con.execute(
        "SELECT count(DISTINCT tok) FROM (SELECT unnest("
        + X.SQL_TOKENS.format(c="text")
        + ") AS tok FROM documents) WHERE tok <> ''"
    ).fetchone()[0]
    assert n_vocab > 20


def test_tfidf_keywords_match(spark, corpus):
    from eventstore_spark.operators.textops import tfidf_keywords, sql_tfidf_keywords

    docs = spark.read.parquet(corpus)
    key = ["doc_id", "rank"]
    sdf = (
        tfidf_keywords(docs, k=3)
        .toPandas()
        .sort_values(key, ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus}/*.parquet'")
    odf = (
        con.execute(sql_tfidf_keywords(k=3))
        .fetchdf()
        .sort_values(key, ignore_index=True)
    )
    assert len(sdf) == len(odf) > 0
    for c in ("doc_id", "rank", "tf", "tfidf_micro"):
        assert sdf[c].astype("int64").tolist() == odf[c].astype("int64").tolist(), c
    assert sdf["term"].tolist() == odf["term"].tolist()


def test_chunk_documents_matches(spark, corpus):
    """Sliding-window chunking on the adversarial corpus (empty strings,
    single tokens, whitespace runs, unicode): chunk boundaries, tail
    chunks and joined chunk text must match DuckDB exactly."""
    from eventstore_spark.operators.corpus import (
        chunk_documents,
        sql_chunk_documents,
    )

    docs = spark.read.parquet(corpus)
    key = ["doc_id", "chunk_idx"]
    sdf = (
        chunk_documents(docs, chunk_tokens=5, overlap=2)
        .toPandas()
        .sort_values(key, ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus}/*.parquet'")
    odf = (
        con.execute(sql_chunk_documents(chunk_tokens=5, overlap=2))
        .fetchdf()
        .sort_values(key, ignore_index=True)
    )
    assert len(sdf) == len(odf) > 0
    for c in ("doc_id", "chunk_idx", "start_tok", "n_tok"):
        assert sdf[c].astype("int64").tolist() == odf[c].astype("int64").tolist(), c
    assert sdf["chunk_text"].tolist() == odf["chunk_text"].tolist()
    # every doc present, and some doc actually produced multiple chunks
    assert sdf.groupby("doc_id").size().max() > 1


def test_classifier_score_matches(spark, corpus):
    """Hashed-linear inference on the adversarial corpus: exact BIGINT
    logits must match DuckDB on unicode, empty and whitespace-run texts
    (the feature-hash + fold path end to end)."""
    from eventstore_spark.operators.textops import (
        classifier_score,
        sql_classifier_score,
    )

    docs = spark.read.parquet(corpus)
    sdf = classifier_score(docs).toPandas().sort_values("doc_id", ignore_index=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus}/*.parquet'")
    odf = (
        con.execute(sql_classifier_score())
        .fetchdf()
        .sort_values("doc_id", ignore_index=True)
    )
    for c in ("n_features", "logit_micro", "label"):
        for i in range(len(sdf)):
            a, b = sdf[c].iloc[i], odf[c].iloc[i]
            assert a == b, f"{c} diverges at doc {i}: spark={a!r} duck={b!r}"


def test_span_dedup_profile_matches(spark, corpus):
    """Span-duplication counts on the adversarial corpus (short docs,
    repeats, unicode): per-doc window totals must match DuckDB exactly."""
    from eventstore_spark.operators.corpus import (
        span_dedup_profile,
        sql_span_dedup_profile,
    )

    docs = spark.read.parquet(corpus)
    sdf = (
        span_dedup_profile(docs, span_tokens=3, min_copies=2)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{corpus}/*.parquet'")
    odf = (
        con.execute(sql_span_dedup_profile(span_tokens=3, min_copies=2))
        .fetchdf()
        .sort_values("doc_id", ignore_index=True)
    )
    for c in ("n_spans", "n_dup_spans"):
        for i in range(len(sdf)):
            a, b = sdf[c].iloc[i], odf[c].iloc[i]
            assert a == b, f"{c} diverges at doc {i}: spark={a!r} duck={b!r}"
