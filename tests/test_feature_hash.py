"""Feature-hashing vectors, winnowing fingerprints, leakage-safe splits."""

import hashlib

import pytest
from pyspark.sql import functions as F

from eventstore_spark.operators import corpus as cp
from eventstore_spark.operators import dedup as dd
from eventstore_spark.operators import feature_hash as fh


@pytest.fixture(scope="module")
def docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    base = "apple apple banana cherry date egg fig grape hazel iris"
    rows = [
        (1, base, "en", "s", 18),
        (2, base, "en", "s", 18),  # exact dup of 1
        (3, base + " juniper", "en", "s", 25),  # near dup of 1
        (4, "totally unrelated words about columnar storage engines", "en", "s", 54),
        (5, f"prefix words here {shared} suffix tail", "en", "s", 60),
        (6, f"{shared} completely other ending phrase now", "en", "s", 60),  # shares an 8-word run with 5
        (7, "tiny", "en", "s", 4),  # fewer grams than the winnow window
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def _fh(tok, dim=32):
    h = hashlib.md5(f"fh|{tok}".encode()).hexdigest()
    return int(h[:8], 16) % dim, (1 if int(h[8], 16) % 2 == 0 else -1)


def test_feature_hash_vectors_hand_computed(docs):
    rows = fh.feature_hash_vectors(docs.where(F.col("doc_id") == 1)).collect()
    expect = {}
    for tok, c in (("apple", 2), ("banana", 1), ("cherry", 1), ("date", 1),
                   ("egg", 1), ("fig", 1), ("grape", 1), ("hazel", 1),
                   ("iris", 1)):
        idx, s = _fh(tok)
        expect[idx] = expect.get(idx, 0) + s * c
    expect = {i: w for i, w in expect.items() if w != 0}
    assert {r.idx: r.w for r in rows} == expect


def test_feature_hash_identical_docs_identical_vectors(docs):
    hv = fh.feature_hash_vectors(docs)
    v = {}
    for r in hv.collect():
        v.setdefault(r.doc_id, {})[r.idx] = r.w
    assert v[1] == v[2]
    assert v[1] != v[4]


def test_text_neardup_hashed_pairs(docs):
    pairs = {(r.a_id, r.b_id): r for r in fh.text_neardup_hashed(docs).collect()}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # exact duplicates: cosine exactly 1 -> dot^2 == n2_a * n2_b
    assert r.dot * r.dot == r.n2_a * r.n2_b
    assert not any(4 in p for p in pairs)


def test_winnowing_guarantee_shared_run(docs):
    # docs 5 and 6 share an 8-word run; with n=3, win=4 any shared run of
    # win+n-1 = 6 words must produce a common fingerprint hash.
    sel = dd.winnowing_fingerprints(docs, n=3, win=4).collect()
    by_doc = {}
    for r in sel:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[5] & by_doc[6]
    # identical docs fingerprint identically (positions too)
    p1 = sorted((r.pos, r.fp) for r in sel if r.doc_id == 1)
    p2 = sorted((r.pos, r.fp) for r in sel if r.doc_id == 2)
    assert p1 == p2 and p1
    # unrelated doc shares nothing with doc 1
    assert not (by_doc[1] & by_doc[4])


def test_winnowing_short_doc_single_fingerprint(docs):
    sel = [r for r in dd.winnowing_fingerprints(docs, n=3, win=4).collect()
           if r.doc_id == 7]
    assert len(sel) == 1  # fewer grams than the window -> global min only


def test_winnowing_density_bound(docs):
    # winnowing selects at most one fingerprint per window start
    sel = dd.winnowing_fingerprints(docs, n=3, win=4)
    counts = {r.doc_id: r.n for r in
              sel.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    toks = {r.doc_id: r.m for r in docs.select(
        "doc_id", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("m")
    ).collect()}
    for d, c in counts.items():
        grams = max(toks[d] - 2, 1)
        assert c <= max(grams - 4 + 1, 1)


def test_leakage_safe_split_clusters_stay_together(docs):
    out = cp.leakage_safe_split(docs, threshold=0.4).collect()
    by_doc = {r.doc_id: r for r in out}
    assert len(by_doc) == 7  # every doc assigned
    # near-dup cluster {1,2,3} shares one canonical and one split
    assert by_doc[1].canonical_id == by_doc[2].canonical_id == by_doc[3].canonical_id
    assert by_doc[1].split == by_doc[2].split == by_doc[3].split
    for r in out:
        assert r.split in ("train", "val", "test")
        expect = int(hashlib.md5(
            f"split-v1|{r.canonical_id}".encode()).hexdigest()[:8], 16) % 100
        assert r.bucket == expect


def test_leakage_safe_split_pct_bounds(docs):
    out = cp.leakage_safe_split(docs, threshold=0.4, val_pct=0, test_pct=0)
    assert {r.split for r in out.collect()} == {"train"}


def test_bm25_ranks_rare_term_doc_first(spark):
    from eventstore_spark.operators.textops import bm25_search

    rows = [
        (1, "rareword common common common", "en", "s", 30),
        (2, "common common common common common", "en", "s", 35),
        (3, "common other words entirely", "en", "s", 27),
        (4, "unrelated text here", "en", "s", 19),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    top = bm25_search(docs, "rareword common", k=4).collect()
    assert top[0].doc_id == 1  # rare term dominates
    assert [r.rank for r in top] == list(range(1, len(top) + 1))
    assert all(top[i].score_micro >= top[i + 1].score_micro
               for i in range(len(top) - 1))
    assert not any(r.doc_id == 4 for r in top)  # no query term -> absent


def test_bm25_length_normalization(spark):
    from eventstore_spark.operators.textops import bm25_search

    # same tf for the query term; shorter doc must score higher (b > 0)
    rows = [
        (1, "target one two", "en", "s", 10),
        (2, "target one two three four five six seven eight nine", "en", "s", 40),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    top = bm25_search(docs, "target", k=2).collect()
    assert top[0].doc_id == 1 and top[0].score_micro > top[1].score_micro


def test_winnowing_neardup_detects_copied_span(docs):
    from eventstore_spark.operators.dedup import winnowing_neardup

    # the winnowing guarantee is >= 1 shared fingerprint per shared
    # win+n-1-word run, so detect the single copied span at min_shared=1
    pairs = {(r.a, r.b): r.shared
             for r in winnowing_neardup(docs, min_shared=1).collect()}
    assert (1, 2) in pairs          # identical docs share everything
    assert (5, 6) in pairs          # copied 8-word run at different offsets
    assert not any(4 in (a, b) for a, b in pairs)  # unrelated doc stays out
    # identical docs share every fingerprint; the span pair shares fewer
    assert pairs[(1, 2)] > pairs[(5, 6)]
