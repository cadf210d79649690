"""Independent-reference property tests for the session-3 operators.

The oracle harness proves Spark and DuckDB AGREE; these prove the shared
formula is the RIGHT one, by recomputing the operator's math in plain
Python (exact ints / math.log) on small random inputs and demanding the
engine reproduce it. A shared bug in both SQL twins cannot hide here.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

corpus_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=10),
        st.booleans(),  # in the training slice?
    ),
    min_size=2, max_size=6,
)


def _kn_reference(rows):
    """Plain-Python KN bigram scorer mirroring textops.kn_perplexity."""
    train = [toks for toks, is_train in rows if is_train]
    c2: dict[tuple, int] = {}
    for toks in train:
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1p: dict[str, int] = {}
    for (a, b), c in c2.items():
        c1[a] = c1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1p[b] = n1p.get(b, 0) + 1
    B = len(c2)
    out = []
    for doc_id, (toks, _) in enumerate(rows):
        n = 0
        s = 0
        for a, b in zip(toks, toks[1:]):
            n += 1
            n1p_eff = max(n1p.get(b, 0), 1)
            if (a, b) in c2:
                num = max(4 * c2[(a, b)] - 3, 0) * B + 3 * n1f[a] * n1p_eff
                den = 4 * B * c1[a]
            elif a in c1:
                num = 3 * n1f[a] * n1p_eff
                den = 4 * B * c1[a]
            else:
                num = n1p_eff
                den = 4 * B
            s += int(round(math.log(num / den) * 1e6))
        mean = -((-s) // n) if n else 0
        out.append((doc_id, n, s, mean))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus_strategy)
def test_kn_perplexity_matches_plain_python_reference(spark, rows):
    from eventstore_spark.operators.textops import kn_perplexity

    # ensure the training slice is non-empty and has at least one bigram
    rows = list(rows)
    rows[0] = (["a", "b", "a"], True)
    data = [
        (i, " ".join(toks), "en", "src0" if is_train else "src1", 0)
        for i, (toks, is_train) in enumerate(rows)
    ]
    docs = spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long")
    got = {
        r.doc_id: (r.n_bigrams, r.sum_lp_micro, r.mean_lp_micro)
        for r in kn_perplexity(docs, train_source="src0").collect()
    }
    for doc_id, n, s, mean in _kn_reference(rows):
        assert got[doc_id] == (n, s, mean), (doc_id, got[doc_id], (n, s, mean))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.integers(-100, 100), min_size=8, max_size=8),
    min_size=3, max_size=10, unique_by=lambda v: tuple(v)))
def test_pq_codebooks_match_plain_python_reference(spark, int_vecs):
    """Exact-integer k-means per subspace, recomputed in plain Python:
    md5-seeded init, L2^2 assignment with ties to the lowest code,
    floor-mean updates, empty codes carried."""
    import hashlib

    from eventstore_spark.operators.similarity import (IVF_SCALE,
                                                       train_pq_codebooks)

    m, k, iters, d = 4, 3, 2, 2
    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = train_pq_codebooks(emb, m=m, k=k, iters=iters)

    # reference: quantize exactly as the engine does (float32 -> double)
    import numpy as np

    qv = {i: [int(math.floor(float(np.float32(x)) * IVF_SCALE)) for x in v]
          for i, v in rows}
    order = sorted(qv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    seeds = order[:k]
    kk = min(k, len(seeds))
    books = [[[qv[s][sub * d + p] for p in range(d)] for s in seeds[:kk]]
             for sub in range(m)]
    for _ in range(iters):
        sums: dict[tuple, list] = {}
        for i in qv:
            for sub in range(m):
                sv = qv[i][sub * d:(sub + 1) * d]
                dists = [
                    (sum((sv[p] - cv[p]) ** 2 for p in range(d)), j)
                    for j, cv in enumerate(books[sub])
                ]
                _, code = min(dists)
                key = (sub, code)
                acc = sums.setdefault(key, [0] * d + [0])
                for p in range(d):
                    acc[p] += sv[p]
                acc[d] += 1
        books = [
            [
                [sums[(sub, j)][p] // sums[(sub, j)][d] for p in range(d)]
                if (sub, j) in sums else books[sub][j]
                for j in range(kk)
            ]
            for sub in range(m)
        ]
    assert got == books


# ---------------------------------------------------------------------------
# Round-10: references for the remaining formula-twinned operators.
# Shared plain-Python mirrors of the engine's token/hash conventions.
# ---------------------------------------------------------------------------

import hashlib


def _py_norm(text: str) -> str:
    return " ".join(text.lower().split())


def _py_tokens(text: str) -> list[str]:
    return _py_norm(text).split(" ")


def _h32(s: str) -> int:
    """conv(substring(md5(s), 1, 8), 16, 10)"""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_shingles(text: str, n: int) -> list[str]:
    toks = _py_tokens(text)
    if len(toks) >= n:
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return [_py_norm(text)]


_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
    min_size=2, max_size=8,
)


def _mkdocs(spark, token_lists, langs=None, sources=None):
    rows = [
        (i, " ".join(toks),
         (langs[i] if langs else "en"),
         (sources[i] if sources else "s"), 0)
        for i, toks in enumerate(token_lists)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_bm25_matches_plain_python_reference(spark, token_lists):
    from eventstore_spark.operators.textops import bm25_search

    k1, b = 1.2, 0.75
    query = "alpha gamma"
    qts = sorted(set(query.split()))
    dls = {i: len(toks) for i, toks in enumerate(token_lists)}
    n_docs = len(token_lists)
    avgdl = sum(dls.values()) / n_docs
    tf = {}  # (doc, term) -> count
    for i, toks in enumerate(token_lists):
        for t in toks:
            if t in qts:
                tf[(i, t)] = tf.get((i, t), 0) + 1
    df = {t: sum(1 for (_, tt) in tf if tt == t) for t in qts}
    idf = {t: int(round(math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                        * 1e6))
           for t in qts if df[t] > 0}
    scores = {}
    for (i, t), f in tf.items():
        term = int(round(idf[t] * (f * (k1 + 1.0))
                         / (f + k1 * (1.0 - b + b * dls[i] / avgdl))))
        scores[i] = scores.get(i, 0) + term
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [(doc, s, r + 1) for r, (doc, s) in enumerate(expected)]

    docs = _mkdocs(spark, token_lists)
    got = [(r.doc_id, r.score_micro, r.rank)
           for r in bm25_search(docs, query, k=100).orderBy("rank").collect()]
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_heavy_hitters_matches_plain_python_reference(spark, token_lists):
    from eventstore_spark.operators.textops import heavy_hitters

    depth, width = 4, 16  # narrow width so collisions actually occur
    counts = {}
    for toks in token_lists:
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    sketch = {}
    buckets = {}
    for t, c in counts.items():
        for r in range(depth):
            b = int(hashlib.md5(f"cm{r}|{t}".encode()).hexdigest()[:15], 16) % width
            buckets[(t, r)] = b
            sketch[(r, b)] = sketch.get((r, b), 0) + c
    expected = sorted(
        ((t, min(sketch[(r, buckets[(t, r)])] for r in range(depth)), c)
         for t, c in counts.items()),
        key=lambda x: (-x[1], x[0]),
    )
    docs = _mkdocs(spark, token_lists)
    got = [(r.token, r.est, r.exact, r.overcount)
           for r in heavy_hitters(docs, depth=depth, width=width, k=100)
           .collect()]
    assert got == [(t, e, c, e - c) for t, e, c in expected]
    for t, e, c in expected:
        assert e >= c  # the CM one-sided-error invariant


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(["AA", "BB", "CC", "DD"]),
                         min_size=1, max_size=5),
                min_size=2, max_size=6))
def test_line_dedup_matches_plain_python_reference(spark, line_lists):
    from eventstore_spark.operators.corpus import line_dedup

    min_docs = 2
    texts = ["\n".join(lines) for lines in line_lists]
    docfreq = {}
    for lines in line_lists:
        for ln in set(lines):
            docfreq[ln] = docfreq.get(ln, 0) + 1
    expected = {}
    for i, lines in enumerate(line_lists):
        keep = [ln for ln in lines if docfreq[ln] < min_docs]
        expected[i] = ("\n".join(keep), len(lines),
                       sum(1 for ln in lines if docfreq[ln] >= min_docs))

    rows = [(i, t, "en", "s", 0) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
           for r in line_dedup(docs, min_docs=min_docs).collect()}
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_winnowing_fingerprints_match_plain_python_reference(spark, token_lists):
    from eventstore_spark.operators.dedup import winnowing_fingerprints

    n, win = 3, 4
    expected = set()
    for i, toks in enumerate(token_lists):
        grams = _py_shingles(" ".join(toks), n)
        m = len(grams)
        keyed = [(int(hashlib.md5(("win|" + g).encode()).hexdigest()[:8], 16),
                  p + 1) for p, g in enumerate(grams)]
        # key = fp * 2^21 - pos: min fp wins, rightmost position on ties
        for j in range(1, max(m - win + 1, 1) + 1):
            window = [(fp * (1 << 21) - pos, pos, fp)
                      for fp, pos in keyed[j - 1:j + win - 1]]
            _, pos, fp = min(window)
            expected.add((i, pos, fp))

    docs = _mkdocs(spark, token_lists)
    got = {(r.doc_id, r.pos, r.fp)
           for r in winnowing_fingerprints(docs, n=n, win=win).collect()}
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_lsh_calibration_matches_plain_python_reference(spark, token_lists):
    from eventstore_spark.operators.dedup import (MINHASH_P, _mh_a, _mh_b,
                                                  lsh_calibration)

    num_hashes, bands, shingle_n = 9, 3, 3
    rows_per_band = num_hashes // bands
    sigs, ssets = {}, {}
    for i, toks in enumerate(token_lists):
        sh = _py_shingles(" ".join(toks), shingle_n)
        hs = [_h32(s) for s in sh]
        sigs[i] = [min((h * _mh_a(j) + _mh_b(j)) % MINHASH_P for h in hs)
                   for j in range(num_hashes)]
        ssets[i] = set(sh)
    cand = set()
    for a in sigs:
        for b in sigs:
            if a < b and any(
                sigs[a][j * rows_per_band:(j + 1) * rows_per_band]
                == sigs[b][j * rows_per_band:(j + 1) * rows_per_band]
                for j in range(bands)
            ):
                cand.add((a, b))
    expected = {}
    for a, b in cand:
        matches = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        inter = len(ssets[a] & ssets[b])
        union = len(ssets[a]) + len(ssets[b]) - inter
        est = (matches * 1_000_000) // num_hashes
        true = (inter * 1_000_000) // union
        expected[(a, b)] = (est, true, est - true)

    docs = _mkdocs(spark, token_lists)
    got = {(r.a, r.b): (r.est_micro, r.true_micro, r.err_micro)
           for r in lsh_calibration(docs, num_hashes, bands, shingle_n)
           .collect()}
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
              st.sampled_from(["en", "de"])),
    min_size=2, max_size=8))
def test_dsir_select_matches_plain_python_reference(spark, rows_in):
    from eventstore_spark.operators.corpus import dsir_select

    buckets, salt, target = 8, "dsir-v1", "de"  # few buckets → collisions
    grams_by_doc = {}
    for i, (toks, _) in enumerate(rows_in):
        ng = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        grams_by_doc[i] = [
            int(hashlib.md5(f"{salt}|{g}".encode()).hexdigest()[:8], 16)
            % buckets for g in ng]
    rc, tc = {}, {}
    for i, (_, lang) in enumerate(rows_in):
        for b in grams_by_doc[i]:
            rc[b] = rc.get(b, 0) + 1
            if lang == target:
                tc[b] = tc.get(b, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    lam = {b: int(round(math.log((tc.get(b, 0) + 1) / (T + buckets)) * 1e6))
           - int(round(math.log((rc[b] + 1) / (R + buckets)) * 1e6))
           for b in rc}
    weights = {i: (len(bs), sum(lam[b] for b in bs))
               for i, bs in grams_by_doc.items()}
    expected = sorted(
        ((i, rows_in[i][1], n, w) for i, (n, w) in weights.items()),
        key=lambda x: (-x[3], x[0]))

    docs = _mkdocs(spark, [t for t, _ in rows_in],
                   langs=[lg for _, lg in rows_in])
    got = [(r.doc_id, r.lang, r.n_ngrams, r.weight_micro)
           for r in dsir_select(docs, target_lang=target, k=100,
                                buckets=buckets, salt=salt).collect()]
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
              st.sampled_from(["en", "de"])),
    min_size=3, max_size=9))
def test_ccnet_buckets_match_plain_python_reference(spark, rows_in):
    from eventstore_spark.operators.corpus import ccnet_buckets

    top_v = 4  # small cap so the OOV floor path is exercised
    all_toks = [t for toks, _ in rows_in for t in toks]
    n_corpus = len(all_toks)
    counts = {}
    for t in all_toks:
        counts[t] = counts.get(t, 0) + 1
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    lp = {t: int(round(math.log(c / n_corpus) * 1e6)) for t, c in vocab}
    floor = int(round(math.log(1.0 / n_corpus) * 1e6))
    lm = {}
    for i, (toks, _) in enumerate(rows_in):
        total = sum(lp.get(t, floor) for t in toks)
        lm[i] = (len(toks), total, total / len(toks) / 1e6)
    ranks = {}
    for lang in {lg for _, lg in rows_in}:
        members = sorted(
            (i for i, (_, lg) in enumerate(rows_in) if lg == lang),
            key=lambda i: (-lm[i][2], i))
        n = len(members)
        for r, i in enumerate(members, start=1):
            bucket = ("head" if 3 * r <= n
                      else "middle" if 3 * r <= 2 * n else "tail")
            ranks[i] = (r, bucket)
    expected = {i: (rows_in[i][1], lm[i][2], ranks[i][0], ranks[i][1])
                for i in lm}

    docs = _mkdocs(spark, [t for t, _ in rows_in],
                   langs=[lg for _, lg in rows_in])
    got = {r.doc_id: (r.lang, r.lm_score, r.lang_rank, r.bucket)
           for r in ccnet_buckets(docs, top_v=top_v).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# Round-10 batch 2: remaining sketch/signature/tokenizer formulas.
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
              st.sampled_from(["s0", "s1"])),
    min_size=2, max_size=8))
def test_kmv_distinct_matches_plain_python_reference(spark, rows_in):
    from eventstore_spark.operators.textops import kmv_distinct

    k = 4  # small so the estimate path (n_sketch == k) is exercised
    SCALE = float(16 ** 15)
    groups: dict[str, set] = {}
    for toks, src in rows_in:
        groups.setdefault(src, set()).update(toks)
    expected = {}
    for g, vocab in groups.items():
        hs = sorted(int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    for t in vocab)
        bottom = hs[:k]
        kth = bottom[-1]
        est = (float(len(bottom)) if len(bottom) < k
               else (k - 1) * SCALE / float(kth))
        expected[g] = (len(bottom), kth, est)

    docs = _mkdocs(spark, [t for t, _ in rows_in],
                   sources=[s for _, s in rows_in])
    got = {r.group: (r.n_sketch, r.kth_hash, r.est_distinct)
           for r in kmv_distinct(docs, k=k).collect()}
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_simhash_signature_matches_plain_python_reference(spark, token_lists):
    from eventstore_spark.operators.dedup import SIMHASH_BITS, simhash_signature

    expected = {}
    for i, toks in enumerate(token_lists):
        votes = [0] * SIMHASH_BITS
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for j in range(SIMHASH_BITS):
                votes[j] += 1 if (h >> j) & 1 else -1
        expected[i] = sum(1 << j for j in range(SIMHASH_BITS) if votes[j] > 0)

    docs = _mkdocs(spark, token_lists)
    got = {r.doc_id: r.simhash for r in simhash_signature(docs).collect()}
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_rolling_fingerprint_matches_plain_python_reference(spark, token_lists):
    from pyspark.sql import functions as F

    from eventstore_spark.functions.text import (ROLL_B, ROLL_P,
                                                 rolling_fingerprint)

    expected = {}
    for i, toks in enumerate(token_lists):
        acc = 0
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % ROLL_P
            acc = (acc * ROLL_B + h) % ROLL_P
        expected[i] = acc

    docs = _mkdocs(spark, token_lists)
    got = {r.doc_id: r.fp
           for r in docs.select("doc_id",
                                rolling_fingerprint(F.col("text")).alias("fp"))
           .collect()}
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_tfidf_keywords_match_plain_python_reference(spark, token_lists):
    from eventstore_spark.operators.textops import tfidf_keywords

    k = 3
    n_docs = len(token_lists)
    tf: dict[tuple, int] = {}
    for i, toks in enumerate(token_lists):
        for t in toks:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df_: dict[str, int] = {}
    for (_, t) in tf:
        df_[t] = df_.get(t, 0) + 1
    idf = {t: int(round(math.log(n_docs / d) * 1e6)) for t, d in df_.items()}
    expected = set()
    for i in range(n_docs):
        scored = sorted(
            ((t, f, f * idf[t]) for (d, t), f in tf.items() if d == i),
            key=lambda x: (-x[2], x[0]))
        for r, (t, f, s) in enumerate(scored[:k], start=1):
            expected.add((i, t, r, f, s))

    docs = _mkdocs(spark, token_lists)
    got = {(r.doc_id, r.term, r.rank, r.tf, r.tfidf_micro)
           for r in tfidf_keywords(docs, k=k).collect()}
    assert got == expected


def _bpe_merge_py(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge — the fold's contract."""
    out, carry = [], ""
    for x in syms:
        if carry == a and x == b:
            out.append(a + b)
            carry = ""
        else:
            if carry:
                out.append(carry)
            carry = x
    if carry:
        out.append(carry)
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.sampled_from(["ab", "aab", "abab", "ba", "b", "aa"]),
             min_size=1, max_size=8),
    min_size=2, max_size=6))
def test_bpe_train_and_apply_match_plain_python_reference(spark, token_lists):
    from eventstore_spark.operators.textops import bpe_apply, bpe_train

    merges = 3
    wc: dict[str, int] = {}
    for toks in token_lists:
        for w in toks:
            wc[w] = wc.get(w, 0) + 1
    syms = {w: list(w) for w in wc}
    table = []
    for step in range(1, merges + 1):
        pairs: dict[str, int] = {}
        for w, ss in syms.items():
            for x, y in zip(ss, ss[1:]):
                pairs[f"{x} {y}"] = pairs.get(f"{x} {y}", 0) + wc[w]
        if not pairs:
            break
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ", 1)
        table.append((step, a, b, a + b, cnt))
        syms = {w: _bpe_merge_py(ss, a, b) for w, ss in syms.items()}

    docs = _mkdocs(spark, token_lists)
    got = [(r.step, r.left_sym, r.right_sym, r.merged, r.n)
           for r in bpe_train(docs, merges=merges).orderBy("step").collect()]
    assert got == table

    # apply with the trained table: per-doc post-merge symbol counts
    expected_counts = {
        i: (len(toks), sum(len(syms[w]) for w in toks))
        for i, toks in enumerate(token_lists)
    }
    app = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_apply(docs, merges=merges).collect()}
    assert app == expected_counts


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    # strictly positive components: a zero vector has no cosine (NaN
    # ordering would make the test flaky, not wrong)
    st.lists(st.integers(1, 100), min_size=6, max_size=6),
    min_size=4, max_size=12, unique_by=lambda v: tuple(v)))
def test_ivf_centroids_match_plain_python_reference(spark, int_vecs):
    """The integer spherical k-means behind ann_ivf / ann_ivfpq /
    kmeans_clusters / semantic_dedup, recomputed in plain Python:
    md5-seeded init, cosine assignment with ties to the lowest cell,
    floor-mean updates, empty cells carried."""
    import numpy as np

    from eventstore_spark.operators.similarity import (IVF_SCALE,
                                                       train_ivf_centroids)

    k, iters = 3, 2
    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = train_ivf_centroids(emb, n_centroids=k, iters=iters)

    qv = {i: [int(math.floor(float(np.float32(x)) * IVF_SCALE)) for x in v]
          for i, v in rows}
    order = sorted(qv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [list(qv[s]) for s in order[:k]]
    dim = len(cents[0])

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(float(sum(x * x for x in a)))
        nb = math.sqrt(float(sum(x * x for x in b)))
        return float(dot) / (na * nb)

    for _ in range(iters):
        sums: dict[int, list] = {}
        for i, v in qv.items():
            # argmax cosine, ties -> lowest cell (max over (sim, -cell))
            _, ncell = max((cos(v, c), -j) for j, c in enumerate(cents))
            acc = sums.setdefault(-ncell, [0] * dim + [0])
            for p in range(dim):
                acc[p] += v[p]
            acc[dim] += 1
        cents = [
            [sums[j][p] // sums[j][dim] for p in range(dim)]
            if j in sums else cents[j]
            for j in range(k)
        ]
    assert got == cents


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.integers(1, 100), min_size=4, max_size=4),
    min_size=6, max_size=10, unique_by=lambda v: tuple(v)))
def test_ivfpq_matches_plain_python_reference(spark, int_vecs):
    """Full IVFADC recomputation: integer centroids (reference above),
    residual PQ codebooks, codes, and per-(query, probed-cell) LUT
    scoring restricted to nprobe cells — composition-level pin on top of
    the component references."""
    import numpy as np

    from eventstore_spark.operators.similarity import IVF_SCALE, ivfpq_topk

    n_centroids, nprobe, m, n_codes, iters, k = 2, 1, 2, 2, 1, 3
    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query_ids = [0, 1]
    got = {(r.query_id, r.vec_id): (r.rank, r.adist)
           for r in ivfpq_topk(emb, query_ids, k=k, n_centroids=n_centroids,
                               nprobe=nprobe, m=m, n_codes=n_codes,
                               iters=iters).collect()}

    # --- plain-Python re-derivation ---
    qv = {i: [int(math.floor(float(np.float32(x)) * IVF_SCALE)) for x in v]
          for i, v in rows}
    dim = 4
    d = dim // m

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return float(dot) / (math.sqrt(float(sum(x * x for x in a)))
                             * math.sqrt(float(sum(x * x for x in b))))

    order = sorted(qv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [list(qv[s]) for s in order[:n_centroids]]
    for _ in range(iters):
        sums = {}
        for i, v in qv.items():
            _, nc = max((cos(v, c), -j) for j, c in enumerate(cents))
            acc = sums.setdefault(-nc, [0] * dim + [0])
            for p in range(dim):
                acc[p] += v[p]
            acc[dim] += 1
        cents = [[sums[j][p] // sums[j][dim] for p in range(dim)]
                 if j in sums else cents[j] for j in range(n_centroids)]
    cell = {i: -max((cos(v, c), -j) for j, c in enumerate(cents))[1]
            for i, v in qv.items()}
    resid = {i: [qv[i][p] - cents[cell[i]][p] for p in range(dim)] for i in qv}

    # residual PQ: md5-seeded, exact L2², floor-mean (k-means per subspace)
    seeds = order[:n_codes]
    books = [[[resid[s][sub * d + p] for p in range(d)] for s in seeds]
             for sub in range(m)]
    for _ in range(iters):
        sums = {}
        for i in resid:
            for sub in range(m):
                sv = resid[i][sub * d:(sub + 1) * d]
                _, code = min((sum((sv[p] - cv[p]) ** 2 for p in range(d)), j)
                              for j, cv in enumerate(books[sub]))
                acc = sums.setdefault((sub, code), [0] * d + [0])
                for p in range(d):
                    acc[p] += sv[p]
                acc[d] += 1
        books = [[[sums[(sub, j)][p] // sums[(sub, j)][d] for p in range(d)]
                  if (sub, j) in sums else books[sub][j]
                  for j in range(n_codes)] for sub in range(m)]
    codes = {}
    for i in resid:
        codes[i] = [
            min((sum((resid[i][sub * d + p] - cv[p]) ** 2 for p in range(d)), j)
                for j, cv in enumerate(books[sub]))[1]
            for sub in range(m)
        ]

    expected = {}
    for q in query_ids:
        probed = sorted(range(len(cents)),
                        key=lambda j: (-cos(qv[q], cents[j]), j))[:nprobe]
        cand = []
        for c in probed:
            qres = [qv[q][p] - cents[c][p] for p in range(dim)]
            for i in qv:
                if i == q or cell[i] != c:
                    continue
                adist = sum(
                    sum((qres[sub * d + p] - books[sub][codes[i][sub]][p]) ** 2
                        for p in range(d))
                    for sub in range(m))
                cand.append((adist, i))
        for rank, (adist, i) in enumerate(sorted(cand)[:k], start=1):
            expected[(q, i)] = (rank, adist)
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.sampled_from(["s0", "s1", "s2"]), min_size=3, max_size=20))
def test_source_temperature_sample_matches_plain_python_reference(spark, sources):
    """q_s ∝ p_s^α acceptance rates and the salted-md5 coin, recomputed
    in plain Python — and the XLM-R property itself: with α < 1 the
    SMALLEST source's acceptance rate is the largest."""
    from eventstore_spark.operators.corpus import source_temperature_sample

    alpha, salt = 0.5, "tsample-v1"
    n = {}
    for s in sources:
        n[s] = n.get(s, 0) + 1
    N = len(sources)
    w = {s: math.exp(alpha * math.log(c / N)) for s, c in n.items()}
    Z = sum(w.values())
    p_micro = {s: int(round(min(1.0, (w[s] / Z) * N / n[s]) * 1e6))
               for s in n}
    expected = {}
    for i, s in enumerate(sources):
        u = int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], 16) % 1_000_000
        expected[i] = (s, n[s], p_micro[s], u, u < p_micro[s])

    docs = _mkdocs(spark, [["w"] for _ in sources], sources=sources)
    got = {r.doc_id: (r.source, r.n_source, r.p_micro, r.u, r.kept)
           for r in source_temperature_sample(docs, alpha=alpha).collect()}
    assert got == expected
    if len(n) > 1:
        smallest = min(n, key=lambda s: (n[s], s))
        assert p_micro[smallest] == max(p_micro.values())


# ---------------------------------------------------------------------------
# r10 session-2 operators
# ---------------------------------------------------------------------------

def _rhu(v: float) -> int:
    """HALF_UP round to int, away from zero — Spark's round(double) and
    DuckDB's round() agree with this on every non-.5-boundary input."""
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=25))
def test_pagerank_matches_plain_python_reference(spark, raw_edges):
    """Fixed-point integer PageRank recomputed in plain Python: distinct
    edges minus self-loops, base//n init, (r*85)//(100*out) contribs,
    teleport + inflow, two rounds."""
    from eventstore_spark.operators.graph import pagerank

    base, dp, iters = 1_000_000_000, 85, 2
    edges = sorted({(a, b) for a, b in raw_edges if a != b})
    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in raw_edges] or [("x", "x")],
        "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=iters).collect()}

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    if not nodes:
        assert got == {}
        return
    n = len(nodes)
    out: dict[int, int] = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    tele = (base * (100 - dp) // 100) // n
    r = {u: base // n for u in nodes}
    for _ in range(iters):
        inflow: dict[int, int] = {}
        for a, b in edges:
            inflow[b] = inflow.get(b, 0) + (r[a] * dp) // (100 * out[a])
        r = {u: tele + inflow.get(u, 0) for u in nodes}
    assert got == {f"n{u}": v for u, v in r.items()}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_sequence_pack_matches_plain_python_reference(spark, token_lists):
    """Concat-and-chunk placement recomputed in plain Python: md5 shard
    assignment, (hash, doc_id) order, exact cumulative offsets and
    block-span arithmetic."""
    from eventstore_spark.operators.corpus import sequence_pack

    ctx, shards, seed = 16, 4, "pack-v1"
    docs = _mkdocs(spark, token_lists)
    got = {
        r.doc_id: (r.shard, r.position, r.n_tokens, r.tok_start,
                   r.first_block, r.last_block, r.n_blocks)
        for r in sequence_pack(docs, ctx_tokens=ctx, num_shards=shards,
                               seed=seed).collect()
    }

    rows = []
    for i, toks in enumerate(token_lists):
        h = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:12], 16)
        rows.append((h % shards, h, i, len(_py_tokens(" ".join(toks)))))
    expect = {}
    for shard in range(shards):
        in_shard = sorted([x for x in rows if x[0] == shard],
                          key=lambda x: (x[1], x[2]))
        start = 0
        for pos, (sh, h, i, nt) in enumerate(in_shard, start=1):
            first_b = start // ctx
            last_b = (start + max(nt, 1) - 1) // ctx
            expect[i] = (sh, pos, nt, start, first_b, last_b,
                         last_b - first_b + 1)
            start += nt
    assert got == expect


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_zipf_fit_matches_plain_python_reference(spark, token_lists):
    """Log-log OLS recomputed in plain Python: micro-quantized ln(rank)/
    ln(count), exact integer regression sums, final double divisions."""
    from eventstore_spark.operators.textops import zipf_fit

    top_r = 10
    docs = _mkdocs(spark, token_lists)
    row = zipf_fit(docs, top_r=top_r).collect()[0]

    counts: dict[str, int] = {}
    for toks in token_lists:
        for t in _py_tokens(" ".join(toks)):
            if t:
                counts[t] = counts.get(t, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_r]
    pts = [(_rhu(math.log(rank) * 1e6), _rhu(math.log(nc) * 1e6))
           for rank, (_, nc) in enumerate(top, start=1)]
    R = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num = float(R * sxy - sx * sy)
    den = float(R * sxx - sx * sx)
    syy_d = float(R * syy - sy * sy)
    assert row.n_terms == R
    if den == 0:
        assert row.slope_micro is None and row.intercept_micro is None
        assert row.r2_micro is None
        return
    slope = num / den
    assert row.slope_micro == _rhu(slope * 1e6)
    assert row.intercept_micro == _rhu((float(sy) - slope * float(sx)) / R)
    if syy_d == 0:
        assert row.r2_micro is None
    else:
        assert row.r2_micro == _rhu(num * num / (den * syy_d) * 1e6)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 6),
              st.lists(st.sampled_from(_WORDS), min_size=0, max_size=3)),
    min_size=1, max_size=6))
def test_extract_links_matches_python_re(spark, specs):
    """Anchor extraction vs plain-Python re.findall of the same pattern
    on the same synthesized markup."""
    import re

    from eventstore_spark.operators.textops import _LINK_PATTERN, extract_links

    pages = []
    for i, (pid, hid, anchor_words) in enumerate(specs):
        anchor = " ".join(anchor_words)
        html = (
            f'<p>before</p><a rel="x" href="https://h{hid}.example/p/{pid}">'
            f"{anchor}</a><div>mid</div>"
            f'<a href="/local/{pid}">second {i}</a>'
        )
        pages.append((i, html))
    docs = spark.createDataFrame(pages, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.link_no, r.href, r.anchor)
        for r in extract_links(docs).collect()
    )
    expect = []
    for i, html in pages:
        for j, m in enumerate(re.finditer(_LINK_PATTERN, html), start=1):
            expect.append((i, j, m.group(1), m.group(2)))
    assert got == sorted(expect)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.integers(1, 100), min_size=4, max_size=4),
    min_size=4, max_size=10, unique_by=lambda v: tuple(v)))
def test_ndcg_eval_is_perfect_when_ivf_has_one_cell(spark, int_vecs):
    """With a single IVF cell the approximate candidate set IS the exact
    corpus, so every sampled query must score ndcg_ppm == 1e6 exactly
    and hit all of its truth — any weight-table or floor-division bug in
    the DCG/IDCG arithmetic breaks the equality."""
    from eventstore_spark.operators.similarity import ndcg_eval

    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    rows = ndcg_eval(emb, k=3, sample_mod=2, n_centroids=1, iters=1).collect()
    assert rows, "sample gate should catch at least one query"
    for r in rows:
        assert r.n_hits == r.n_truth
        assert r.ndcg_ppm == 1_000_000, r


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.integers(1, 100), min_size=4, max_size=4),
    min_size=6, max_size=10, unique_by=lambda v: tuple(v)))
def test_ndcg_eval_matches_plain_python_reference(spark, int_vecs):
    """Full independent NDCG recomputation: integer IVF centroids (the
    test_ivf_centroids reference), cosine cell assignment, md5 sample
    gate, double-fold cosine rankings for truth and the probed cell,
    literal micro-weight DCG/IDCG."""
    import numpy as np

    from eventstore_spark.operators.similarity import (IVF_SCALE,
                                                       _ndcg_weights,
                                                       ndcg_eval)

    k, mod, ncent, iters = 3, 2, 2, 1
    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = {
        r.query_id: (r.n_truth, r.n_hits, r.ndcg_ppm)
        for r in ndcg_eval(emb, k=k, sample_mod=mod, n_centroids=ncent,
                           iters=iters).collect()
    }

    # -- trained integer centroids (same reference as the IVF test) --
    qv = {i: [int(math.floor(float(np.float32(x)) * IVF_SCALE)) for x in v]
          for i, v in enumerate(vecs)}
    order = sorted(qv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [list(qv[s]) for s in order[:ncent]]
    dim = 4

    def icos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(float(sum(x * x for x in a)))
        nb = math.sqrt(float(sum(x * x for x in b)))
        return float(dot) / (na * nb)

    for _ in range(iters):
        sums: dict[int, list] = {}
        for i, v in qv.items():
            _, ncell = max((icos(v, c), -j) for j, c in enumerate(cents))
            acc = sums.setdefault(-ncell, [0] * dim + [0])
            for p in range(dim):
                acc[p] += v[p]
            acc[dim] += 1
        cents = [
            [sums[j][p] // sums[j][dim] for p in range(dim)]
            if j in sums else cents[j]
            for j in range(ncent)
        ]
    cell = {}
    for i, v in qv.items():
        _, nc = max((icos(v, c), -j) for j, c in enumerate(cents))
        cell[i] = -nc

    # -- float cosine exactly as the engine folds it (left-to-right) --
    fv = {i: [float(np.float32(x)) for x in v] for i, v in enumerate(vecs)}

    def fcos(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        na = 0.0
        nb = 0.0
        for x in a:
            na = na + x * x
        for y in b:
            nb = nb + y * y
        return acc / (math.sqrt(na) * math.sqrt(nb))

    w_lits, p_lits = _ndcg_weights(k)
    expect = {}
    for qid in fv:
        if int(hashlib.md5(str(qid).encode()).hexdigest()[:15], 16) % mod != 0:
            continue
        scored = sorted(
            ((-fcos(fv[qid], fv[c]), c) for c in fv if c != qid))
        truth = [c for _, c in scored[:k]]
        in_cell = sorted(
            ((-fcos(fv[qid], fv[c]), c) for c in fv
             if c != qid and cell[c] == cell[qid]))
        approx = [c for _, c in in_cell[:k]]
        dcg = sum(w_lits[r] for r, c in enumerate(approx) if c in truth)
        n_hits = sum(1 for c in approx if c in truth)
        idcg = p_lits[len(truth) - 1] if truth else 0
        ppm = (dcg * 1_000_000) // idcg if idcg else 0
        expect[qid] = (len(truth), n_hits, ppm)
    assert got == expect


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_lexical_profile_matches_plain_python_reference(spark, token_lists):
    """TTR / hapax / token entropy recomputed in plain Python: per-run
    micro-quantized n·ln n, exact integer combination — the engine's
    sorted-array fold and the oracle's groupBy must both equal this."""
    from eventstore_spark.operators.textops import lexical_profile

    docs = _mkdocs(spark, token_lists)
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_micro,
                   r.hapax_micro, r.entropy_micro)
        for r in lexical_profile(docs).collect()
    }
    for i, toks in enumerate(token_lists):
        tl = [t for t in _py_tokens(" ".join(toks)) if t]
        n = len(tl)
        counts: dict[str, int] = {}
        for t in tl:
            counts[t] = counts.get(t, 0) + 1
        types = len(counts)
        hapax = sum(1 for c in counts.values() if c == 1)
        b = sum(_rhu(c * math.log(c) * 1e6) for c in counts.values() if c > 1)
        if n == 0:
            expect = (0, 0, 0, None, None, None)
        else:
            expect = (n, types, hapax, (types * 1_000_000) // n,
                      (hapax * 1_000_000) // n,
                      _rhu(math.log(n) * 1e6) - b // n)
        assert got[i] == expect, (i, got[i], expect)


int_vec_strategy = st.lists(
    st.lists(st.integers(min_value=-8, max_value=8), min_size=4, max_size=4)
    .filter(lambda v: any(x != 0 for x in v)),
    min_size=3, max_size=8,
)


def _py_cosine(a: list[int], b: list[int]) -> float:
    # the exact left folds of functions/vectors.py (double, fixed order)
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        na = na + float(x) * float(x)
    nb = 0.0
    for y in b:
        nb = nb + float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy, int_vec_strategy)
def test_hybrid_rrf_matches_plain_python_reference(spark, token_lists, vecs):
    """Recomputes BOTH input rankings and the RRF fold in plain Python
    (exact ints for the fusion; the cosine side replays the fixed-order
    double fold), so a shared-formula bug in the Spark/DuckDB twins
    cannot hide: the two-engine oracle checks engine parity, this checks
    the math."""
    from eventstore_spark.operators.similarity import hybrid_rrf

    n = min(len(token_lists), len(vecs))
    token_lists, vecs = token_lists[:n], vecs[:n]
    if n < 2:
        return
    k1, b, query, query_id, n_each, k0 = 1.2, 0.75, "alpha gamma", 0, 3, 60

    # -- lexical side: the BM25 reference fold (micro-int scores) --
    qts = sorted(set(query.split()))
    dls = {i: len(toks) for i, toks in enumerate(token_lists)}
    avgdl = sum(dls.values()) / n
    tf = {}
    for i, toks in enumerate(token_lists):
        for t in toks:
            if t in qts:
                tf[(i, t)] = tf.get((i, t), 0) + 1
    dfreq = {t: sum(1 for (_, tt) in tf if tt == t) for t in qts}
    idf = {t: int(round(math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0) * 1e6))
           for t in qts if dfreq[t] > 0}
    scores = {}
    for (i, t), f in tf.items():
        scores[i] = scores.get(i, 0) + int(round(
            idf[t] * (f * (k1 + 1.0))
            / (f + k1 * (1.0 - b + b * dls[i] / avgdl))))
    lex_ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:n_each]
    lex_rank = {doc: r + 1 for r, (doc, _) in enumerate(lex_ranked)}

    # -- dense side: exact cosine top-n_each, self excluded --
    sims = [(i, _py_cosine(vecs[query_id], v))
            for i, v in enumerate(vecs) if i != query_id]
    sims.sort(key=lambda kv: (-kv[1], kv[0]))
    dense_rank = {doc: r + 1 for r, (doc, _) in enumerate(sims[:n_each])}

    # -- the fusion: exact BIGINT floor division --
    fused = {}
    for doc, r in lex_rank.items():
        fused[doc] = fused.get(doc, 0) + 1_000_000 // (k0 + r)
    for doc, r in dense_rank.items():
        fused[doc] = fused.get(doc, 0) + 1_000_000 // (k0 + r)
    order = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [(doc, s, lex_rank.get(doc, 0), dense_rank.get(doc, 0), r + 1)
                for r, (doc, s) in enumerate(order)]

    docs = _mkdocs(spark, token_lists)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int")
    got = [(r.doc_id, r.rrf_micro, r.lex_rank, r.dense_rank, r.rank)
           for r in hybrid_rrf(docs, emb, query, query_id,
                               k=100, n_each=n_each, k0=k0)
           .orderBy("rank").collect()]
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(
        st.lists(st.sampled_from(_WORDS + ["the", "and", "#", "..."]),
                 min_size=1, max_size=30),
        st.sampled_from([".", "", "?", " {"]),
    ),
    min_size=2, max_size=8,
))
def test_quality_ensemble_matches_plain_python_reference(spark, specs):
    """Recomputes every Gopher/C4 rule and the failed-rules array in
    plain Python. The per-filter formulas have two-engine oracles; this
    pins the ENSEMBLE's rule thresholds and array assembly against an
    independent implementation."""
    from eventstore_spark.operators.textops import GOPHER_STOPS, quality_ensemble

    mn_w, mn_stop, mn_lw, mn_sent = 5, 1, 3, 2
    texts = [" ".join(toks) + tail for toks, tail in specs]

    expected = {}
    for i, text in enumerate(texts):
        toks = text.strip().split()
        toks = toks if toks else [""]  # split of "" yields one empty token
        n_words = len(toks)
        mean_len = sum(len(t) for t in toks) / max(n_words, 1)
        import re as _re
        sym = len(_re.findall(r"[#…]|\.\.\.", text))
        symbol_ratio = sym / max(n_words, 1)
        alpha = sum(1 for t in toks if _re.search("[A-Za-z]", t)) / max(n_words, 1)
        n_stops = sum(1 for t in toks if t.lower() in GOPHER_STOPS)
        lines = [l for l in text.split("\n") if l.strip() != ""]
        kept_lines = sum(
            1 for l in lines
            if _re.search(r'[.!?"]\s*$', l) and len(l.strip().split()) >= mn_lw
            and "javascript" not in l.lower())
        n_sent = len(_re.findall(r"[.!?]", text))
        failed = []
        if "{" in text:
            failed.append("c4_brace")
        if kept_lines < 1:
            failed.append("c4_lines")
        if "lorem ipsum" in text.lower():
            failed.append("c4_lorem")
        if n_sent < mn_sent:
            failed.append("c4_sentences")
        if alpha < 0.8:
            failed.append("gopher_alpha")
        if n_stops < mn_stop:
            failed.append("gopher_stops")
        if symbol_ratio > 0.1:
            failed.append("gopher_symbols")
        if mean_len < 3.0 or mean_len > 10.0:
            failed.append("gopher_word_len")
        if n_words < mn_w or n_words > 100_000:
            failed.append("gopher_words")
        expected[i] = (tuple(failed), len(failed),
                       not any(f.startswith("gopher") for f in failed),
                       not any(f.startswith("c4") for f in failed),
                       not failed)

    docs = spark.createDataFrame(
        [(i, t, "en", "s", 0) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.doc_id: (tuple(r.failed), r.n_failed, r.gopher_kept,
                      r.c4_kept, r.kept)
           for r in quality_ensemble(
               docs, min_words=mn_w, min_stops=mn_stop,
               min_line_words=mn_lw, min_sentences=mn_sent).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=25))
def test_hits_matches_plain_python_reference(spark, raw_edges):
    """Fixed-point integer HITS recomputed in plain Python: distinct
    edges minus self-loops, hub=base init, per half-round raw sums and
    (raw*base)//Σraw L1 rescale (exact big-int — Python ints ARE the
    DECIMAL(38,0) semantics), two rounds."""
    from eventstore_spark.operators.graph import hits

    base, iters = 1_000_000, 2
    edges = sorted({(a, b) for a, b in raw_edges if a != b})
    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in raw_edges] or [("x", "x")],
        "src string, dst string")
    got = {r.node: (r.hub, r.auth)
           for r in hits(df, iterations=iters).collect()}

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    if not nodes:
        assert got == {}
        return

    def half(scores, forward):
        raw: dict[int, int] = {}
        for a, b in edges:
            src_node, dst_node = (a, b) if forward else (b, a)
            raw[dst_node] = raw.get(dst_node, 0) + scores[src_node]
        s = sum(raw.values())
        return {u: (raw[u] * base) // s if u in raw and s > 0 else 0
                for u in nodes}

    hub = {u: base for u in nodes}
    auth = None
    for _ in range(iters):
        auth = half(hub, True)
        hub = half(auth, False)
    assert got == {f"n{u}": (hub[u], auth[u]) for u in nodes}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_pmi_collocations_match_plain_python_reference(spark, token_lists):
    """PMI recomputed in plain Python with the same per-count micro-ln
    quantization and exact integer combination."""
    from eventstore_spark.operators.textops import pmi_collocations

    min_count = 2

    def lm(v: int) -> int:
        return _rhu(math.log(float(v)) * 1e6)

    uni: dict[str, int] = {}
    pc: dict[tuple[str, str], int] = {}
    for toks in token_lists:
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    T, B = sum(uni.values()), sum(pc.values())
    expected = sorted(
        ((w1, w2, n,
          lm(n) + 2 * lm(T) - lm(B) - lm(uni[w1]) - lm(uni[w2]))
         for (w1, w2), n in pc.items() if n >= min_count),
        key=lambda r: (-r[3], r[0], r[1]))[:100]

    docs = _mkdocs(spark, token_lists)
    got = [(r.w1, r.w2, r.n_pair, r.pmi_micro)
           for r in pmi_collocations(docs, k=100, min_count=min_count)
           .collect()]
    assert got == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 2), st.sampled_from(["user", "assistant", "system"]),
              st.text(alphabet="ab α\n", min_size=0, max_size=12)),
    min_size=1, max_size=12,
))
def test_chat_sft_spans_reconstruct_the_rendered_conversation(spark, raw_turns):
    """Property: rendering each conversation in plain Python with the
    <|role|>content\\n template, every turn's [content_start,
    content_end) slice must give back exactly its content, and `loss`
    must mark assistant turns. Offsets are CHARACTER offsets (α counts
    as 1), matching Spark's length() semantics."""
    from eventstore_spark.operators.corpus import chat_sft_spans

    turns = [(f"c{c}", i, role, content)
             for i, (c, role, content) in enumerate(raw_turns)]
    df = spark.createDataFrame(
        turns, "conv_id string, turn_no long, role string, content string")
    got = chat_sft_spans(df).collect()

    convs: dict[str, str] = {}
    by_turn = {}
    for conv_id, turn_no, role, content in sorted(turns, key=lambda t: (t[0], t[1])):
        piece = f"<|{role}|>{content}\n"
        start = len(convs.get(conv_id, ""))
        convs[conv_id] = convs.get(conv_id, "") + piece
        by_turn[(conv_id, turn_no)] = (start, piece, content, role)

    assert len(got) == len(turns)
    for r in got:
        start, piece, content, role = by_turn[(r.conv_id, r.turn_no)]
        assert r.piece_len == len(piece)
        assert convs[r.conv_id][r.content_start:r.content_end] == content
        assert r.loss == (role == "assistant")


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=14),
    min_size=2, max_size=8,
))
def test_span_dedup_apply_matches_plain_python_reference(spark, token_lists):
    """ExactSubstr removal recomputed in plain Python: duplicated
    L-token windows, keeper = lexicographic min (doc_id, pos), covered
    positions cut, text rebuilt. Tiny alphabet so duplicated windows
    actually occur."""
    from eventstore_spark.operators.corpus import span_dedup_apply

    L, min_copies = 3, 2
    occ: dict[tuple, list] = {}
    for d, toks in enumerate(token_lists):
        for p in range(len(toks) - L + 1):
            occ.setdefault(tuple(toks[p:p + L]), []).append((d, p + 1))
    expected = {}
    covered: dict[int, set] = {}
    for gram, places in occ.items():
        if len(places) >= min_copies:
            keeper = min(places)
            for d, p in places:
                if (d, p) != keeper:
                    covered.setdefault(d, set()).update(range(p, p + L))
    for d, toks in enumerate(token_lists):
        cov = covered.get(d, set())
        clean = " ".join(t for i, t in enumerate(toks, start=1) if i not in cov)
        expected[d] = (len(toks), len(cov), clean)

    docs = _mkdocs(spark, token_lists)
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
           for r in span_dedup_apply(docs, span_tokens=L,
                                     min_copies=min_copies).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(int_vec_strategy)
def test_scalar_quantize_matches_plain_python_reference(spark, vecs):
    """SQ recomputed in plain Python: per-dim min/max, clamp/floor
    codes, fixed-order double error fold — codes exact, err_micro
    exact."""
    from eventstore_spark.operators.similarity import scalar_quantize

    bits, L = 4, 16  # coarse so rounding actually bites
    dim = len(vecs[0])
    mins = [min(float(v[d]) for v in vecs) for d in range(dim)]
    maxs = [max(float(v[d]) for v in vecs) for d in range(dim)]
    rng = [maxs[d] - mins[d] for d in range(dim)]
    expected = {}
    for i, v in enumerate(vecs):
        codes = []
        for d in range(dim):
            if rng[d] > 0.0:
                c = int(math.floor((float(v[d]) - mins[d]) * L / rng[d]))
                codes.append(max(0, min(L - 1, c)))
            else:
                codes.append(0)
        err = 0.0
        for d in range(dim):
            dq = mins[d] + ((codes[d] + 0.5) * rng[d] / L if rng[d] > 0.0 else 0.0)
            diff = float(v[d]) - dq
            err = err + diff * diff
        expected[i] = (tuple(codes), _rhu(err * 1e6))

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: (tuple(r.codes), r.err_micro)
           for r in scalar_quantize(emb, bits=bits).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_containment_pairs_match_plain_python_reference(spark, token_lists):
    """Containment recomputed in plain Python over the same shingle
    sets: inter·1e6//|X| floor division, unordered pairs, both-side
    gates."""
    from eventstore_spark.operators.dedup import containment_pairs

    n_sh, thr_micro, min_sh = 2, 500_000, 2
    ssets = {i: set(_py_shingles(" ".join(toks), n_sh))
             for i, toks in enumerate(token_lists)}
    expected = {}
    ids = sorted(ssets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if len(ssets[a]) < min_sh or len(ssets[b]) < min_sh:
                continue
            inter = len(ssets[a] & ssets[b])
            if inter == 0:
                continue
            ca = inter * 1_000_000 // len(ssets[a])
            cb = inter * 1_000_000 // len(ssets[b])
            if max(ca, cb) >= thr_micro:
                expected[(a, b)] = (inter, ca, cb)

    docs = _mkdocs(spark, token_lists)
    got = {(r.a, r.b): (r.inter, r.cont_a_micro, r.cont_b_micro)
           for r in containment_pairs(docs, shingle_n=n_sh, threshold=0.5,
                                      min_shingles=min_sh,
                                      warn_df_above=None).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
def test_exact_quantiles_match_plain_python_reference(spark, values):
    """Exact percentiles recomputed in plain Python: sort, pick rank
    (q·N+99)//100 (1-based). Small bucket count so multiple values land
    per bin and the two-phase rank actually exercises bin offsets."""
    from eventstore_spark.operators.stats import exact_quantiles

    qs = (1, 25, 50, 75, 99, 100)
    s = sorted(float(x) for x in values)
    n = len(s)
    expected = {q: s[max(1, (q * n + 99) // 100) - 1] for q in qs}

    df = spark.createDataFrame([(float(x),) for x in values], "x double")
    got = {r.q_pct: r.value
           for r in exact_quantiles(df, "x", qs=qs, buckets=7).collect()}
    assert got == expected


def test_offsets_exact_under_sentinel_outlier(spark):
    """A Long.MAX sentinel among ordinary values must not disturb the
    exact answers of the offsets/quantiles family (the r13 quantile-
    bounded bins put it in the overflow bucket alone; correctness is
    binning-independent either way — this pins it)."""
    from eventstore_spark.operators.stats import (exact_quantiles,
                                                  percentile_rank)

    vals = list(range(1, 200)) + [(1 << 63) - 1]
    s = sorted(vals)
    n = len(s)
    qs = (1, 50, 99, 100)
    df = spark.createDataFrame(
        [(i, "t", "en", "s", v) for i, v in enumerate(vals)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got_q = {r.q_pct: r.value
             for r in exact_quantiles(df, "n_chars", qs=qs).collect()}
    assert got_q == {q: float(s[(q * n + 99) // 100 - 1]) for q in qs}

    order = sorted((v, i) for i, v in enumerate(vals))
    expected = {i: pos for pos, (v, i) in enumerate(order, start=1)}
    got_r = {r.doc_id: r.rank
             for r in percentile_rank(df, "n_chars").collect()}
    assert got_r == expected


def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# mixed vocabulary including non-ASCII tokens to exercise the projection
_EDIT_WORDS = _WORDS + ["café", "naïve", "日本", "a~z"]

edit_docs_strategy = st.lists(
    st.lists(st.sampled_from(_EDIT_WORDS), min_size=1, max_size=12),
    min_size=2, max_size=8,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edit_docs_strategy)
def test_edit_verify_pairs_matches_plain_python_reference(spark, token_lists):
    """Full-pipeline reference: minhash sigs -> banding -> candidates ->
    ASCII-projected prefix levenshtein, all recomputed in plain Python."""
    from eventstore_spark.operators.dedup import (MINHASH_P, _mh_a, _mh_b,
                                                  edit_verify_pairs)

    num_hashes, bands, shingle_n, prefix = 9, 3, 3, 256
    rows_per_band = num_hashes // bands
    sigs = {}
    for i, toks in enumerate(token_lists):
        hs = [_h32(s) for s in _py_shingles(" ".join(toks), shingle_n)]
        sigs[i] = [min((h * _mh_a(j) + _mh_b(j)) % MINHASH_P for h in hs)
                   for j in range(num_hashes)]
    bh = {
        i: [hashlib.md5("|".join(
            str(x) for x in sigs[i][j * rows_per_band:(j + 1) * rows_per_band]
        ).encode()).hexdigest() for j in range(bands)]
        for i in sigs
    }
    proj = {
        i: "".join(ch if " " <= ch <= "~" else "?"
                   for ch in _py_norm(" ".join(toks)))[:prefix]
        for i, toks in enumerate(token_lists)
    }
    expected = set()
    for a in sigs:
        for b in sigs:
            if a < b and any(bh[a][j] == bh[b][j] for j in range(bands)):
                d = _py_lev(proj[a], proj[b])
                m = max(len(proj[a]), len(proj[b]))
                sim = 1_000_000 if m == 0 else ((m - d) * 1_000_000) // m
                expected.add((a, b, d, sim))

    docs = _mkdocs(spark, token_lists)
    got = {(r.a, r.b, r.dist, r.sim_ppm)
           for r in edit_verify_pairs(docs, prefix_chars=prefix,
                                      min_sim_ppm=0).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_bloom_dedup_matches_plain_python_reference(spark, token_lists):
    """m_bits=64 forces real false positives; the reference recomputes
    fingerprints, bit positions, filter membership and the exact verdict
    in plain Python. Also pins the no-false-negative law."""
    from eventstore_spark.operators.dedup import bloom_dedup_incremental

    split_mod, m_bits, k = 3, 64, 4

    def fp_of(toks):
        return hashlib.md5(_py_norm(" ".join(toks)).encode()).hexdigest()

    def positions(fp):
        return [int(hashlib.md5(f"bf{j}|{fp}".encode()).hexdigest()[:8], 16)
                % m_bits for j in range(k)]

    hist_fps = {fp_of(t) for i, t in enumerate(token_lists)
                if i % split_mod != 0}
    filt = {p for fp in hist_fps for p in positions(fp)}
    expected = {}
    for i, t in enumerate(token_lists):
        if i % split_mod != 0:
            continue
        fp = fp_of(t)
        maybe = all(p in filt for p in positions(fp))
        expected[i] = (maybe, fp in hist_fps if maybe else False)

    docs = _mkdocs(spark, token_lists)
    got = {r.doc_id: (r.maybe_dup, r.is_dup)
           for r in bloom_dedup_incremental(
               docs, split_mod=split_mod, m_bits=m_bits, k=k).collect()}
    assert got == expected
    for maybe, is_dup in got.values():
        assert maybe or not is_dup  # is_dup implies maybe_dup


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs_strategy)
def test_token_overlap_eval_matches_plain_python_reference(spark, token_lists):
    """Multiset token-F1 and ROUGE-2 recall recomputed in plain Python
    (collections.Counter), exact floor-micro arithmetic."""
    from collections import Counter

    from eventstore_spark.operators.textops import token_overlap_eval

    expected = {}
    by_id = {i: toks for i, toks in enumerate(token_lists)}
    for cid in by_id:
        if cid % 2 != 0 or cid + 1 not in by_id:
            continue
        c, r = by_id[cid], by_id[cid + 1]
        ov = sum((Counter(c) & Counter(r)).values())
        cb = [f"{a} {b}" for a, b in zip(c, c[1:])]
        rb = [f"{a} {b}" for a, b in zip(r, r[1:])]
        ov2 = sum((Counter(cb) & Counter(rb)).values())
        nc, nr = len(c), len(r)
        expected[cid] = (
            ov,
            nc, nr,
            0 if nc == 0 else ov * 1_000_000 // nc,
            0 if nr == 0 else ov * 1_000_000 // nr,
            0 if nc + nr == 0 else 2 * ov * 1_000_000 // (nc + nr),
            0 if nr < 2 else ov2 * 1_000_000 // (nr - 1),
        )

    docs = _mkdocs(spark, token_lists)
    got = {r.cand_id: (r.overlap, r.n_cand, r.n_ref, r.p_ppm, r.r_ppm,
                       r.f1_ppm, r.rouge2_r_ppm)
           for r in token_overlap_eval(docs).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.integers(-100, 100), min_size=8, max_size=8),
    min_size=2, max_size=10))
def test_pca_power_matches_plain_python_reference(spark, int_vecs):
    """Quantize -> floor-mean center -> 3 power rounds (DECIMAL row sums,
    L-inf rescale by floor division) -> projection, all recomputed in
    exact plain-Python integers."""
    import numpy as np

    from eventstore_spark.operators.similarity import (IVF_SCALE,
                                                       pca_power_scores)

    dim, base, iters = 8, 1_000_000, 3
    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    qv = {i: [int(math.floor(float(np.float32(x)) * IVF_SCALE)) for x in v]
          for i, v in rows}
    n = len(qv)
    c = [sum(qv[i][d] for i in qv) // n for d in range(dim)]
    y = {i: [qv[i][d] - c[d] for d in range(dim)] for i in qv}
    v = [base] * dim
    for _ in range(iters):
        w = [0] * dim
        for i in y:
            s = sum(y[i][d] * v[d] for d in range(dim))
            for d in range(dim):
                w[d] += y[i][d] * s
        L = max(abs(x) for x in w)
        if L == 0:
            break
        v = [(w[d] * base) // L for d in range(dim)]
    expected = {i: sum(y[i][d] * v[d] for d in range(dim)) for i in y}

    got = {r.vec_id: r.pc1
           for r in pca_power_scores(emb, iterations=iters, base=base,
                                     dim=dim).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.sampled_from(["g0", "g1", "g2"]), st.integers(0, 20)),
    min_size=2, max_size=30))
def test_ks_drift_matches_plain_python_reference(spark, rows):
    """Two-sample KS recomputed definitionally: ECDFs evaluated at every
    observed step point, exact integer cross-products."""
    from eventstore_spark.operators.stats import ks_drift

    groups = {}
    for g, x in rows:
        groups.setdefault(g, []).append(x)
    expected = {}
    names = sorted(groups)
    for ai in range(len(names)):
        for bi in range(ai + 1, len(names)):
            ga, gb = names[ai], names[bi]
            va, vb = sorted(groups[ga]), sorted(groups[gb])
            na, nb = len(va), len(vb)
            xs = sorted(set(va) | set(vb))
            best = 0
            for x in xs:
                ca = sum(1 for v in va if v <= x)
                cb = sum(1 for v in vb if v <= x)
                best = max(best, abs(ca * nb - cb * na))
            expected[(ga, gb)] = (na, nb, best * 1_000_000 // (na * nb))

    df = spark.createDataFrame(
        [(i, "t", g, "s", x) for i, (g, x) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {(r.g_a, r.g_b): (r.n_a, r.n_b, r.ks_ppm)
           for r in ks_drift(df, group_col="lang",
                             value_col="n_chars").collect()}
    assert got == expected


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.lists(st.sampled_from(["ab", "aab", "abab", "ba", "b", "aa"]),
                 min_size=1, max_size=8)),
    min_size=2, max_size=6))
def test_tokenizer_fertility_matches_plain_python_reference(spark, rows):
    """Same plain-Python BPE trainer/applier as the bpe test, aggregated
    per language with exact floor-micro ratios."""
    from eventstore_spark.operators.textops import tokenizer_fertility

    merges = 3
    wc: dict[str, int] = {}
    for _, toks in rows:
        for w in toks:
            wc[w] = wc.get(w, 0) + 1
    syms = {w: list(w) for w in wc}
    for _ in range(merges):
        pairs: dict[str, int] = {}
        for w, ss in syms.items():
            for x, y in zip(ss, ss[1:]):
                pairs[f"{x} {y}"] = pairs.get(f"{x} {y}", 0) + wc[w]
        if not pairs:
            break
        pair, _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ", 1)
        syms = {w: _bpe_merge_py(ss, a, b) for w, ss in syms.items()}

    agg: dict[str, list[int]] = {}
    for lang, toks in rows:
        g = agg.setdefault(lang, [0, 0, 0, 0])
        g[0] += 1
        g[1] += len(toks)
        g[2] += sum(len(w) for w in toks)
        g[3] += sum(len(syms[w]) for w in toks)
    expected = {
        lang: (d, w, ch, tk,
               0 if w == 0 else tk * 1_000_000 // w,
               0 if tk == 0 else ch * 1_000_000 // tk)
        for lang, (d, w, ch, tk) in agg.items()
    }

    docs = _mkdocs(spark, [toks for _, toks in rows],
                   langs=[lang for lang, _ in rows])
    got = {r.lang: (r.n_docs, r.n_words, r.n_chars, r.n_bpe_tokens,
                    r.fertility_ppm, r.chars_per_tok_ppm)
           for r in tokenizer_fertility(docs, merges=merges).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(1, 500), min_size=1, max_size=40), st.integers(1, 10))
def test_weighted_sample_matches_plain_python_reference(spark, weights, k):
    """A-ES keys recomputed in plain Python: md5-uniform, quantized ln,
    non-negative integer floor-division, k smallest with id tie-break."""
    from eventstore_spark.operators.corpus import weighted_sample

    salt = "aes-v1"
    keyed = []
    for i, w in enumerate(weights):
        h = int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        lnm = _rhu(math.log(u) * 1e6)
        keyed.append((((-lnm) * 1_000_000) // w, i, w))
    expected = [(i, w, key) for key, i, w in sorted(keyed)[:k]]

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", w) for i, w in enumerate(weights)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = [(r.doc_id, r.weight, r.key)
           for r in weighted_sample(docs, k=k).collect()]
    assert got == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.integers(-100, 100), min_size=8, max_size=8),
    min_size=1, max_size=10))
def test_rp_project_matches_plain_python_reference(spark, int_vecs):
    """Sparse Achlioptas JL projection recomputed in plain Python:
    md5-mod-6 sign matrix over the floor-quantized components. Also pins
    that the projection is linear (proj of 2x == 2*proj of x up to
    quantization of the inputs)."""
    import numpy as np

    from eventstore_spark.operators.similarity import (IVF_SCALE,
                                                       rp_project, _rp_signs)

    dim, d_out = 8, 4
    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    signs = [_rp_signs(j, dim) for j in range(d_out)]
    qv = {i: [int(math.floor(float(np.float32(x)) * IVF_SCALE)) for x in v]
          for i, v in rows}
    expected = {
        i: tuple(sum(signs[j][d] * qv[i][d] for d in range(dim))
                 for j in range(d_out))
        for i in qv
    }
    got = {r.vec_id: tuple(r.proj)
           for r in rp_project(emb, d_out=d_out, dim=dim).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.integers(-100, 100), min_size=8, max_size=8),
    min_size=1, max_size=12))
def test_kcenter_select_matches_plain_python_reference(spark, int_vecs):
    """Farthest-first traversal recomputed in plain Python: lowest-id
    seed, exact integer L2^2, argmax with lowest-id tie-break, stop on
    md=0; assignment tie-breaks on lowest center id."""
    import numpy as np

    from eventstore_spark.operators.similarity import (IVF_SCALE,
                                                       kcenter_select)

    dim, k = 8, 3
    vecs = [[x / 100.0 for x in v] for v in int_vecs]
    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    qv = {i: [int(math.floor(float(np.float32(x)) * IVF_SCALE)) for x in v]
          for i, v in rows}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [(0, qv[0])]
    for _ in range(k - 1):
        best = max(((min(d2(qv[i], c) for _, c in chosen), -i), i)
                   for i in qv)
        (md, _), vid = best
        if md == 0:
            break
        chosen.append((vid, qv[vid]))
    expected = {}
    for i in qv:
        d, cid = min((d2(qv[i], c), cid) for cid, c in chosen)
        expected[i] = (cid, d)

    got = {r.vec_id: (r.center_id, r.d2)
           for r in kcenter_select(emb, k=k, dim=dim).collect()}
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(-5, 5), st.booleans()),
                min_size=1, max_size=40))
def test_auc_eval_matches_plain_python_reference(spark, rows):
    """Tie-corrected Mann-Whitney AUC recomputed definitionally: every
    (pos, neg) pair scored 2/1/0 for above/tied/below, exact floor
    micro."""
    from eventstore_spark.operators.stats import auc_eval

    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    if pos and neg:
        u2 = sum(2 if p > n else (1 if p == n else 0)
                 for p in pos for n in neg)
        exp_auc = (u2 * 1_000_000) // (2 * len(pos) * len(neg))
    else:
        exp_auc = None

    df = spark.createDataFrame(rows, "s long, y boolean")
    r = auc_eval(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert r.auc_ppm == exp_auc


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 5), min_size=1, max_size=30),
       st.integers(2, 5))
def test_rate_anomaly_matches_plain_python_reference(spark, perhour, trailing):
    """Trailing-mean deviation recomputed definitionally over a dense
    hour sequence with per-hour event counts (hours with 0 events do
    not exist as rows — the trailing frame skips them)."""
    import datetime

    from eventstore_spark.operators.stats import rate_anomaly

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, cnt in enumerate(perhour):
        for _ in range(cnt):
            rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=7)))
            eid += 1
    if not rows:
        return
    observed = [(h, c) for h, c in enumerate(perhour) if c > 0]
    expected = {}
    for i, (h, n) in enumerate(observed):
        window = observed[max(0, i - trailing):i]
        s = sum(c for _, c in window)
        m = len(window)
        dev = None if s == 0 else abs(n * m - s) * 1_000_000 // s
        flag = bool(dev is not None and dev >= 500_000 and m == trailing)
        expected[t0 + datetime.timedelta(hours=h)] = (n, s, m, dev, flag)

    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r.hour: (r.n, r.trailing_n, r.trailing_hours, r.dev_ppm,
                    r.is_anomaly)
           for r in rate_anomaly(df, trailing=trailing).collect()}
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from("abc"), st.sampled_from("abd")),
                min_size=1, max_size=40))
def test_classification_prf_matches_plain_python_reference(spark, pairs):
    """Per-class P/R/F1 recomputed definitionally from raw pair counts,
    exact floor-micro, classes = union of gold and pred."""
    from eventstore_spark.operators.stats import classification_prf

    labels = {g for g, _ in pairs} | {p for _, p in pairs}
    expected = {}
    for lab in labels:
        tp = sum(1 for g, p in pairs if g == lab and p == lab)
        gn = sum(1 for g, _ in pairs if g == lab)
        pn = sum(1 for _, p in pairs if p == lab)
        expected[lab] = (
            gn, pn, tp,
            0 if pn == 0 else tp * 1_000_000 // pn,
            0 if gn == 0 else tp * 1_000_000 // gn,
            0 if gn + pn == 0 else 2 * tp * 1_000_000 // (gn + pn),
        )

    df = spark.createDataFrame(pairs, "gold string, pred string")
    got = {r.label: (r.gold_n, r.pred_n, r.tp, r.precision_ppm,
                     r.recall_ppm, r.f1_ppm)
           for r in classification_prf(df).collect()}
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 6), min_size=1, max_size=30))
def test_percentile_rank_matches_plain_python_reference(spark, values):
    """Total (value, id) rank and floor-micro percentile recomputed by a
    plain sort."""
    from eventstore_spark.operators.stats import percentile_rank

    order = sorted((v, i) for i, v in enumerate(values))
    n = len(values)
    expected = {}
    for pos, (v, i) in enumerate(order, start=1):
        pct = 0 if n <= 1 else (pos - 1) * 1_000_000 // (n - 1)
        expected[i] = (v, pos, pct)

    df = spark.createDataFrame(
        [(i, "t", "en", "s", v) for i, v in enumerate(values)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.doc_id: (r.value, r.rank, r.pct_ppm)
           for r in percentile_rank(df, "n_chars").collect()}
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 50), min_size=1, max_size=30))
def test_mad_outliers_matches_plain_python_reference(spark, values):
    """Lower-median MAD fence recomputed by plain sorts, including the
    mad=0 degenerate case."""
    from eventstore_spark.operators.stats import mad_outliers

    n = len(values)
    rk = (50 * n + 99) // 100
    med = sorted(values)[rk - 1]
    devs = [abs(v - med) for v in values]
    mad = sorted(devs)[rk - 1]
    expected = {i: (v, abs(v - med), abs(v - med) * 1_000_000 > 3_000_000 * mad)
                for i, v in enumerate(values)}

    df = spark.createDataFrame(
        [(i, "t", "en", "s", v) for i, v in enumerate(values)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.doc_id: (r.value, r.dev, r.is_outlier)
           for r in mad_outliers(df, "n_chars", buckets=7).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from(["en", "de"]), st.integers(1, 300)),
                min_size=1, max_size=40), st.integers(1, 5))
def test_group_weighted_sample_matches_plain_python_reference(spark, rows, k):
    """Per-group A-ES selection recomputed in plain Python: same keys as
    weighted_sample, ranked within each group."""
    from eventstore_spark.operators.corpus import group_weighted_sample

    salt = "aes-v1"
    per_group: dict[str, list] = {}
    for i, (g, w) in enumerate(rows):
        h = int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], 16)
        lnm = _rhu(math.log((h + 1) / 4294967296.0) * 1e6)
        per_group.setdefault(g, []).append(
            (((-lnm) * 1_000_000) // w, i, w))
    expected = {}
    for g, items in per_group.items():
        for rk, (key, i, w) in enumerate(sorted(items)[:k], start=1):
            expected[i] = (g, w, key, rk)

    docs = spark.createDataFrame(
        [(i, "t", g, "s", w) for i, (g, w) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.doc_id: (r.grp, r.weight, r.key, r.rk)
           for r in group_weighted_sample(docs, k=k).collect()}
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.sampled_from(["s0", "s1", "s2", "s3"]),
                min_size=1, max_size=40))
def test_concentration_report_matches_plain_python_reference(spark, groups):
    """HHI and Gini recomputed definitionally from sorted group counts,
    exact floor-micro; uniform counts give gini 0, single group gives
    hhi 1e6."""
    from collections import Counter

    from eventstore_spark.operators.stats import concentration_report

    cnt = Counter(groups)
    ns = [n for _, n in sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))]
    G, N = len(ns), sum(ns)
    hhi = sum(n * n for n in ns) * 1_000_000 // (N * N)
    gini = ((2 * sum(i * n for i, n in enumerate(ns, 1)) - (G + 1) * N)
            * 1_000_000 // (G * N))

    df = spark.createDataFrame(
        [(i, "t", "en", g, 1) for i, g in enumerate(groups)],
        "doc_id long, text string, lang string, source string, n_chars long")
    r = concentration_report(df, "source").collect()[0]
    assert (r.n_groups, r.n_rows, r.hhi_ppm, r.gini_ppm) == (G, N, hhi, gini)


def test_asof_join_matches_plain_python_reference(spark):
    """as-of join recomputed definitionally: for each probe row, linear
    scan for the max reference ts <= probe ts per key (inclusive ties,
    NULL when nothing precedes) — merge_asof backward semantics."""
    from eventstore_spark.operators.temporal import asof_join

    probe_rows = [  # (key, ts, pid)
        (1, 10, 100), (1, 20, 101), (1, 20, 102), (1, 5, 103),
        (2, 7, 200), (2, 50, 201),
        (3, 3, 300),                       # key with no reference at all
    ]
    ref_rows = [    # (key, ts, val)
        (1, 10, "a"), (1, 15, "b"), (1, 19, "c"),
        (2, 7, "x"), (2, 8, "y"),
    ]
    probe = spark.createDataFrame(probe_rows, "k long, ts long, pid long")
    ref = spark.createDataFrame(ref_rows, "k long, ts long, val string")
    got = {r.pid: (r.ts_ref, r.val_ref)
           for r in asof_join(probe, ref, ["k"], "ts", "ts", ["val"]).collect()}

    want = {}
    for k, pts, pid in probe_rows:
        best = None
        for rk, rts, val in ref_rows:
            if rk == k and rts <= pts and (best is None or rts > best[0]):
                best = (rts, val)
        want[pid] = best if best else (None, None)
    assert got == want
    # spot checks: inclusive tie (pid 100 -> ts 10), latest-below
    # (pid 101/102 -> ts 19), nothing-precedes NULL (pid 103, 300)
    assert got[100] == (10, "a")
    assert got[101] == (19, "c")
    assert got[103] == (None, None)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(-20, 120)),
             min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 2), st.integers(-20, 120),
                       st.integers(0, 9)),
             min_size=0, max_size=25),
    st.sampled_from([1, 3, 7, 50, 1000]),
    st.sampled_from(["backward", "forward"]),
)
def test_asof_join_salted_equals_unsalted(spark, probe_rows, ref_rows,
                                          sl, direction):
    """The time-slice-salted two-phase form must return EXACTLY the
    unsalted union-window's rows for any data, slice width, and
    direction — including negative timestamps (floor slicing), keys
    whose match is many slices back, and keys with no reference at all
    (VERDICT r12 task #4)."""
    from eventstore_spark.operators.temporal import asof_join

    # unique (key, ts) on the reference side — the documented contract
    ref_rows = list({(k, t): (k, t, v) for k, t, v in ref_rows}.values())
    probe = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(probe_rows)],
        "k long, ts long, pid long")
    ref = spark.createDataFrame(ref_rows, "k long, ts long, v long")
    base = {r.pid: (r.ts_ref, r.v_ref)
            for r in asof_join(probe, ref, ["k"], "ts", "ts", ["v"],
                               direction=direction).collect()}
    salted = {r.pid: (r.ts_ref, r.v_ref)
              for r in asof_join(probe, ref, ["k"], "ts", "ts", ["v"],
                                 direction=direction, slice=sl).collect()}
    assert salted == base


def test_interval_join_matches_plain_python_reference(spark):
    """interval join recomputed definitionally: nested loop over
    (point, interval) with lo <= ts < hi — including multi-match points,
    zero-match points (absent), and bin-boundary edges."""
    from eventstore_spark.operators.temporal import interval_join

    pts = [(1, 0), (2, 5), (3, 10), (4, 15), (5, 99)]       # (pid, ts)
    ivs = [(10, 0, 10), (11, 5, 15), (12, 10, 11), (13, 40, 50)]  # (iid, lo, hi)
    points = spark.createDataFrame(pts, "pid long, ts long")
    intervals = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    for bw in (1, 3, 10, 100):
        got = {(r.pid, r.iid)
               for r in interval_join(points, intervals, [], "ts",
                                      "lo", "hi", bin_width=bw).collect()}
        want = {(pid, iid) for pid, ts in pts
                for iid, lo, hi in ivs if lo <= ts < hi}
        assert got == want, f"bin_width={bw}: {got} != {want}"
    # heuristic bin width (max interval length) agrees too
    got = {(r.pid, r.iid)
           for r in interval_join(points, intervals, [], "ts",
                                  "lo", "hi").collect()}
    assert got == want


def test_interval_join_drops_malformed_intervals_before_explode(spark):
    """hi <= lo intervals (empty or inverted) must cost NOTHING: Spark's
    sequence(lo_bin, hi_bin) steps backward when hi_bin < lo_bin, so an
    unguarded inverted interval silently explodes into |hi_bin − lo_bin|
    bins the range filter then discards (ADVICE r11). The guard filters
    them pre-explode; results match the definitional semantics (such an
    interval contains no point)."""
    from eventstore_spark.operators.temporal import interval_join

    pts = [(1, 5), (2, 500_000)]
    # one good interval, one empty (hi == lo), one wildly inverted —
    # unguarded, the inverted one alone would explode to ~1M bins at
    # bin_width=1
    ivs = [(10, 0, 10), (11, 5, 5), (12, 1_000_000, 0)]
    points = spark.createDataFrame(pts, "pid long, ts long")
    intervals = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    df = interval_join(points, intervals, [], "ts", "lo", "hi",
                       bin_width=1)
    assert {(r.pid, r.iid) for r in df.collect()} == {(1, 10)}
    # and the guard is in the PLAN as an intervals-side filter BEFORE
    # the generate (explode), not a post-hoc range filter
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"\(hi#\d+L? > lo#\d+L?\)", plan)
    assert m, plan
    assert plan.index("Generate explode") < m.start(), plan


def test_calibration_curve_matches_plain_python_reference(spark):
    """Reliability bins recomputed definitionally: clamp to [0, bins-1],
    exact integer-div mean score and positive rate per bin — including
    out-of-range scores (clamped into end bins) and a bin with one row."""
    from eventstore_spark.operators.stats import calibration_curve

    rows = [(-50_000, True), (0, False), (120_000, True), (155_000, False),
            (999_999, True), (1_000_000, True), (2_000_000, False),
            (500_000, True)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    got = {r.bin: (r.n, r.mean_score_ppm, r.pos_ppm)
           for r in calibration_curve(df, "s", "y", bins=10).collect()}

    from collections import defaultdict
    byb = defaultdict(list)
    for s, y in rows:
        byb[max(0, min(9, s * 10 // 1_000_000))].append((s, y))
    want = {b: (len(v), sum(s for s, _ in v) // len(v),
                sum(1 for _, y in v if y) * 1_000_000 // len(v))
            for b, v in byb.items()}
    assert got == want


def test_pr_curve_matches_plain_python_reference(spark):
    """P/R sweep recomputed definitionally: thresholds at ranks
    (q·N+99)//100 of the ascending order, predicted-positive = s >= t,
    integer-div ppm ratios — including tied scores and a 100% threshold."""
    from eventstore_spark.operators.stats import pr_curve

    rows = [(i * 7 % 50, i % 3 == 0) for i in range(60)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    got = {(r.q_pct, r.threshold): (r.n_pred, r.tp, r.precision_ppm,
                                    r.recall_ppm)
           for r in pr_curve(df, "s", "y", points=4).collect()}

    svals = sorted(s for s, _ in rows)
    n, p = len(rows), sum(1 for _, y in rows if y)
    want = {}
    for q in (25, 50, 75, 100):
        t = svals[(q * n + 99) // 100 - 1]
        pred = [(s, y) for s, y in rows if s >= t]
        tp = sum(1 for _, y in pred if y)
        want[(q, t)] = (len(pred), tp,
                        tp * 1_000_000 // len(pred),
                        tp * 1_000_000 // p)
    assert got == want


def test_pr_curve_exact_beyond_double_precision(spark):
    """Thresholds are picked in pure BIGINT (ADVICE r12): scores past
    2^53 — where a DOUBLE round-trip collapses adjacent values — must
    still produce one output row per quantile with the exact threshold
    value, not silently drop rows on a mismatched equi-join."""
    from eventstore_spark.operators.stats import pr_curve

    base = 1 << 60
    # adjacent BIGINTs at 2^60: double rounds them to the same value
    rows = [(base + i, i % 2 == 0) for i in range(8)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    got = {r.q_pct: (r.threshold, r.n_pred, r.tp)
           for r in pr_curve(df, "s", "y", points=4).collect()}

    svals = sorted(s for s, _ in rows)
    n, want = len(rows), {}
    for q in (25, 50, 75, 100):
        t = svals[(q * n + 99) // 100 - 1]
        pred = [(s, y) for s, y in rows if s >= t]
        want[q] = (t, len(pred), sum(1 for _, y in pred if y))
    assert got == want


def test_resample_empty_reference_default_bounds(spark):
    """Empty reference with defaulted start/end returns the empty
    result (the family's empty-input contract), not int(None)
    (ADVICE r12)."""
    from eventstore_spark.operators.temporal import resample

    ref = spark.createDataFrame([], "k string, ts long, v double")
    out = resample(ref, ["k"], "ts", ["v"], step=5)
    assert out.count() == 0
    assert set(out.columns) == {"k", "grid_ts", "ts_ref", "v_ref"}


def test_winsorize_matches_plain_python_reference(spark):
    """Winsorization recomputed definitionally: bounds at ranks
    (p·N+99)//100, clamp, NULLs pass through as NULL."""
    from eventstore_spark.operators.stats import winsorize

    vals = [float(v) for v in
            [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 1000, -500]]
    rows = [(i, v) for i, v in enumerate(vals)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars double")
    got = {r.doc_id: r.winsorized
           for r in winsorize(df, "n_chars", p_lo=10, p_hi=90).collect()}

    sv = sorted(vals)
    n = len(sv)
    qlo = sv[(10 * n + 99) // 100 - 1]
    qhi = sv[(90 * n + 99) // 100 - 1]
    for i, v in enumerate(vals):
        assert got[i] == min(max(v, qlo), qhi), (i, v, qlo, qhi)
    assert got[99] is None


def test_overlap_join_matches_plain_python_reference(spark):
    """interval×interval overlap recomputed definitionally: nested loop
    with a.lo < b.hi AND b.lo < a.hi (half-open) — including touching
    intervals (NO overlap), containment, identical intervals, and
    multi-shared-bin pairs that must survive exactly ONCE."""
    from eventstore_spark.operators.temporal import overlap_join

    lv = [(1, 0, 10), (2, 5, 15), (3, 20, 21), (4, 0, 100)]  # (lid, lo, hi)
    rv = [(10, 9, 12), (11, 15, 20), (12, 21, 30), (13, 0, 100),
          (14, 50, 50), (15, 60, 40)]                        # (rid, lo, hi)
    left = spark.createDataFrame(lv, "lid long, lo long, hi long")
    right = spark.createDataFrame(rv, "rid long, lo long, hi long")
    want = {(lid, rid) for lid, llo, lhi in lv
            for rid, rlo, rhi in rv
            if lhi > llo and rhi > rlo and llo < rhi and rlo < lhi}
    for bw in (1, 3, 10, 1000):
        rows = overlap_join(left, right, [], "lo", "hi", "lo", "hi",
                            bin_width=bw).collect()
        got = [(r.lid, r.rid) for r in rows]
        assert sorted(got) == sorted(want), f"bin_width={bw}"
        assert len(got) == len(set(got)), f"bin_width={bw}: duplicates"
    # heuristic bin width agrees
    got = {(r.lid, r.rid)
           for r in overlap_join(left, right, [], "lo", "hi",
                                 "lo", "hi").collect()}
    assert got == want


def test_overlap_join_keyed_matches_plain_python_reference(spark):
    """Keyed overlap: pairs must also share the key."""
    from eventstore_spark.operators.temporal import overlap_join

    lv = [("a", 1, 0, 10), ("b", 2, 0, 10)]
    rv = [("a", 10, 5, 6), ("b", 11, 20, 30)]
    left = spark.createDataFrame(lv, "k string, lid long, lo long, hi long")
    right = spark.createDataFrame(rv, "k string, rid long, lo long, hi long")
    got = {(r.k, r.lid, r.rid)
           for r in overlap_join(left, right, ["k"], "lo", "hi",
                                 "lo", "hi", bin_width=4).collect()}
    assert got == {("a", 1, 10)}


def test_default_bin_width_bounds_outlier_fanout(spark):
    """The default bin width is ~p99 of the interval lengths (VERDICT
    r12 task #3): ONE year-long outlier among 3-hour windows must keep
    the default at the 3-hour scale — the outlier explodes across
    ~length/p99 bins and costs itself, instead of a max-length default
    widening EVERY point's bin to a year. Results are bin-width
    independent (pinned against an explicit bin_width run)."""
    from eventstore_spark.operators.temporal import (_p99_bin_width,
                                                     interval_join)

    H = 3_600
    iv = [(i, i * 10 * H, i * 10 * H + 3 * H) for i in range(200)]
    iv.append((999, 0, 365 * 24 * H))  # the year-long outlier
    intervals = spark.createDataFrame(iv, "iv_id long, lo long, hi long")
    from pyspark.sql import functions as F
    bw = _p99_bin_width(intervals.select(
        (F.col("hi") - F.col("lo")).alias("len")))
    assert bw == 3 * H  # p99 of 200×3h + one year = the 3h mode

    pts = spark.createDataFrame(
        [(j, j * 7 * H) for j in range(300)], "pt_id long, ts long")
    got = {(r.pt_id, r.iv_id)
           for r in interval_join(pts, intervals, []).collect()}
    want = {(r.pt_id, r.iv_id)
            for r in interval_join(pts, intervals, [],
                                   bin_width=24 * H).collect()}
    assert got == want
    # definitional check against the nested-loop answer
    naive = {(p, i) for p, t in [(r.pt_id, r.ts) for r in pts.collect()]
             for i, lo, hi in iv if lo <= t < hi}
    assert got == naive


def test_resample_matches_plain_python_locf(spark):
    """Regular-grid LOCF recomputed definitionally: for every (key,
    grid point) the latest observation at-or-before it — including
    pre-first-observation NULLs, exact-grid-hit inclusivity, and the
    grid alignment (first point rounded UP to a step multiple)."""
    from eventstore_spark.operators.temporal import resample

    obs = [("a", 3, 30.0), ("a", 10, 31.0), ("a", 17, 29.0),
           ("b", 5, 7.0)]
    ref = spark.createDataFrame(obs, "k string, ts long, v double")
    out = resample(ref, ["k"], "ts", ["v"], step=5)
    got = {(r.k, r.grid_ts): (r.ts_ref, r.v_ref) for r in out.collect()}

    def locf(k, t):
        prior = [(ts, v) for kk, ts, v in obs if kk == k and ts <= t]
        return max(prior) if prior else (None, None)

    # global bounds 3..17 -> aligned grid 5,10,15 for BOTH keys
    want = {(k, t): locf(k, t) for k in ("a", "b") for t in (5, 10, 15)}
    assert got == want
    # explicit bounds override; exact-hit at ts=10 is inclusive
    out2 = resample(ref, ["k"], "ts", ["v"], step=10, start=0, end=20)
    got2 = {(r.k, r.grid_ts): r.v_ref for r in out2.collect()}
    assert got2[("a", 10)] == 31.0 and got2[("a", 0)] is None
    assert got2[("b", 20)] == 7.0


def test_skew_report_matches_plain_python_reference(spark):
    """skew report recomputed definitionally: counts per key, max/sum,
    rank-(q·N+99)//100 quantiles of the sorted counts, floor-micro
    ratios — including a deliberately hot key."""
    from eventstore_spark.operators.stats import skew_report

    rows = [(i, "hot" if i % 3 else f"k{i}") for i in range(90)]
    df = spark.createDataFrame(rows, "a long, b string")
    got = {r.key_col: r.asDict() for r in skew_report(df, ["b"]).collect()}

    from collections import Counter
    cnt = Counter(b for _, b in rows)
    cs = sorted(cnt.values())
    n_keys, n_rows, mx = len(cs), sum(cs), max(cs)
    def qv(q):
        return cs[(q * n_keys + 99) // 100 - 1]
    g = got["b"]
    assert (g["n_rows"], g["n_keys"], g["max_count"]) == (n_rows, n_keys, mx)
    assert g["p50_count"] == qv(50) and g["p99_count"] == qv(99)
    assert g["top_share_ppm"] == mx * 1_000_000 // n_rows
    assert g["skew_x_ppm"] == mx * n_keys * 1_000_000 // n_rows
    assert g["suggested_salt"] == max(1, mx * n_keys // n_rows)


def test_asof_join_forward_matches_plain_python_reference(spark):
    """forward as-of: earliest reference ts >= probe ts per key,
    inclusive ties, NULL when nothing follows."""
    from eventstore_spark.operators.temporal import asof_join

    probe_rows = [(1, 10, 100), (1, 16, 101), (1, 25, 102),
                  (2, 9, 200), (3, 1, 300)]
    ref_rows = [(1, 10, "a"), (1, 15, "b"), (1, 19, "c"), (2, 8, "x")]
    probe = spark.createDataFrame(probe_rows, "k long, ts long, pid long")
    ref = spark.createDataFrame(ref_rows, "k long, ts long, val string")
    got = {r.pid: (r.ts_ref, r.val_ref)
           for r in asof_join(probe, ref, ["k"], "ts", "ts", ["val"],
                              direction="forward").collect()}
    want = {}
    for k, pts, pid in probe_rows:
        best = None
        for rk, rts, val in ref_rows:
            if rk == k and rts >= pts and (best is None or rts < best[0]):
                best = (rts, val)
        want[pid] = best if best else (None, None)
    assert got == want
    assert got[100] == (10, "a")       # inclusive tie
    assert got[101] == (19, "c")       # earliest-above
    assert got[102] == (None, None)    # nothing follows
    assert got[200] == (None, None)    # key 2's only ref is below


def test_nb_classifier_train_apply_matches_plain_python_reference(spark):
    """NB log-count-ratio training + literal-LUT scoring recomputed
    definitionally in Python: same md5 bucketing, same per-ln
    micro-quantization, same +1 smoothing and unseen-bucket default."""
    import hashlib
    import math

    from eventstore_spark.operators.textops import (
        classifier_apply, train_nb_classifier)

    rows = [
        (1, "good clean text about spark queries", True),
        (2, "good text with clean words and spark", True),
        (3, "spam spam buy now cheap pills", False),
        (4, "cheap pills buy spam now", False),
        (5, "clean spark queries about text", True),
        (6, "now buy cheap spam pills fast", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    NB, SALT = 64, "clf-v1"
    model = train_nb_classifier(docs, "y", n_buckets=NB, salt=SALT)
    got = {r.doc_id: (r.n_features, r.logit_micro, r.label)
           for r in classifier_apply(docs, model, n_buckets=NB,
                                     salt=SALT).collect()}

    def bucket(t):
        return int(hashlib.md5(f"{SALT}|{t}".encode()).hexdigest()[:8],
                   16) % NB

    def feats(text):
        toks = text.lower().split()
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def lnq(v):
        return int(round(math.log(v) * 1e6))

    from collections import Counter
    pos, neg = Counter(), Counter()
    npos = nneg = 0
    for _, text, y in rows:
        if y:
            npos += 1
        else:
            nneg += 1
        for t in feats(text):
            (pos if y else neg)[bucket(t)] += 1
    tp, tn = sum(pos.values()), sum(neg.values())
    w = {b: lnq(pos[b] + 1) - lnq(tp + NB) - lnq(neg[b] + 1) + lnq(tn + NB)
         for b in set(pos) | set(neg)}
    default = lnq(tn + NB) - lnq(tp + NB)
    bias = lnq(npos + 1) - lnq(nneg + 1)
    for did, text, y in rows:
        fs = feats(text)
        logit = bias + sum(w.get(bucket(t), default) for t in fs)
        assert got[did] == (len(fs), logit, logit > 0), did
        # the trained gate actually separates the two classes here
        assert (logit > 0) == y, did


def test_interval_join_with_keys_matches_plain_python_reference(spark):
    """keyed interval join: the bin equi-join extends to (key, bin), so
    a point only matches intervals of ITS key — including two keys with
    overlapping time ranges."""
    from eventstore_spark.operators.temporal import interval_join

    pts = [(1, "a", 5), (2, "a", 12), (3, "b", 5), (4, "b", 40)]
    ivs = [(10, "a", 0, 10), (11, "a", 10, 20),
           (12, "b", 0, 10), (13, "c", 0, 100)]
    points = spark.createDataFrame(pts, "pid long, k string, ts long")
    intervals = spark.createDataFrame(ivs, "iid long, k string, lo long, hi long")
    got = {(r.pid, r.iid)
           for r in interval_join(points, intervals, ["k"], "ts",
                                  "lo", "hi", bin_width=4).collect()}
    want = {(pid, iid) for pid, pk, ts in pts
            for iid, ik, lo, hi in ivs if pk == ik and lo <= ts < hi}
    assert got == want
    assert (3, 10) not in got          # same time range, other key
    assert not any(iid == 13 for _, iid in got)  # key with no points


def test_overlap_join_hypothesis_random_intervals(spark):
    """Property: for RANDOM interval sets and bin widths, overlap_join
    equals the definitional nested loop with no duplicate pairs. The
    shrunk counterexample space covers touching endpoints, containment,
    zero-length and inverted intervals, and bin-boundary alignment."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from eventstore_spark.operators.temporal import overlap_join

    iv = st.tuples(st.integers(0, 60), st.integers(0, 60))

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(ls=st.lists(iv, min_size=1, max_size=8),
           rs=st.lists(iv, min_size=1, max_size=8),
           bw=st.integers(1, 70))
    def run(ls, rs, bw):
        lv = [(i, lo, hi) for i, (lo, hi) in enumerate(ls)]
        rv = [(i, lo, hi) for i, (lo, hi) in enumerate(rs)]
        left = spark.createDataFrame(lv, "lid long, lo long, hi long")
        right = spark.createDataFrame(rv, "rid long, lo long, hi long")
        got = [(r.lid, r.rid)
               for r in overlap_join(left, right, [], "lo", "hi",
                                     "lo", "hi", bin_width=bw).collect()]
        want = {(lid, rid) for lid, llo, lhi in lv
                for rid, rlo, rhi in rv
                if lhi > llo and rhi > rlo and llo < rhi and rlo < lhi}
        assert sorted(got) == sorted(want)
        assert len(got) == len(set(got))

    run()


def test_resample_hypothesis_random_series(spark):
    """Property: for RANDOM per-key observation sets, steps and bounds,
    resample equals the plain-Python aligned-grid LOCF."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from eventstore_spark.operators.temporal import resample

    obs_s = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(0, 50), st.integers(-5, 5)),
        min_size=1, max_size=12)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(obs=obs_s, step=st.integers(1, 20))
    def run(obs, step):
        # reference side must be unique per (key, ts): keep max value
        uniq = {}
        for k, t, v in obs:
            uniq[(k, t)] = max(uniq.get((k, t), v), v)
        rows = [(k, t, v) for (k, t), v in sorted(uniq.items())]
        ref = spark.createDataFrame(rows, "k string, ts long, v long")
        got = {(r.k, r.grid_ts): (r.ts_ref, r.v_ref)
               for r in resample(ref, ["k"], "ts", ["v"],
                                 step=step).collect()}

        lo = min(t for _, t, _ in rows)
        hi = max(t for _, t, _ in rows)
        g0 = ((lo + step - 1) // step) * step
        keys = sorted({k for k, _, _ in rows})
        want = {}
        for k in keys:
            for t in range(g0, hi + 1, step):
                prior = [(ts, v) for kk, ts, v in rows
                         if kk == k and ts <= t]
                want[(k, t)] = max(prior) if prior else (None, None)
        assert got == want

    run()


def test_snapshot_diff_matches_plain_python_reference(spark):
    """Snapshot diff recomputed definitionally: per id present in either
    side, added/removed/changed/unchanged by content equality."""
    from eventstore_spark.operators.corpus import snapshot_diff

    old = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    new = [(2, "b"), (3, "C!"), (5, "e")]
    odf = spark.createDataFrame(old, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    got = {r.doc_id: r.status
           for r in snapshot_diff(odf, ndf).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "removed", 5: "added"}


def test_association_mi_matches_plain_python_reference(spark):
    """Column-level MI recomputed definitionally with the same per-cell
    micro-rounded ln — including an independent pair (MI ≈ 0) and a
    perfectly dependent one (MI = H)."""
    import math

    from collections import Counter

    from eventstore_spark.operators.corpus import association_mi

    rows = [("s1", "en"), ("s1", "en"), ("s1", "de"),
            ("s2", "en"), ("s2", "de"), ("s2", "de"), ("s2", "de")]
    df = spark.createDataFrame(rows, "source string, lang string")
    got = association_mi(df, "source", "lang").collect()[0]

    cells = Counter(rows)
    na = Counter(a for a, _ in rows)
    nb = Counter(b for _, b in rows)
    n = len(rows)
    want = sum(
        nab * round(math.log((nab * n) / (na[a] * nb[b])) * 1e6)
        for (a, b), nab in cells.items()) // n
    assert (got.n, got.n_a, got.n_b, got.n_cells) == (7, 2, 2, 4)
    assert got.mi_micro == want

    # perfect dependence: MI = H(b) (ln 2 with a 50/50 split)
    dep = spark.createDataFrame(
        [("s1", "en"), ("s1", "en"), ("s2", "de"), ("s2", "de")],
        "source string, lang string")
    mi = association_mi(dep, "source", "lang").collect()[0].mi_micro
    assert mi == round(math.log(2) * 1e6)


def test_session_spans_matches_plain_python_reference(spark):
    """Per-session rows recomputed definitionally: sort per key, split
    on gap > G strictly (the session_window tie rule), report
    (start, last, count) — including an exact-gap tie that merges."""
    from eventstore_spark.operators.temporal import session_spans

    G = 100
    rows = [("a", 0), ("a", 50), ("a", 150), ("a", 251), ("a", 300),
            ("b", 10)]
    df = spark.createDataFrame(rows, "k string, ts long")
    got = {(r.k, r.session_start): (r.session_last, r.n_events)
           for r in session_spans(df, ["k"], "ts", gap=G).collect()}
    # a: 0,50,150 one session (gaps 50, 100=tie merges); 251 splits
    # (gap 101); 300 joins it
    assert got == {("a", 0): (150, 3), ("a", 251): (300, 2),
                   ("b", 10): (10, 1)}


def test_chi2_independence_matches_plain_python_reference(spark):
    """Chi-square recomputed definitionally over the FULL contingency
    grid (incl. empty cells) with the same per-cell micro-rounding and
    the closed-form empty-cell sum."""
    import math

    from eventstore_spark.operators.stats import chi2_independence

    rows = [("s1", "en")] * 5 + [("s1", "fr")] * 1 + [("s2", "en")] * 2 \
        + [("s2", "de")] * 4 + [("s3", "de")] * 3
    df = spark.createDataFrame(rows, "source string, lang string")
    r = chi2_independence(df, "source", "lang").collect()[0]

    from collections import Counter
    cells = Counter(rows)
    na = Counter(a for a, _ in rows)
    nb = Counter(b for _, b in rows)
    n = len(rows)
    obs = sum(
        round(((o * n - na[a] * nb[b]) ** 2) / (na[a] * nb[b] * n) * 1e6)
        for (a, b), o in cells.items())
    s = sum(na[a] * nb[b] for (a, b) in cells)
    chi2 = obs + (n * n - s) * 1_000_000 // n
    assert (r.n, r.n_a, r.n_b, r.dof) == (n, 3, 3, 4)
    assert r.chi2_micro == chi2
    assert r.cramers_v_micro == round(
        math.sqrt((chi2 / 1e6) / (n * 2)) * 1e6)


def test_brier_score_matches_plain_python_reference(spark):
    """Brier recomputed definitionally: floor(Σ(p_ppm − y·1e6)² /
    (n·1e6)); NULL scores/labels excluded."""
    from eventstore_spark.operators.stats import brier_score

    rows = [(900_000, True), (100_000, False), (500_000, True),
            (0, False), (1_000_000, True), (None, True), (300_000, None)]
    df = spark.createDataFrame(rows, "p long, y boolean")
    r = brier_score(df, "p", "y").collect()[0]
    vals = [(p, y) for p, y in rows if p is not None and y is not None]
    sq = sum((p - int(y) * 1_000_000) ** 2 for p, y in vals)
    assert (r.n, r.n_pos) == (len(vals), 3)
    assert r.brier_micro == sq // (len(vals) * 1_000_000)


def test_cluster_balanced_sample_caps_every_cell(spark):
    """Every cell contributes at most k rows, ranks are 1..k dense in
    (md5, id) order, and the selection is a subset of the cell
    assignment the shared quantizer produces."""
    from eventstore_spark.operators.similarity import (
        cluster_balanced_sample, kmeans_clusters)

    rows = [(i, [((i * 13 + j * 7) % 23 - 11) / 11.0 for j in range(8)])
            for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balanced_sample(emb, k_per_cell=5, n_centroids=4,
                                  iters=1).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r.rk)
    assert by_cell, "no cells selected"
    for cell, rks in by_cell.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 5
    # cluster profile over the same quantizer agrees on the cell set
    prof = {r.cell for r in kmeans_clusters(emb, n_centroids=4,
                                            iters=1).collect()}
    assert set(by_cell) <= prof


def test_time_weighted_average_matches_plain_python_reference(spark):
    """TWA recomputed definitionally: Σ v·Δt / span with LOCF, floor in
    micro units — including a negative-area key (sign-safe floor), a
    single-observation key, and irregular spacing."""
    from eventstore_spark.operators.temporal import time_weighted_average

    rows = [("a", 0, 10), ("a", 10, 30), ("a", 40, 0),
            ("b", 5, -7), ("b", 8, -3),
            ("c", 99, 42)]
    df = spark.createDataFrame(rows, "k string, ts long, v long")
    got = {r.k: (r.t_first, r.t_last, r.n_obs, r.twa_micro)
           for r in time_weighted_average(df, ["k"], "ts", "v").collect()}

    import math
    want = {}
    for k in ("a", "b", "c"):
        pts = sorted((t, v) for kk, t, v in rows if kk == k)
        span = pts[-1][0] - pts[0][0]
        if span == 0:
            twa = pts[-1][1] * 1_000_000
        else:
            area = sum(v * (pts[i + 1][0] - t)
                       for i, (t, v) in enumerate(pts[:-1]))
            twa = math.floor(area * 1_000_000 / span)
        want[k] = (pts[0][0], pts[-1][0], len(pts), twa)
    assert got == want
    assert got["c"][3] == 42_000_000   # single observation
    assert got["b"][3] == -7_000_000   # negative area: (-7·3)/3 exact


def test_quantile_bucket_matches_plain_python_ntile(spark):
    """Equal-frequency buckets recomputed definitionally as NTILE(k):
    sizes differ by at most one, ties broken by id, bucket =
    (rank−1)·k DIV N + 1 — including N not divisible by k."""
    from eventstore_spark.operators.stats import quantile_bucket

    rows = [(i, (i * 7) % 5) for i in range(23)]   # heavy ties, N=23
    df = spark.createDataFrame(
        [(i, "t", "en", "s", v) for i, v in rows],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.doc_id: (r.rank, r.bucket)
           for r in quantile_bucket(df, "n_chars", k=4).collect()}

    order = sorted((v, i) for i, v in rows)
    n = len(order)
    want = {i: (pos, (pos - 1) * 4 // n + 1)
            for pos, (v, i) in enumerate(order, start=1)}
    assert got == want
    from collections import Counter
    sizes = Counter(b for _, b in got.values())
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_psi_drift_matches_plain_python_reference(spark):
    """PSI recomputed definitionally with the same add-one smoothing
    over the category union and per-cell micro-rounded ln — including
    a category present on only one side, and PSI(x, x) == 0."""
    import math

    from eventstore_spark.operators.stats import psi_drift

    old = ["web"] * 50 + ["books"] * 30 + ["code"] * 20
    new = ["web"] * 70 + ["books"] * 10 + ["wiki"] * 5
    df_o = spark.createDataFrame([(s,) for s in old], "source string")
    df_n = spark.createDataFrame([(s,) for s in new], "source string")
    r = psi_drift(df_o, df_n, "source").collect()[0]

    from collections import Counter
    ca, cb = Counter(old), Counter(new)
    cats = sorted(set(ca) | set(cb))
    na, nb, c = len(old), len(new), len(cats)
    s = 0
    for g in cats:
        a, b = ca.get(g, 0), cb.get(g, 0)
        d = (a + 1) * (nb + c) - (b + 1) * (na + c)
        t = round(math.log((a + 1) * (nb + c)
                           / ((b + 1) * (na + c))) * 1e6)
        s += d * t
    want = s // ((na + c) * (nb + c))
    assert (r.n_old, r.n_new, r.n_categories) == (na, nb, 4)
    assert r.psi_micro == want and r.psi_micro > 0

    same = psi_drift(df_o, df_o, "source").collect()[0]
    assert same.psi_micro == 0


def test_welch_t_matches_plain_python_reference(spark):
    """Welch's t and df recomputed definitionally from plain-Python
    means/variances — including an n=1 group that must be OMITTED and
    a clearly shifted pair with a negative t in the (a < b) order."""
    import math

    from eventstore_spark.operators.stats import welch_t

    groups = {"en": [100, 110, 120, 130, 90],
              "fr": [200, 210, 190, 205],
              "xx": [42]}  # n < 2: variance undefined -> omitted
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    got = {(r.g_a, r.g_b): (r.n_a, r.n_b, r.mean_a_micro, r.t_micro,
                            r.df_micro)
           for r in welch_t(df, "lang", "n_chars").collect()}

    def stats(vs):
        n = len(vs)
        m = sum(vs) / n
        var = sum((v - m) ** 2 for v in vs) / (n - 1)
        return n, m, var

    want = {}
    for ga, gb in [("en", "fr")]:
        na, ma, va = stats(groups[ga])
        nb, mb, vb = stats(groups[gb])
        se = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se)
        dof = se * se / ((va / na) ** 2 / (na - 1)
                         + (vb / nb) ** 2 / (nb - 1))
        want[(ga, gb)] = (na, nb, round(ma * 1e6), round(t * 1e6),
                          round(dof * 1e6))
    assert got == want
    assert ("en", "xx") not in got and ("fr", "xx") not in got
    assert got[("en", "fr")][3] < 0  # en mean < fr mean


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 500)),
                min_size=1, max_size=30),
       st.sampled_from([1, 7, 50, 100]))
def test_session_spans_hypothesis_random_series(spark, rows, gap):
    """Random keyed series: session_spans equals the plain-Python
    splitter (strict gap > G) for arbitrary data and gap widths,
    including duplicate timestamps."""
    from eventstore_spark.operators.temporal import session_spans

    df = spark.createDataFrame(rows, "k long, ts long")
    got = sorted((r.k, r.session_start, r.session_last, r.n_events)
                 for r in session_spans(df, ["k"], "ts", gap=gap).collect())

    want = []
    for k in sorted({k for k, _ in rows}):
        tss = sorted(t for kk, t in rows if kk == k)
        start = prev = tss[0]
        n = 1
        for t in tss[1:]:
            if t - prev > gap:
                want.append((k, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        want.append((k, start, prev, n))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 300),
                          st.integers(-50, 50)),
                min_size=1, max_size=25))
def test_time_weighted_average_hypothesis(spark, rows):
    """Random keyed series (unique per (key, ts) — the documented
    contract): TWA equals the plain-Python floor(Σ v·Δt·1e6 / span),
    negative values included."""
    import math

    from eventstore_spark.operators.temporal import time_weighted_average

    rows = list({(k, t): (k, t, v) for k, t, v in rows}.values())
    df = spark.createDataFrame(rows, "k long, ts long, v long")
    got = {r.k: (r.t_first, r.t_last, r.n_obs, r.twa_micro)
           for r in time_weighted_average(df, ["k"], "ts", "v").collect()}

    want = {}
    for k in {k for k, _, _ in rows}:
        pts = sorted((t, v) for kk, t, v in rows if kk == k)
        span = pts[-1][0] - pts[0][0]
        if span == 0:
            twa = pts[-1][1] * 1_000_000
        else:
            area = sum(v * (pts[i + 1][0] - t)
                       for i, (t, v) in enumerate(pts[:-1]))
            twa = math.floor(area * 1_000_000 / span)
        want[k] = (pts[0][0], pts[-1][0], len(pts), twa)
    assert got == want
