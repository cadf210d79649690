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
