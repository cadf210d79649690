"""tools/gen_sf.py — the scale-step data generator that backs the
sf1/sf10 plan gates. If its schemas or shapes drift from the driver
testdata's, every scale measurement silently stops being comparable, so
pin them: identical arrow schemas, linear row scaling, dup structure,
unit-norm embeddings, deterministic output.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_sf import generate  # noqa: E402


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gensf") / "sf0.001")
    generate(0.001, out)
    return out


def _schema(path):
    if os.path.isdir(path):
        path = os.path.join(path, sorted(os.listdir(path))[0])
    return pq.read_schema(path)


def test_schemas_match_driver_testdata(gen_dir):
    ref_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(ref_dir):
        pytest.skip("driver testdata not present")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        got = _schema(os.path.join(gen_dir, f"{t}.parquet"))
        ref = _schema(os.path.join(ref_dir, f"{t}.parquet"))
        assert got.names == ref.names, t
        for name in got.names:
            gt, rt = got.field(name).type, ref.field(name).type
            assert str(gt) == str(rt), f"{t}.{name}: {gt} != {rt}"
    # events: the driver's sf0.001 file predates the ts-precision
    # regeneration (TIMESTAMP_NANOS stored as long via nanosAsLong);
    # the generator emits the CURRENT convention, native timestamp[us]
    # — assert names only, plus the us type
    got = _schema(os.path.join(gen_dir, "events.parquet"))
    ref = _schema(os.path.join(ref_dir, "events.parquet"))
    assert got.names == ref.names
    assert str(got.field("ts").type) == "timestamp[us]"


def test_row_counts_scale_linearly(gen_dir):
    n = pq.read_table(os.path.join(gen_dir, "orders.parquet")).num_rows
    assert n == 1_500  # 0.001 -> 150k * (0.001/0.1)
    li = pq.read_table(os.path.join(gen_dir, "lineitem.parquet")).num_rows
    assert 0.8 * 6_000 <= li <= 1.2 * 6_000  # poisson(3)+1 per order
    assert pq.read_table(os.path.join(gen_dir, "region.parquet")).num_rows == 5
    assert pq.read_table(os.path.join(gen_dir, "nation.parquet")).num_rows == 25


def test_documents_have_dup_structure_and_embeddings_unit_norm(gen_dir):
    import numpy as np

    docs = pq.read_table(os.path.join(gen_dir, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    n_chars = docs.column("n_chars").to_pylist()
    assert all(len(t) == c for t, c in zip(texts, n_chars))
    # ~0.2% exact + ~4% near dups injected -> some exact repeats at 5k
    # docs would be rare at 500; assert the near-dup channel instead:
    # at least one pair shares a long prefix
    prefixes = {}
    shared = 0
    for t in texts:
        shared += prefixes.get(t[:60], 0)
        prefixes[t[:60]] = prefixes.get(t[:60], 0) + 1
    assert shared > 0, "no near-duplicate structure generated"
    emb = pq.read_table(os.path.join(gen_dir, "embeddings.parquet"))
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    assert vecs.shape[1] == 64
    norms = np.linalg.norm(vecs, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_generation_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate(0.001, a)
    generate(0.001, b)
    ta = pq.read_table(os.path.join(a, "orders.parquet"))
    tb = pq.read_table(os.path.join(b, "orders.parquet"))
    assert ta.equals(tb)


def test_zipf_text_has_natural_df_skew(tmp_path):
    """--zipf documents: rank-frequency skew (hot head token in most
    docs, long tail of rare tokens) while dup structure survives."""
    from collections import Counter

    import pyarrow.parquet as pq

    from gen_sf import generate

    out = str(tmp_path / "sfz")
    generate(0.02, out, zipf=True)
    texts = pq.read_table(f"{out}/documents.parquet").column("text").to_pylist()
    df = Counter()
    for t in texts:
        df.update(set(t.split()))
    n = len(texts)
    # the head token is near-stop-word hot; the tail is long
    assert df.most_common(1)[0][1] > 0.8 * n
    assert sum(1 for c in df.values() if c == 1) > 1000
    # exact dups still exist (the 0.2% layer)
    assert len(set(texts)) < n
