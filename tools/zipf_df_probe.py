"""Measure ngram_jaccard_pairs' exact-mode join volume on NATURAL text.

VERDICT r9 ("What's wrong #1") challenged the claim that "real corpora
don't saturate the shingle space": hot shingles (stop-word n-grams,
boilerplate) have df proportional to corpus size on natural text, making
the exact inverted-index self-join's Σ df² volume superlinear regardless
of saturation. This probe quantifies that on a Zipfian-vocabulary corpus
(rank-frequency ~ 1/rank^s, s = 1.1 — the classic fit for English word
frequencies, Zipf 1949 / Piantadosi 2014) instead of the 31-word
synthetic the sf tables use.

For each corpus size it reports, over distinct-per-doc trigram shingles:

  docs, distinct shingles, top df, Σdf, Σdf², and the ratios
  Σdf²/docs (join rows per document — the superlinearity signal) and
  top_df/docs (the hot-shingle density).

Deterministic (fixed seed), pure numpy — the df distribution is a
property of the text model, not of the join engine.

Usage: python tools/zipf_df_probe.py [sizes ...]
"""

from __future__ import annotations

import sys

import numpy as np

VOCAB = 50_000
S = 1.1
DOC_TOKENS = 100
N = 3
SEED = 20260815


def zipf_docs(n_docs: int, rng: np.random.Generator) -> list[np.ndarray]:
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = ranks ** -S
    p /= p.sum()
    return [rng.choice(VOCAB, size=DOC_TOKENS, p=p) for _ in range(n_docs)]


def df_stats(docs: list[np.ndarray]) -> dict:
    df: dict[tuple, int] = {}
    for toks in docs:
        grams = {tuple(toks[i:i + N]) for i in range(len(toks) - N + 1)}
        for g in grams:
            df[g] = df.get(g, 0) + 1
    counts = np.fromiter(df.values(), dtype=np.int64)
    return {
        "docs": len(docs),
        "distinct_shingles": len(df),
        "top_df": int(counts.max()),
        "sum_df": int(counts.sum()),
        "sum_df2": int((counts.astype(np.float64) ** 2).sum()),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000, 8_000, 32_000]
    rng = np.random.default_rng(SEED)
    print(f"vocab={VOCAB} zipf_s={S} doc_tokens={DOC_TOKENS} shingle_n={N}")
    print(f"{'docs':>8} {'shingles':>10} {'top_df':>8} {'sum_df':>10} "
          f"{'sum_df2':>14} {'df2/doc':>10} {'top/docs':>9}")
    for n in sizes:
        st = df_stats(zipf_docs(n, rng))
        print(f"{st['docs']:>8} {st['distinct_shingles']:>10} "
              f"{st['top_df']:>8} {st['sum_df']:>10} {st['sum_df2']:>14} "
              f"{st['sum_df2'] / st['docs']:>10.1f} "
              f"{st['top_df'] / st['docs']:>9.4f}")


if __name__ == "__main__":
    main()
