"""Capture .explain('formatted') for named queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
Defaults to the headline set when no queries given.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from eventstore_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1", "tpch_q3", "tpch_q5_region_revenue", "top_order_per_customer",
    "events_hourly", "user_sessions", "y1_streams", "p6_fold_balance",
    "text_analyze", "dedup_minhash_pairs", "dedup_simhash", "ann_bruteforce",
]


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/root/repo/plans/{tag}"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
