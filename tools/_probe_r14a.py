"""r14 task 2: single-variable A/B of spark.sql.adaptive.advisoryPartitionSizeInBytes
(64m Spark default vs the 128m pin added in r13) on the queries the r13 driver
bench flagged: dedup_simhash (-18.8%, non-overlapping spreads) plus tpch_q3 and
dedup_minhash_pairs as controls. The conf is a runtime SQL conf, so variants
interleave in ONE session (tools/ab_probe.py discipline)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from eventstore_spark.session import get_spark
from tools.ab_probe import probe

SF_DIR = "/root/testdata/sf0.1"
KEY = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def main():
    spark = get_spark("probe_r14a")
    qs = entry.queries()
    for qname in ["dedup_simhash", "tpch_q3", "dedup_minhash_pairs"]:
        fn = qs[qname]

        def with_conf(val, fn=fn):
            def build():
                spark.conf.set(KEY, val)
                return fn(spark, SF_DIR)
            return build

        print(f"=== {qname} ===")
        probe(
            spark,
            {f"{qname}@64m": with_conf("64m"), f"{qname}@128m": with_conf("128m")},
            reps=7,
        )
        spark.conf.set(KEY, "128m")


if __name__ == "__main__":
    main()
