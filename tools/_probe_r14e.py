"""r14 task 5 (cache lifecycle): run EVERY registry query once in ONE
session, releasing query-scoped caches after each terminal action, and
assert the SQL cache manager ends empty — the session does not
accumulate cached tables across the registry (VERDICT r13 item 4/5).

Usage: python tools/_probe_r14e.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from eventstore_spark.session import get_spark
from eventstore_spark.schema import release_query_caches


def cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("probe_r14e")
    qs = entry.queries()
    t0 = time.time()
    total_released, peak_leaked, failures = 0, 0, []
    for i, (name, fn) in enumerate(qs.items()):
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            failures.append((name, repr(e)[:120]))
            continue
        finally:
            n = release_query_caches()
            total_released += n
        if not cache_manager_empty(spark):
            peak_leaked += 1
            print(f"LEAK after {name}: cacheManager not empty", flush=True)
            spark.catalog.clearCache()
    print(f"ran {len(qs)} queries in {time.time()-t0:.0f}s; "
          f"released {total_released} scoped caches; "
          f"queries leaving residue: {peak_leaked}; failures: {len(failures)}")
    for f in failures:
        print("FAIL", *f)
    print("cache manager empty at end:", cache_manager_empty(spark))


if __name__ == "__main__":
    main()
