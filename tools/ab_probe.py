"""Interleaved A/B timing probe for optimization work (guide §1).

Times named DataFrame builders with the noop sink, interleaving variants
round-robin so machine-noise drift hits all variants equally. Import and
call `probe({...})` from an inline script.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def probe(spark, builders: dict, reps: int = 5, warmup: int = 1):
    """builders: name -> zero-arg fn returning a DataFrame."""
    for _ in range(warmup):
        for name, fn in builders.items():
            fn().write.format("noop").mode("overwrite").save()
    times = {n: [] for n in builders}
    for _ in range(reps):
        for name, fn in builders.items():
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    out = {}
    for name, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        out[name] = (round(min(ts), 3), round(med, 3), round(max(ts), 3))
        print(f"{name:40s} min={ts[0]:.3f} med={med:.3f} max={ts[-1]:.3f}")
    return out
