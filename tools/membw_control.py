"""Control run for the r13 memory-bandwidth sentinel (VERDICT r12 task
10): demonstrate that a pure memory-bandwidth co-tenant — the r12-style
uniform dilation — trips the membw probe while the CPU spin probe stays
comparatively flat.

Phase 1 (quiet): 5 paired readings of (spin, membw).
Phase 2 (bandwidth hog): spawn N worker processes that stream-sum large
arrays (memory-bandwidth-bound, nice +10 so they yield CPU readily),
take 5 paired readings, kill the hogs.
Phase 3 (quiet again): 3 paired readings.

Prints one JSON line with all readings and the per-phase medians.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hog(stop):
    import numpy as np

    os.nice(10)
    a = np.ones(64 * 1024 * 1024)  # 512 MiB stream
    while not stop.is_set():
        float(a.sum())


def main() -> None:
    import bench
    from hgraphstorage_spark.session import get_spark

    spark = get_spark("membw-control")
    bench._sentinel_sec(spark)  # untimed warm

    def paired(n):
        out = []
        for _ in range(n):
            spin = bench._sentinel_sec(spark)
            out.append((spin, bench._MEMBW_VALS[-1]))
        return out

    quiet1 = paired(5)
    stop = mp.Event()
    hogs = [mp.Process(target=_hog, args=(stop,)) for _ in range(12)]
    for h in hogs:
        h.start()
    time.sleep(2)
    hogged = paired(5)
    stop.set()
    for h in hogs:
        h.join(timeout=5)
        if h.is_alive():
            h.terminate()
    time.sleep(1)
    quiet2 = paired(3)

    def med(vals, i):
        s = sorted(v[i] for v in vals)
        return s[len(s) // 2]

    print(
        json.dumps(
            {
                "quiet1": quiet1,
                "hogged": hogged,
                "quiet2": quiet2,
                "spin_ratio_hog_vs_quiet": round(med(hogged, 0) / med(quiet1, 0), 2),
                "membw_ratio_hog_vs_quiet": round(med(hogged, 1) / med(quiet1, 1), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
