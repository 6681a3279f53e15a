"""Quiet-window re-measure of specific bench queries (adjudication aid).

Usage: python tools/remeasure.py name1 name2 ...  [reps via REMEASURE_REPS]
Prints per-query sample lists + median/spread as one JSON line.
Run SOLO — concurrent Spark work invalidates the measurement (CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from hydraide_spark.session import get_spark  # noqa: E402
import __spark_entry__ as golden  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("REMEASURE_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("remeasure")
    qs = golden.queries()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.time() - t0, 3))
        spark.sparkContext._jvm.System.gc()
    out = {}
    for n, s in samples.items():
        srt = sorted(s)
        out[n] = {
            "samples": s,
            "median": srt[(len(srt) - 1) // 2],
            "spread": round(srt[-1] - srt[0], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
