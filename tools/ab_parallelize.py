"""Interleaved A/B of parallelize_small on given goldens (r15 VERDICT
item 6 / bb34b4bc adjudicator): A = golden as written, B = the same
golden with ``_util.parallelize_small`` monkeypatched to identity (the
goldens import it function-locally, so the patch takes effect per
call). One warmup pass of both variants is run and DISCARDED (codegen /
page-cache first-touch), then REPS interleaved A/B pairs; prints
per-query medians and the verdict. Run SOLO.

Usage: python tools/ab_parallelize.py name [name ...]
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
from hydraide_spark.golden import _util  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("AB_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_parallelize")
    qs = golden.queries()
    real = _util.parallelize_small

    def identity(df, cap=None):
        return df

    # several golden modules bind parallelize_small at MODULE level
    # (curation, dedup_text, vectors, vectors_stable) — patch every
    # module attribute, not just _util's, or the A/B silently measures
    # A twice for those modules
    import importlib

    mods = [_util] + [
        importlib.import_module(f"hydraide_spark.golden.{m}")
        for m in ("curation", "dedup_text", "vectors", "vectors_stable")
    ]

    def _set(fn):
        for m in mods:
            if hasattr(m, "parallelize_small"):
                m.parallelize_small = fn

    def run(n: str, patched: bool) -> float:
        _set(identity if patched else real)
        try:
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            _set(real)

    out = {}
    for n in names:
        run(n, False), run(n, True)  # warmup pair, discarded
        a, b = [], []
        for _ in range(reps):
            a.append(run(n, False))
            b.append(run(n, True))
        a.sort(); b.sort()
        med_a, med_b = a[len(a) // 2], b[len(b) // 2]
        out[n] = {
            "with_repartition": round(med_a, 3),
            "without": round(med_b, 3),
            "spread_a": round(a[-1] - a[0], 3),
            "spread_b": round(b[-1] - b[0], 3),
            "keep": bool(med_a <= med_b),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
