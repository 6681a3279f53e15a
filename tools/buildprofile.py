"""cProfile the golden-function BUILD phase (no execution) of given
queries, printing top functions by cumulative time plus the py4j
send_command round-trip count.

Usage: python tools/buildprofile.py name [name ...]
Each query is built once to warm memos/caches, then profiled on the
second build (the bench's warm-pass shape). Run SOLO.
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from hydraide_spark.session import get_spark  # noqa: E402
import __spark_entry__ as golden  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("buildprofile")
    qs = golden.queries()

    from py4j import java_gateway as jg

    counter = {"n": 0}
    orig = jg.GatewayClient.send_command

    def counted(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    jg.GatewayClient.send_command = counted

    for n in names:
        qs[n](spark, sf_dir)  # warm pass (memos, pinned caches)
        counter["n"] = 0
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        qs[n](spark, sf_dir)
        pr.disable()
        wall = time.time() - t0
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print(f"==== {n}: build {wall:.3f}s, py4j send_command {counter['n']}")
        print(s.getvalue())


if __name__ == "__main__":
    main()
