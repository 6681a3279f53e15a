"""Two-decade (x100) scale check for the TEXT dedup collapse paths —
the round-6 fixes (`auto_shingle_n`, `collapse_exact`) were proven at
x30; this extends the same warm protocol to x100 (500K docs) so both
decades are on record next to the embedding/kNN auto rows in
BENCH_scale100.json.

The measured pipelines are the PRODUCTION forms, not the oracle-stable
golden twins:
- ngram_jaccard auto+collapse: n='auto' (corpus-scaled shingle length)
  + exact-duplicate family collapse before the prefix index.
- minhash collapse: banded LSH with shingle-SET-level exact-dup
  collapse (the sound level — signature-level would not be).

Corpus replicas permute tokens per-replica (tools/scale_stress.py::
build_corpus): exact-duplicate families inside the corpus replicate
linearly (identical docs permute identically), cross-replica shingles
decorrelate — the production duplicate shape, not an adversarial
pair-graph square.

Usage: python tools/text_stress100.py [mult]   # default 100
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

from hydraide_spark.session import get_spark  # noqa: E402
from hydraide_spark.sources.tables import load_table  # noqa: E402
from scale_stress import WORK, build_corpus  # noqa: E402


def pipelines():
    from hydraide_spark.functions.dedup import (
        minhash_neardup_pairs,
        ngram_jaccard_pairs,
    )

    return {
        "ngram_jaccard_auto_collapse": lambda docs: ngram_jaccard_pairs(
            docs, tau=0.6, n="auto", collapse_exact=True
        ),
        "minhash_lsh_collapse": lambda docs: minhash_neardup_pairs(
            docs, tau=0.6, n=3, k=16, bands=4, collapse_exact=True
        ),
    }


def run_once(spark, sf_dir: str, fn) -> tuple[float, int]:
    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents")
    t0 = time.time()
    n_pairs = fn(docs).count()
    return round(time.time() - t0, 3), n_pairs


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("text_stress100")
    dirs = {}
    for m in (1, mult):
        d = os.path.join(WORK, f"x{m}")
        print(f"building x{m} corpus ...", file=sys.stderr)
        build_corpus(spark, d, m)
        dirs[m] = d

    table = {}
    for name, fn in pipelines().items():
        r = {}
        for m in (1, mult):
            # warm protocol: second run recorded
            run_once(spark, dirs[m], fn)
            sec, n_pairs = run_once(spark, dirs[m], fn)
            r[f"x{m}"] = sec
            r[f"pairs_x{m}"] = n_pairs
            print(f"  x{m} {name}: {sec}s ({n_pairs} pairs)", file=sys.stderr)
        b = round(math.log(r[f"x{mult}"] / r["x1"]) / math.log(mult), 2)
        table[name] = {**r, "growth_exponent": b}

    out_path = os.path.join(_REPO, f"BENCH_scale{mult}.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
        doc.setdefault("queries", {}).update(table)
    else:
        doc = {"metric": "scale_stress", "multipliers": [1, mult], "queries": table}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(table, sort_keys=True))


if __name__ == "__main__":
    main()
