"""Scale-stress harness: measure how the bench-headline heavyweights
GROW, not just how fast they are at sf0.1.

Builds synthetic corpora at multipliers of sf0.1 (documents and
embeddings explode-multiplied with DIFFERENT content per replica —
token rotation / deterministic vector perturbation — so duplicate
structure stays realistic instead of every replica being a near-dup of
its original, which would adversarially square the pair graph), runs
the slowest query families at each size, and fits the per-query growth
exponent b in t = a * n^b from the largest size step. b ~ 1 is the
linear scaling every SCALE.md argument claims; a materially
super-linear b names a real scale bug.

Usage:
    python tools/scale_stress.py [mult ...]      # default 1 3 10
    python tools/scale_stress.py 1 30 --queries knn_self_join_stable,... \
        --warm                                   # first-touch-excluded

Writes BENCH_scale<max-mult>.json at the repo root and prints a table.

``--warm`` runs every (query, size) twice and records the SECOND run:
the round-5 ADC exponent (fitted 1.15 vs warm-remeasured 0.65) showed
that first-touch JIT/codegen/page-cache costs sit in the small-x
denominator and inflate fitted exponents; excluding the first touch
fits the steady-state growth the 100 TB argument is actually about.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hydraide_spark import golden  # noqa: E402
from hydraide_spark.session import get_spark  # noqa: E402
from hydraide_spark.sources.tables import load_table  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
WORK = os.path.join(_REPO, ".scale")

#: the bench top families (slowest at sf0.1) plus one representative
#: per scale-sensitive design: pair-graph dedup, clustering, ANN
#: bucket joins, vocab-bounded BPE, map-only text stats.
QUERIES = [
    "top_ngrams_corpus",
    "repetition_signals_docs",
    "ngram_jaccard_neardup",
    "neardup_clusters",
    "neardup_clusters_prop",
    "minhash_lsh_neardup",
    "simhash_neardup",
    "dedup_exact",
    "semantic_dedup_docs",
    "curation_pipeline_docs",
    "decontaminate_docs",
    "bpe_merge_rules",
    "bpe_merge_rules_256",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "pq_ann_topk",
    "ivfadc_topk",
    "knn_self_join_stable",
    "embedding_neardup",
    "pagerank_citation_graph",
    "multimodal_features",
]

_OFFSET = 10_000_000  # replica id namespace stride


def build_corpus(spark, out_dir: str, mult: int) -> None:
    """Materialize a mult× corpus: documents' replicas rotate their
    token order by a replica-dependent stride (same unigram mass,
    mostly-new n-grams/shingles — realistic new content, not 10 copies);
    embeddings' replicas perturb each component deterministically. All
    other tables are byte-copied (they are not what the stressed
    queries scale on)."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f".built_x{mult}")
    if os.path.exists(marker):
        return
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events",
    ):
        shutil.copyfile(
            os.path.join(SRC_SF, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet")
        )

    docs = load_table(spark, SRC_SF, "documents")
    reps = docs.crossJoin(
        F.broadcast(
            spark.range(mult).select(F.col("id").cast("int").alias("_rep"))
        )
    )
    toks = F.split(F.col("text"), r"\s+")
    # Replica k != 0 permutes each document's tokens by a deterministic
    # (replica, token, position)-keyed hash sort. NOT a rotation — a
    # cyclic shift preserves almost every n-gram, which made every
    # replica a near-dup of its original and grew the pair graph
    # quadratically (45x candidates at 10x rows: a corpus-generator
    # artifact, not an engine property). The permutation destroys
    # cross-replica shingles while near-IDENTICAL docs within a replica
    # permute near-identically, so the corpus's internal duplicate rate
    # carries over per replica and duplicate volume scales LINEARLY —
    # the production shape.
    permuted = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.transform(
                    toks,
                    lambda t, i: F.struct(
                        F.xxhash64(F.col("_rep"), t, i).alias("h"), t.alias("t")
                    ),
                )
            ),
            lambda s: s.getField("t"),
        ),
    )
    out_docs = reps.select(
        (F.col("doc_id") + F.col("_rep").cast("long") * _OFFSET).alias("doc_id"),
        F.when(F.col("_rep") == 0, F.col("text")).otherwise(permuted).alias("text"),
        "lang",
        "source",
    )
    out_docs = out_docs.withColumn("n_chars", F.length("text").cast("long"))
    out_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = load_table(spark, SRC_SF, "embeddings")
    reps_e = emb.crossJoin(
        F.broadcast(
            spark.range(mult).select(F.col("id").cast("int").alias("_rep"))
        )
    )
    # per-replica SIGN-FLIP pattern (an isometry): pairwise cosines
    # WITHIN a replica equal the original corpus's exactly, while
    # across replicas vectors decorrelate — near-dup volume scales
    # linearly instead of every replica being a 0.999-cosine twin of
    # its original (the same generator artifact as the doc rotation).
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            * (F.lit(1) - F.lit(2) * (F.abs(F.xxhash64(F.col("_rep"), i)) % 2))
            .cast("float")
            * (
                F.lit(1.0)
                + ((F.col("_rep") * 37 + i) % 11 - 5).cast("float") * F.lit(0.013)
            ).cast("float")
        ).cast("float"),
    )
    out_emb = reps_e.select(
        (F.col("vec_id") + F.col("_rep").cast("long") * _OFFSET).alias("vec_id"),
        F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(pert).alias(
            "embedding"
        ),
        "label",
    )
    out_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    with open(marker, "w"):
        pass


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("mults", nargs="*", type=int, default=None)
    ap.add_argument(
        "--queries", default=None, help="comma-separated subset (default: all)"
    )
    ap.add_argument(
        "--warm",
        action="store_true",
        help="run each (query, size) twice, record the second (first-touch-excluded)",
    )
    args = ap.parse_args()
    mults = args.mults or [1, 3, 10]
    spark = get_spark("scale_stress")
    qs = golden.queries()
    wanted = args.queries.split(",") if args.queries else QUERIES
    names = [n for n in wanted if n in qs]

    dirs = {}
    for m in mults:
        d = os.path.join(WORK, f"x{m}")
        print(f"building x{m} corpus ...", file=sys.stderr)
        build_corpus(spark, d, m)
        dirs[m] = d

    # warmup on the smallest
    for n in names[:3]:
        try:
            run_query(qs[n], spark, dirs[mults[0]])
        except Exception:
            pass

    results: dict[str, dict[str, float]] = {}
    for m in mults:
        for n in names:
            # isolation: several golden queries persist intermediates
            # (shingle frames etc.); without clearing, a later query
            # reads an earlier query's cache and the growth exponents
            # come out NEGATIVE (measured: clusters_prop "ran" 0.5x at
            # 10x the data off the star variant's cached shingles)
            spark.catalog.clearCache()
            try:
                t = round(run_query(qs[n], spark, dirs[m]), 3)
                if args.warm:
                    # first-touch excluded: the timed run is the second
                    spark.catalog.clearCache()
                    t = round(run_query(qs[n], spark, dirs[m]), 3)
            except Exception as e:
                print(f"error {n} x{m}: {e}", file=sys.stderr)
                t = -1.0
            results.setdefault(n, {})[f"x{m}"] = t
            print(f"  x{m} {n}: {t}s", file=sys.stderr)

    lo, hi = mults[0], mults[-1]
    table = {}
    for n, r in results.items():
        t_lo, t_hi = r.get(f"x{lo}", -1), r.get(f"x{hi}", -1)
        b = (
            round(math.log(t_hi / t_lo) / math.log(hi / lo), 2)
            if t_lo > 0 and t_hi > 0 and hi > lo
            else None
        )
        table[n] = {**r, "growth_exponent": b}

    # merge into an existing same-multiplier file (subset runs add
    # families without clobbering earlier ones)
    out_path = os.path.join(_REPO, f"BENCH_scale{mults[-1]}.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f).get("queries", {})
        prev.update(table)
        table = prev
    out = {
        "metric": "scale_stress",
        "src_sf": SRC_SF,
        "multipliers": mults,
        "warm_protocol": bool(args.warm),
        "queries": table,
        "note": (
            "growth_exponent b fits t = a*n^b between the smallest and "
            "largest multiplier; b<=1 is linear-or-better. Sub-linear b "
            "is expected where a fixed-size output/top-k dominates; "
            "replicated content is rotated/perturbed so duplicate "
            "structure does not explode combinatorially."
            + (
                " warm_protocol: each (query, size) ran twice and the "
                "second run is recorded (first-touch JIT/codegen/page-"
                "cache excluded)."
                if args.warm
                else ""
            )
        ),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({n: v for n, v in table.items()}, sort_keys=True))


if __name__ == "__main__":
    main()
