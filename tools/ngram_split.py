"""Stage-split the ngram_jaccard collapsed pipeline at sf0.1 multiples.

r15 VERDICT item 3: before touching the slowest query's shape, find
which stage dominates AT SCALE (the repo's two-point-exponent rule) —
the dfreq join, the prefix window, the self-join/distinct, or the
verify join. Times CUMULATIVE prefixes of the pipeline with the noop
sink; per-stage attribution is the successive difference. Run SOLO.

Usage: python tools/ngram_split.py [mult ...]   # default 1 10
"""
from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import Window as W, functions as F  # noqa: E402

from hydraide_spark.session import get_spark  # noqa: E402
from hydraide_spark.sources.tables import load_table  # noqa: E402
from hydraide_spark.functions.dedup import (  # noqa: E402
    _pair_jaccard_candidates,
    _verify_pair_join,
    shingles,
)

SRC = "/root/testdata/sf0.1"
WORK = os.path.join(_HERE, ".scale")


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def split(spark, sf_dir: str, reps: int = 3) -> dict:
    from hydraide_spark.golden.dedup_text import _augmented_corpus

    num, den = 3, 5  # tau = 0.6
    out: dict = {}

    def run(label, build):
        vals = []
        for _ in range(reps):
            spark.catalog.clearCache()
            vals.append(_noop(build()))
        vals.sort()
        out[label] = round(vals[len(vals) // 2], 3)

    def sizes_frame(persist=True):
        corpus = _augmented_corpus(spark, sf_dir)
        sh = corpus.select(F.col("doc_id"), shingles(F.col("text"), 3).alias("sh"))
        sizes = sh.select("doc_id", "sh", F.size("sh").alias("n_sh"))
        return sizes.persist() if persist else sizes

    def collapsed(sizes):
        keyed = sizes.filter(F.col("n_sh") > 0).select(
            F.col("doc_id"),
            F.md5(F.concat_ws("\x00", F.array_sort(F.col("sh")))).alias("_sk"),
            F.col("n_sh"),
        ).persist()
        fam = keyed.groupBy("_sk").agg(F.min("doc_id").alias("_rep"))
        reps_only = sizes.join(
            fam.select(F.col("_rep").alias("doc_id")), "doc_id", "left_semi"
        ).persist()
        return reps_only

    # 1. shingle materialization only
    run("1_sizes", lambda: sizes_frame(persist=False))

    # cumulative stages over the collapsed rep-only corpus
    def upto(stage):
        sizes = sizes_frame()
        reps_only = collapsed(sizes)
        inv = reps_only.select(
            "doc_id", "n_sh", F.explode("sh").alias("shingle")
        )
        dfreq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        if stage == "dfreq":
            return dfreq
        ranked = inv.join(dfreq, "shingle").withColumn(
            "rnk",
            F.row_number().over(W.partitionBy("doc_id").orderBy("df", "shingle")),
        )
        ceil_tau_n = F.expr(f"(n_sh * {num} + {den} - 1) div {den}")
        prefix = ranked.filter(
            F.col("rnk") <= F.col("n_sh") - ceil_tau_n + 1
        ).select("doc_id", "shingle", "n_sh", "rnk")
        if stage == "prefix":
            return prefix
        if stage == "cand":
            return _pair_jaccard_candidates(reps_only, "doc_id", "sh", num, den)
        return _verify_pair_join(
            _pair_jaccard_candidates(reps_only, "doc_id", "sh", num, den),
            reps_only, "doc_id", num, den,
        )

    run("2_collapse_reps", lambda: collapsed(sizes_frame()))
    run("3_dfreq", lambda: upto("dfreq"))
    run("4_prefix_window", lambda: upto("prefix"))
    run("5_cand_selfjoin", lambda: upto("cand"))
    run("6_verify", lambda: upto("verify"))
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(
        "ngram_split",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for m in mults:
        if m == 1:
            sf_dir = SRC
        else:
            sf_dir = os.path.join(WORK, f"x{m}")
            if not os.path.exists(os.path.join(sf_dir, f".built_x{m}")):
                sys.path.insert(0, os.path.join(_HERE, "tools"))
                from scale_stress import build_corpus

                build_corpus(spark, sf_dir, m)
                open(os.path.join(sf_dir, f".built_x{m}"), "w").close()
        spark.sparkContext.setJobDescription(f"ngram_split x{m}")
        res[f"x{m}"] = split(spark, sf_dir)
        print(json.dumps({f"x{m}": res[f"x{m}"]}))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
