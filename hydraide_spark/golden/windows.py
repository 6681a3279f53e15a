"""Golden queries: analytic window functions over the event stream and
the document corpus (SURVEY.md §2.5 — depth beyond top-k/pagination).

The reference exposes no analytic functions; its closest shapes are the
ordered-beacon walks (beacon.go:1622-1998) and the priority-queue pop
(swamp.go:2622-2684). The idiomatic Spark generalization is the window
function surface: lag/lead, ordered frames, rank families — one shuffle
on the partition key, per-partition sort, no driver involvement. All
three queries keep their arithmetic exact (integer microseconds /
DECIMAL) so the gate hash-matches the serial oracle bitwise.

Scale notes: every window here partitions by a high-cardinality key
(user_id, lang) — at 100 TB the shuffle distributes across executors
with no global sort and no skew hot-spot beyond what AQE handles; none
of the queries materializes an unbounded frame (the moving frame is 4
rows; the gap/rank windows stream in sort order).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from . import golden
from ._util import big, dbl, dec, t
from ..sources.tables import epoch_us


@golden(
    "event_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def event_interarrival_stats(spark, sf_dir):
    """Per-user inter-arrival gaps via LAG over (ts, event_id): count /
    sum / max of the microsecond deltas. Integer microseconds end to end
    (`unix_micros`), so no float drift; users with a single event emit
    no row in both engines (the lag row is filtered before the group)."""
    ev = t(spark, sf_dir, "events")
    ts_us = epoch_us(ev, "ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("sum_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    ).select(
        big("user_id").alias("user_id"), "n_gaps", big("sum_gap_us").alias("sum_gap_us"),
        big("max_gap_us").alias("max_gap_us"),
    )


@golden(
    "moving_window_sum",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_sum
    FROM events WHERE event_type = 'purchase'
    """,
)
def moving_window_sum(spark, sf_dir):
    """Ordered-frame aggregation: 4-row moving sum of purchase values per
    user. The frame is bounded ROWS (not RANGE), so execution is a
    streaming pass over each sorted partition — O(1) state per row; the
    (ts, event_id) tiebreak makes frame contents deterministic and the
    DECIMAL sum makes them bitwise-stable."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, W.currentRow)
    )
    return ev.select(
        big("event_id").alias("event_id"),
        big("user_id").alias("user_id"),
        dbl(F.sum(dec("value", scale=6)).over(w)).alias("moving_sum"),
    )


@golden(
    "quality_percentile_band",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             PERCENT_RANK() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS pr
      FROM documents
    ) WHERE pr <= 0.10
    """,
)
def quality_percentile_band(spark, sf_dir):
    """Quantile-band curation: keep the top decile of documents per
    language by a quality proxy (n_chars). percent_rank over a
    tie-broken total order is (row_number-1)/(n-1) in both engines —
    exact double equality. This is the 'keep top X% by classifier
    score per language' corpus-rebalance primitive, expressed as one
    window shuffle on the stratum key."""
    docs = t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.10)
        .select(big("doc_id").alias("doc_id"), "lang", big("n_chars").alias("n_chars"))
    )
