"""Golden queries: phrase search, geo filters, labeled search meta
(SURVEY.md §2.2 specialty predicates) over the documents table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import word_index
from ..query import And, Cmp, GeoDistance, Labeled, Op, Phrase, translate, with_search_meta
from . import golden
from ._util import big, memo_golden, t

_PHRASE = ["stream", "table", "hash"]
_PHRASE_SQL = " ".join(_PHRASE)


def _docs_with_word_index(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    wi = word_index(docs, "doc_id", "text")
    return docs.join(wi, "doc_id")


@golden(
    "phrase_match",
    oracle=f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id
    FROM documents
    WHERE contains(' ' || text || ' ', ' {_PHRASE_SQL} ')
    """,
)
def phrase_match(spark, sf_dir):
    """PhraseFilter (filter.go:562-589): all words at consecutive
    positions in the word->positions index. The engine builds the index
    (text.word_index) and evaluates consecutiveness via higher-order
    functions; the oracle reduces to a padded substring test because the
    corpus is single-space tokenized."""
    docs = _docs_with_word_index(spark, sf_dir)
    return docs.filter(translate(Phrase("word_index", _PHRASE), docs)).select(
        big("doc_id").alias("doc_id")
    )


@golden(
    "phrase_negated",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_without
    FROM documents
    WHERE lang = 'en'
      AND NOT contains(' ' || text || ' ', ' {_PHRASE_SQL} ')
    """,
)
def phrase_negated(spark, sf_dir):
    """Negated phrase + scalar pre-filter: the cheap lang predicate is
    pushed to the scan, the phrase check runs on survivors only — the
    reference's cheap-before-expensive ordering (query-engine.md:76)."""
    docs = _docs_with_word_index(spark, sf_dir)
    filt = And([Cmp("lang", Op.EQ, "en"), Phrase("word_index", _PHRASE, negate=True)])
    return docs.filter(translate(filt, docs)).agg(F.count(F.lit(1)).alias("n_without"))


# Deterministic synthetic coordinates derived from doc_id (cities grid
# around Budapest + ~3% Null Island rows) — recomputable by the oracle.
# Built lazily: Column construction needs an active SparkContext, and
# queries() must be importable before the driver opens a session.
def _geo_spark() -> dict:
    return {
        "lat": F.when(F.col("doc_id") % 37 == 0, F.lit(0.0)).otherwise(
            47.0 + (F.col("doc_id") * 3 % 100) * 0.01
        ),
        "lng": F.when(F.col("doc_id") % 37 == 0, F.lit(0.0)).otherwise(
            18.5 + (F.col("doc_id") * 7 % 120) * 0.01
        ),
    }

_GEO_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 37 = 0 THEN 0.0
                  ELSE 47.0 + (doc_id * 3 % 100) * 0.01 END AS lat,
             CASE WHEN doc_id % 37 = 0 THEN 0.0
                  ELSE 18.5 + (doc_id * 7 % 120) * 0.01 END AS lng
      FROM documents
"""

# Haversine with the same operand order as query.filters.haversine_km.
_HAV_SQL = """
      2 * 6371.0088 * atan2(
        sqrt(sin(radians(lat - {lat0}) / 2) * sin(radians(lat - {lat0}) / 2)
             + cos(radians({lat0})) * cos(radians(lat))
               * sin(radians(lng - {lng0}) / 2) * sin(radians(lng - {lng0}) / 2)),
        sqrt(1 - (sin(radians(lat - {lat0}) / 2) * sin(radians(lat - {lat0}) / 2)
             + cos(radians({lat0})) * cos(radians(lat))
               * sin(radians(lng - {lng0}) / 2) * sin(radians(lng - {lng0}) / 2))))
"""

_LAT0, _LNG0 = 47.4979, 19.0402
_HAV = _HAV_SQL.format(lat0=_LAT0, lng0=_LNG0)


def _docs_with_geo(spark, sf_dir):
    geo = _geo_spark()
    return (
        t(spark, sf_dir, "documents")
        .withColumn("lat", geo["lat"])
        .withColumn("lng", geo["lng"])
    )


@golden(
    "geo_inside",
    oracle=f"""
    WITH g AS ({_GEO_SQL})
    SELECT CAST(doc_id AS BIGINT) AS doc_id
    FROM g
    WHERE NOT (lat = 0.0 AND lng = 0.0)
      AND {_HAV} <= 30.0
    """,
)
def geo_inside(spark, sf_dir):
    """GeoDistanceFilter INSIDE (filter.go:18-56): Haversine <= 30km of
    Budapest, Null Island excluded, bbox pre-filter generated ahead of
    the trig (visible in the plan as pushable range predicates)."""
    docs = _docs_with_geo(spark, sf_dir)
    g = GeoDistance("lat", "lng", _LAT0, _LNG0, 30.0, inside=True)
    return docs.filter(translate(g, docs)).select(big("doc_id").alias("doc_id"))


@golden(
    "geo_band",
    oracle=f"""
    WITH g AS ({_GEO_SQL})
    SELECT CAST(doc_id AS BIGINT) AS doc_id
    FROM g
    WHERE NOT (lat = 0.0 AND lng = 0.0)
      AND {_HAV} > 30.0 AND {_HAV} <= 80.0
    """,
)
def geo_band(spark, sf_dir):
    """OUTSIDE 30km AND INSIDE 80km — the ring query; Null Island rows
    never match despite being far away (reference contract)."""
    docs = _docs_with_geo(spark, sf_dir)
    band = And(
        [
            GeoDistance("lat", "lng", _LAT0, _LNG0, 30.0, inside=False),
            GeoDistance("lat", "lng", _LAT0, _LNG0, 80.0, inside=True),
        ]
    )
    return docs.filter(translate(band, docs)).select(big("doc_id").alias("doc_id"))


@golden(
    "labeled_search_meta",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS ntok,
             contains(' ' || text || ' ', ' {_PHRASE_SQL} ') AS ph
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           concat_ws('|',
             CASE WHEN lang = 'en' THEN 'english' END,
             CASE WHEN ph THEN 'phrase' END,
             CASE WHEN ntok > 45 THEN 'long' END) AS matched
    FROM d WHERE lang = 'en' OR ph OR ntok > 45
    """,
)
def labeled_search_meta(spark, sf_dir):
    """Labeled filters + SearchResultMeta (filter.go:125-217): every
    labeled predicate evaluated without OR short-circuit; matched label
    set attached per row; rows with no matches dropped."""
    docs = _docs_with_word_index(spark, sf_dir).withColumn(
        "tokens", F.split(F.col("text"), " ")
    )
    labeled = [
        Labeled("english", Cmp("lang", Op.EQ, "en")),
        Labeled("phrase", Phrase("word_index", _PHRASE)),
        Labeled("long", Cmp("tokens.#len", Op.GT, 45)),
    ]
    out = with_search_meta(docs, labeled)
    return out.select(
        big("doc_id").alias("doc_id"),
        F.concat_ws("|", F.col("matched_labels")).alias("matched"),
    )


_HAV_PAIR = """
      2 * 6371.0088 * atan2(
        sqrt(sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin(radians(b.lng - a.lng) / 2) * sin(radians(b.lng - a.lng) / 2)),
        sqrt(1 - (sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin(radians(b.lng - a.lng) / 2) * sin(radians(b.lng - a.lng) / 2))))
"""


@golden(
    "geo_radius_pairs",
    oracle=f"""
    WITH g AS ({_GEO_SQL}),
    pts AS (SELECT doc_id, lat, lng FROM g WHERE NOT (lat = 0.0 AND lng = 0.0))
    SELECT CAST(a.doc_id AS BIGINT) AS id_l,
           CAST(b.doc_id AS BIGINT) AS id_r,
           round({_HAV_PAIR}, 4) AS distance_km
    FROM pts a JOIN pts b ON a.doc_id < b.doc_id
    WHERE {_HAV_PAIR} <= 5.0
    """,
)
@memo_golden("geo_radius_pairs")
def geo_radius_pairs(spark, sf_dir):
    """Spatial radius self-join (operators/spatial.py): all point pairs
    within 5 km — grid-cell blocking (3x3 neighbor equi-join, pairs
    surface exactly once after id_l < id_r canonicalization), Haversine
    verify with the reference's formula. The oracle is the O(n²)
    cross-join definition, so the gate proves blocked-route ==
    brute-force-route (the reference's bucket-vs-bypass invariant on a
    spatial workload); the engine plan contains no cartesian product
    (tests/test_asof_spatial.py asserts the plan shape)."""
    from ..operators.spatial import radius_pairs

    pts = _docs_with_geo(spark, sf_dir)
    pairs = radius_pairs(pts, "doc_id", "lat", "lng", 5.0)
    return pairs.select(
        big("id_l").alias("id_l"),
        big("id_r").alias("id_r"),
        F.round("distance_km", 4).alias("distance_km"),
    )
