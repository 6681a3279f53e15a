"""r13 unified admission state (streaming/admission_stream.py): text +
media near-dup under one epoch sequence, one commit-marker frontier,
one compactor — the crawl admission check over a single consistent
frontier."""

from __future__ import annotations

import os
import shutil

import numpy as np

from hydraide_spark.streaming.admission_stream import (
    MEDIA_HASHES_TABLE,
    MEDIA_PAIRS_TABLE,
    admission_lookup,
    admission_media_pairs,
    admission_text_pairs,
    compact_admission_state,
    make_admission_ingest,
)
from hydraide_spark.streaming.state_compact import committed_frontier

BASE = "the quick brown fox jumps over the lazy dog again and again"
SCHEMA = "doc_id long, text string, payload binary"


def _img(seed, flip=False):
    from hydraide_spark.functions.multimodal import encode_bmp

    px = (
        np.random.RandomState(seed).randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    )
    if flip:
        px[8, 8, 0] ^= 128
    return bytearray(encode_bmp(px))


def _batches():
    """Three epochs of mixed items: text twins and image twins each
    split ACROSS epochs; doc 4 is media-only (empty text), doc 2 is
    text-only (NULL payload)."""
    return [
        [(1, BASE, _img(1)), (2, "unique words one two three four", None)],
        [(3, BASE + " ok", None), (4, "", _img(1, flip=True))],
        [(5, BASE, _img(9))],
    ]


def test_admission_equals_single_modality_loops(spark, tmp_path):
    """The combined loop's text pairs == the text-only loop's over the
    same batches, and its media pairs == the media-only loop's — the
    equivalence pin for folding media into the shared frontier."""
    from hydraide_spark.streaming.dedup_stream import make_ingest
    from hydraide_spark.streaming.media_stream import make_media_ingest
    from hydraide_spark.streaming import ingested_pairs, media_pairs

    batches = _batches()
    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    for e, rows in enumerate(batches):
        ingest(spark.createDataFrame(rows, SCHEMA), e)

    t_state = str(tmp_path / "text_only")
    t_ingest = make_ingest(spark, t_state, tau=0.6)
    m_state = str(tmp_path / "media_only")
    m_ingest = make_media_ingest(spark, m_state, kind="image")
    for e, rows in enumerate(batches):
        df = spark.createDataFrame(rows, SCHEMA)
        t_ingest(
            df.filter("text IS NOT NULL AND length(text) > 0").select(
                "doc_id", "text"
            ),
            e,
        )
        m_ingest(
            df.filter("payload IS NOT NULL").select(
                df.doc_id.alias("media_id"), "payload"
            ),
            e,
        )

    text_pairs = {
        (r.id_a, r.id_b)
        for r in admission_text_pairs(spark, state).collect()
    }
    assert text_pairs == {
        (r.id_a, r.id_b) for r in ingested_pairs(spark, t_state).collect()
    }
    assert text_pairs == {(1, 3), (1, 5), (3, 5)}
    mpairs = {
        (r.id_a, r.id_b)
        for r in admission_media_pairs(spark, state).collect()
    }
    assert mpairs == {
        (r.id_a, r.id_b) for r in media_pairs(spark, m_state).collect()
    }
    assert mpairs == {(1, 4)}


def test_admission_partial_epoch_invisible_across_modalities(spark, tmp_path):
    """Crash mid-batch leaves the WHOLE epoch — both modalities —
    invisible: epoch 1's text tables landed but the media index and
    the marker didn't; neither the text pairs nor any epoch-1 media
    may surface until the retry re-marks."""
    batches = _batches()
    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    ingest(spark.createDataFrame(batches[0], SCHEMA), 0)
    ingest(spark.createDataFrame(batches[1], SCHEMA), 1)
    # roll back the crash window: marker + media tables' epoch 1 gone,
    # text tables' epoch 1 stays on disk
    os.remove(os.path.join(state, "_commits", "epoch=1"))
    for t in (MEDIA_HASHES_TABLE, MEDIA_PAIRS_TABLE):
        shutil.rmtree(os.path.join(state, t, "epoch=1"))

    assert committed_frontier(state) == [-1, 0]
    assert admission_text_pairs(spark, state).count() == 0  # (1,3) hidden
    assert {(r.id_a, r.id_b) for r in admission_media_pairs(spark, state).collect()} == set()

    # the serving check probes only the committed frontier: a text twin
    # of BASE matches doc 1 only; doc 4's twin image matches doc 1's
    probe = spark.createDataFrame(
        [(100, BASE + " okay", _img(1, flip=True))], SCHEMA
    )
    th, mh = admission_lookup(spark, state, probe, tau=0.6)
    assert {r.match_id for r in th.collect()} == {1}
    assert {r.media_id for r in mh.collect()} == {1}

    ingest(spark.createDataFrame(batches[1], SCHEMA), 1)  # retry republishes
    assert committed_frontier(state) == [-1, 0, 1]
    assert {(r.id_a, r.id_b) for r in admission_text_pairs(spark, state).collect()} == {(1, 3)}
    assert {(r.id_a, r.id_b) for r in admission_media_pairs(spark, state).collect()} == {(1, 4)}
    th, mh = admission_lookup(spark, state, probe, tau=0.6)
    assert {r.match_id for r in th.collect()} == {1, 3}
    assert {r.media_id for r in mh.collect()} == {1, 4}


def test_one_compactor_covers_all_five_tables(spark, tmp_path):
    """compact_admission_state folds text, media AND exact-bloom tables
    in one call,
    prunes markers against the union of live epochs (a text-only prune
    would vanish media epochs), and the loop + lookups keep working on
    the compacted state."""
    batches = _batches()
    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    for e, rows in enumerate(batches):
        ingest(spark.createDataFrame(rows, SCHEMA), e)
    t_before = {(r.id_a, r.id_b) for r in admission_text_pairs(spark, state).collect()}
    m_before = {(r.id_a, r.id_b) for r in admission_media_pairs(spark, state).collect()}

    folded = compact_admission_state(spark, state)
    from hydraide_spark.streaming.admission_stream import EXACT_BLOOM_TABLE

    assert set(folded) == {
        "pairs", "bands", "shingles",
        MEDIA_PAIRS_TABLE, MEDIA_HASHES_TABLE, EXACT_BLOOM_TABLE,
    }
    assert {(r.id_a, r.id_b) for r in admission_text_pairs(spark, state).collect()} == t_before
    assert {(r.id_a, r.id_b) for r in admission_media_pairs(spark, state).collect()} == m_before
    # markers pruned to live epochs only (union across all tables)
    live = set()
    for t in ("pairs", "bands", "shingles", MEDIA_PAIRS_TABLE, MEDIA_HASHES_TABLE):
        d = os.path.join(state, t)
        if os.path.isdir(d):
            live |= {
                int(n.split("=", 1)[1])
                for n in os.listdir(d)
                if n.startswith("epoch=")
            }
    assert set(committed_frontier(state)) - {-1} <= live
    # continue ingesting: a new doc pairs against the folded base in
    # BOTH modalities
    ingest(
        spark.createDataFrame([(9, BASE + " yes", _img(9, flip=True))], SCHEMA),
        3,
    )
    t_after = {(r.id_a, r.id_b) for r in admission_text_pairs(spark, state).collect()}
    m_after = {(r.id_a, r.id_b) for r in admission_media_pairs(spark, state).collect()}
    assert {(1, 9), (3, 9), (5, 9)} <= t_after
    assert (5, 9) in m_after


def test_admission_exact_bloom_fast_path(spark, tmp_path):
    """The exact-text fast path: 0 is DEFINITIVE never-seen (admit
    without touching the near-dup index), 1 for every byte-identical
    re-submission; the bloom rides the SAME epoch marker (a crashed
    epoch's words are invisible), and compaction collapses the word
    history to one row per word with identical probe results."""
    import os

    from hydraide_spark.streaming.admission_stream import (
        EXACT_BLOOM_TABLE,
        admission_exact_seen,
    )

    batches = _batches()
    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    for e, rows in enumerate(batches):
        ingest(spark.createDataFrame(rows, SCHEMA), e)

    probe = spark.createDataFrame(
        [
            (200, BASE, None),                     # byte-identical to doc 1/5
            (201, "unique words one two three four", None),  # == doc 2
            (202, "never before seen text entirely", None),  # fresh
        ],
        SCHEMA,
    )
    got = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe).collect()
    }
    assert got == {200: 1, 201: 1, 202: 0}

    # crash window: epoch 2's bloom words exist but the marker doesn't
    # -> its texts must NOT probe as seen
    os.remove(os.path.join(state, "_commits", "epoch=2"))
    probe5 = spark.createDataFrame([(300, BASE, None)], SCHEMA)
    # BASE was ingested in epochs 0 AND 2; epoch 0 still committed -> 1
    got = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe5).collect()
    }
    assert got == {300: 1}
    # a text ONLY in the uncommitted epoch 2... all epoch-2 texts are
    # near-dups of earlier ones except none unique; re-mark and move on
    ingest(spark.createDataFrame(batches[2], SCHEMA), 2)

    # compaction collapses history; probes unchanged
    compact_admission_state(spark, state)
    got = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe).collect()
    }
    assert got == {200: 1, 201: 1, 202: 0}


def test_admission_exact_bloom_uncommitted_epoch_invisible(spark, tmp_path):
    """A text ingested ONLY in an uncommitted epoch probes 0 — the
    fast path can never claim a doc the near-dup tables don't hold."""
    import os

    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    ingest(spark.createDataFrame(_batches()[0], SCHEMA), 0)
    only_text = "solitary sentence living in epoch one alone"
    ingest(spark.createDataFrame([(7, only_text, None)], SCHEMA), 1)
    from hydraide_spark.streaming.admission_stream import admission_exact_seen

    probe = spark.createDataFrame([(400, only_text, None)], SCHEMA)
    assert {
        r.exact_seen for r in admission_exact_seen(spark, state, probe).collect()
    } == {1}
    os.remove(os.path.join(state, "_commits", "epoch=1"))
    assert {
        r.exact_seen for r in admission_exact_seen(spark, state, probe).collect()
    } == {0}


def test_bloom_geometry_manifest_round_trip_and_mismatch(spark, tmp_path):
    """r14 ADVICE: (n_bits, k) persist with the exact_bloom table. A
    probe with no explicit parameters uses the STORED geometry (so a
    non-default ingest still probes correctly); explicit mismatching
    parameters raise instead of silently producing false negatives;
    and a second ingest configured differently raises too."""
    import pytest

    from hydraide_spark.streaming.admission_stream import (
        admission_exact_seen,
        read_bloom_geometry,
    )

    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(
        spark, state, tau=0.6, exact_bloom_bits=1 << 14, exact_bloom_k=6
    )
    ingest(spark.createDataFrame(_batches()[0], SCHEMA), 0)
    assert read_bloom_geometry(state) == (1 << 14, 6)

    # default-parameter probe resolves the stored geometry: the
    # byte-identical text is seen, the fresh one definitively not
    probe = spark.createDataFrame(
        [(200, BASE, None), (201, "never seen text entirely fresh", None)],
        SCHEMA,
    )
    got = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe).collect()
    }
    assert got == {200: 1, 201: 0}

    with pytest.raises(ValueError, match="geometry mismatch"):
        admission_exact_seen(spark, state, probe, exact_bloom_bits=1 << 20)
    with pytest.raises(ValueError, match="geometry mismatch"):
        admission_exact_seen(spark, state, probe, exact_bloom_k=4)
    # matching explicit values are fine
    assert (
        admission_exact_seen(
            spark, state, probe, exact_bloom_bits=1 << 14, exact_bloom_k=6
        ).count()
        == 2
    )

    bad_ingest = make_admission_ingest(spark, state, tau=0.6)  # defaults
    with pytest.raises(ValueError, match="geometry mismatch"):
        bad_ingest(spark.createDataFrame(_batches()[1], SCHEMA), 1)


def test_bloom_geometry_first_write_race_is_exclusive(tmp_path, monkeypatch):
    """r15 ADVICE regression: two concurrent FIRST-TIME ingests with
    different geometries must not last-writer-wins. The loser — whose
    pre-check raced past before the winner published — must fail
    loudly on publish (os.link is create-if-absent), and a matching
    loser must no-op. No stray tmp files either way."""
    import os

    import pytest

    import hydraide_spark.streaming.admission_stream as adm

    state = str(tmp_path / "adm")
    adm._write_bloom_geometry(state, 1 << 14, 6)  # the winner

    # the loser's pre-publish existence check already returned None
    # (it raced past before the winner's os.link) — replay that by
    # making the FIRST read see no manifest, later reads the truth
    real = adm.read_bloom_geometry
    calls = {"n": 0}

    def flaky(state_dir):
        calls["n"] += 1
        return None if calls["n"] == 1 else real(state_dir)

    monkeypatch.setattr(adm, "read_bloom_geometry", flaky)
    with pytest.raises(ValueError, match="geometry mismatch"):
        adm._write_bloom_geometry(state, 1 << 20, 4)
    assert real(state) == (1 << 14, 6)  # winner's manifest intact

    calls["n"] = 0  # a racing loser with MATCHING geometry is a no-op
    adm._write_bloom_geometry(state, 1 << 14, 6)
    assert real(state) == (1 << 14, 6)

    d = os.path.join(state, adm.EXACT_BLOOM_TABLE)
    assert [f for f in os.listdir(d) if f.startswith(".tmp-")] == []


def test_exact_seen_media_only_items_get_a_row(spark, tmp_path):
    """r14 ADVICE: items with NULL/empty text (media-only) must return
    exact_seen=0, not vanish — a caller iterating the result to admit
    docs needs a decision for EVERY input id."""
    from hydraide_spark.streaming.admission_stream import admission_exact_seen

    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    for e, rows in enumerate(_batches()):
        ingest(spark.createDataFrame(rows, SCHEMA), e)

    probe = spark.createDataFrame(
        [
            (500, BASE, None),          # seen text
            (501, None, _img(1)),       # media-only: NULL text
            (502, "", _img(2)),         # media-only: empty text
        ],
        SCHEMA,
    )
    got = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe).collect()
    }
    assert got == {500: 1, 501: 0, 502: 0}


def test_tiered_compaction_collapses_bloom_words(spark, tmp_path):
    """r14 ADVICE: the tiered path must apply the bit_or collapse at
    minor AND major folds — after compaction no word may appear more
    than once per folded dir, and probes are unchanged."""
    import os

    from hydraide_spark.streaming.admission_stream import (
        EXACT_BLOOM_TABLE,
        admission_exact_seen,
    )

    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    texts = [f"document number {i} with some shared words" for i in range(8)]
    for e, t in enumerate(texts):
        ingest(spark.createDataFrame([(e, t, None)], SCHEMA), e)

    probe = spark.createDataFrame(
        [(900 + i, t, None) for i, t in enumerate(texts)]
        + [(999, "entirely novel text never ingested", None)],
        SCHEMA,
    )
    before = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe).collect()
    }
    assert before[999] == 0 and all(before[900 + i] == 1 for i in range(8))

    compact_admission_state(spark, state, tiered=True)
    table = os.path.join(state, EXACT_BLOOM_TABLE)
    words = spark.read.option("basePath", table).parquet(table)
    # per folded dir (base/L1 run), every word collapsed to one row
    per_dir = (
        words.groupBy("epoch", "word").count().filter("count > 1").count()
    )
    assert per_dir == 0
    after = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe).collect()
    }
    assert after == before


def test_concurrent_ingest_vs_compactor_frontier_consistent(spark, tmp_path):
    """r13 VERDICT #7: a LIVE ingest loop racing the compactor (+ its
    marker pruning) and a concurrent prober. The contract at every
    interleaving: a probe sees a COMMITTED frontier — every epoch
    whose ingest completed before the probe started must report
    exact_seen=1 for its text, and never a silent 0 (a probe that
    races a fold's directory swap may fail LOUDLY and retry — the
    session leaves ignoreMissingFiles off on purpose — but a
    successful probe is always complete). Afterwards: all texts
    visible, text pairs intact, markers pruned to live epochs only."""
    import threading
    import time

    from hydraide_spark.streaming.admission_stream import (
        admission_exact_seen,
        compact_admission_state,
        make_admission_ingest,
    )
    from hydraide_spark.streaming.state_compact import committed_frontier

    state = str(tmp_path / "adm")
    ingest = make_admission_ingest(spark, state, tau=0.6)
    n_epochs = 10
    texts = {
        e: f"unique admission document number {e} with several shared words"
        for e in range(n_epochs)
    }
    done: list[int] = []  # epochs whose ingest RETURNED (marker landed)
    errors: list[BaseException] = []
    stop = threading.Event()

    def ingester():
        # foreachBatch semantics: a failed batch is RETRIED (epoch-keyed
        # overwrite + re-mark make the retry idempotent); a probe or
        # fold racing this ingest's reads may fail it loudly once
        try:
            for e in range(n_epochs):
                for attempt in range(4):
                    try:
                        ingest(
                            spark.createDataFrame(
                                [(e, texts[e], None)], SCHEMA
                            ),
                            e,
                        )
                        break
                    except Exception:
                        if attempt == 3:
                            raise
                        time.sleep(0.05)
                done.append(e)
        except BaseException as exc:
            errors.append(exc)
        finally:
            stop.set()

    def compactor():
        # maintenance-tick semantics: a tick that loses a read race
        # with the live ingest retries next tick (crash-safety of a
        # tick dying mid-fold is pytest-covered by _recover elsewhere)
        while not stop.is_set():
            try:
                compact_admission_state(spark, state)
            except Exception:
                pass
            time.sleep(0.05)
        try:
            compact_admission_state(spark, state)
        except BaseException as exc:
            errors.append(exc)

    def prober():
        try:
            while not stop.is_set():
                known = list(done)  # snapshot BEFORE the probe starts
                if not known:
                    time.sleep(0.02)
                    continue
                probe = spark.createDataFrame(
                    [(100 + e, texts[e], None) for e in known], SCHEMA
                )
                for attempt in range(3):
                    try:
                        got = {
                            r.doc_id - 100: r.exact_seen
                            for r in admission_exact_seen(
                                spark, state, probe
                            ).collect()
                        }
                        break
                    except Exception:
                        # a fold swapped directories mid-read: loud,
                        # retryable — re-resolve the frontier fresh
                        if attempt == 2:
                            raise
                        time.sleep(0.05)
                missing = [e for e in known if got.get(e) != 1]
                assert not missing, (
                    f"completed epochs {missing} invisible to a probe "
                    f"(snapshot {known}, got {got})"
                )
        except BaseException as exc:
            errors.append(exc)

    threads = [
        threading.Thread(target=ingester),
        threading.Thread(target=compactor),
        threading.Thread(target=prober),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    # quiesced: every text visible, definitive-absence still definitive
    probe = spark.createDataFrame(
        [(100 + e, texts[e], None) for e in range(n_epochs)]
        + [(999, "entirely novel never ingested text", None)],
        SCHEMA,
    )
    got = {
        r.doc_id: r.exact_seen
        for r in admission_exact_seen(spark, state, probe).collect()
    }
    assert got[999] == 0
    assert all(got[100 + e] == 1 for e in range(n_epochs)), got
    # markers consistent with live epoch dirs (pruning never dropped a
    # marker for an epoch some table still holds)
    import os

    live = set()
    for tname in os.listdir(state):
        d = os.path.join(state, tname)
        if tname.startswith(("_", ".")) or not os.path.isdir(d):
            continue
        live |= {
            int(x.split("=", 1)[1])
            for x in os.listdir(d)
            if x.startswith("epoch=") and x.split("=", 1)[1].lstrip("-").isdigit()
        }
    assert set(committed_frontier(state)) - {-1} <= live


def test_prune_never_drops_a_marker_landing_mid_prune(tmp_path, monkeypatch):
    """Deterministic pin of the r14 prune-ordering fix: an ingest that
    lands its table dirs + marker BETWEEN the pruner's live-epoch
    listing and its marker listing must keep its marker (the old
    tables-first order pruned the fresh marker — a committed epoch
    invisible until the next full fold). Simulated by injecting the
    ingest inside the first table-dir listdir."""
    import os as _os

    from hydraide_spark.streaming import state_compact as sc_mod
    from hydraide_spark.streaming.state_compact import (
        committed_frontier,
        prune_stale_markers,
        publish_epoch_marker,
    )

    state = tmp_path / "st"
    (state / "pairs" / "epoch=-1").mkdir(parents=True)
    publish_epoch_marker(str(state), 0)  # stale: no table holds epoch 0

    real_listdir = _os.listdir
    planted = {"done": False}

    def listdir(p):
        out = real_listdir(p)
        if not planted["done"] and str(p).replace("\\", "/").endswith("/pairs"):
            planted["done"] = True
            # the concurrent ingest: table dirs FIRST, then the marker
            _os.makedirs(state / "pairs" / "epoch=1")
            publish_epoch_marker(str(state), 1)
        return out

    monkeypatch.setattr(sc_mod.os, "listdir", listdir)
    removed = prune_stale_markers(str(state))
    monkeypatch.setattr(sc_mod.os, "listdir", real_listdir)
    assert planted["done"], "injection never fired — test setup broken"
    assert removed == 1  # only the genuinely stale epoch 0
    assert committed_frontier(str(state)) == [-1, 1]
