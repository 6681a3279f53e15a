"""Repetition-signal semantics: hand-computed counts on crafted docs,
edge cases (single token, all-identical), and the zero-shuffle plan
invariant (the operator must ride the scan stage — no Exchange)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from hydraide_spark.functions.text import repetition_signals
from hydraide_spark.plans import count_exchanges

SF_SMOKE = "/root/testdata/sf0.001"


def _signals(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = repetition_signals(df, "doc_id", "text").collect()
    return {r["doc_id"]: r.asDict() for r in rows}

def test_hand_computed_counts(spark):
    out = _signals(
        spark,
        [
            # tokens: a a b a c  -> n=5, top uni 'a'=3, dup=3
            # bigrams: 'a a','a b','b a','a c' -> all unique: top 1, dup 0
            "a a b a c",
            # 'x y x y x y' -> n=6, top uni=3, dup=6 (x:3 + y:3)
            # bigrams: 'x y' x3, 'y x' x2 -> top 3, dup 5
            "x y x y x y",
        ],
    )
    assert out[0] == {
        "doc_id": 0, "n_tokens": 5, "top_unigram_n": 3, "dup_unigram_n": 3,
        "top_bigram_n": 1, "dup_bigram_n": 0,
        # dup frac 3/5 = 0.6 <= 0.8; no bigram repeats (top=1) -> False
        "repetitive": False,
    }
    assert out[1] == {
        "doc_id": 1, "n_tokens": 6, "top_unigram_n": 3, "dup_unigram_n": 6,
        "top_bigram_n": 3, "dup_bigram_n": 5, "repetitive": True,
    }


def test_edge_cases(spark):
    out = _signals(spark, ["solo", "same same same same same", "u v w x y z"])
    # single token: no bigrams, nothing duplicated
    assert out[0] == {
        "doc_id": 0, "n_tokens": 1, "top_unigram_n": 1, "dup_unigram_n": 0,
        "top_bigram_n": 0, "dup_bigram_n": 0, "repetitive": False,
    }
    # fully repeated: everything duplicated, flag on
    assert out[1] == {
        "doc_id": 1, "n_tokens": 5, "top_unigram_n": 5, "dup_unigram_n": 5,
        "top_bigram_n": 4, "dup_bigram_n": 4, "repetitive": True,
    }
    # all distinct: no duplication anywhere, flag off
    assert out[2] == {
        "doc_id": 2, "n_tokens": 6, "top_unigram_n": 1, "dup_unigram_n": 0,
        "top_bigram_n": 1, "dup_bigram_n": 0, "repetitive": False,
    }


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b a")])
    out = repetition_signals(df, "doc_id", "text")
    assert count_exchanges(out) == 0


def test_scrub_pii_handcrafted(spark):
    from pyspark.sql import functions as F

    from hydraide_spark.functions.text import pii_count, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org now"),
            (2, "call 555-123-4567 or 555.9912-0000, not 55-123-4567"),
            (3, "host 192.168.0.1 and 10.0.0.255"),
            (4, "plain text, no pii at all"),
            (5, "x@y via 1.2.3.4"),
        ],
        "id long, t string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            scrub_pii(F.col("t")).alias("clean"),
            pii_count(F.col("t"), "email").alias("ne"),
            pii_count(F.col("t"), "phone").alias("np"),
            pii_count(F.col("t"), "ipv4").alias("ni"),
        ).collect()
    }
    assert rows[1]["clean"] == "mail <EMAIL> now" and rows[1]["ne"] == 1
    assert (
        rows[2]["clean"] == "call <PHONE> or <PHONE>, not 55-123-4567"
        and rows[2]["np"] == 2
    )
    assert rows[3]["clean"] == "host <IPV4> and <IPV4>" and rows[3]["ni"] == 2
    assert rows[4]["clean"] == "plain text, no pii at all"
    assert rows[5]["clean"] == "x@y via <IPV4>"  # no dotted TLD: not an email
    # idempotent: placeholders contain nothing scrubbabble
    again = {
        r["id"]: r["c2"]
        for r in df.select(
            "id", scrub_pii(scrub_pii(F.col("t"))).alias("c2")
        ).collect()
    }
    assert all(again[i] == rows[i]["clean"] for i in rows)


def test_top_ngrams_hand_counts_and_plan(spark):
    from hydraide_spark.functions.text import top_ngrams
    from hydraide_spark.plans import physical_plan

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b a b a b"),   # bigrams: "a b"x3, "b a"x2
            Row(doc_id=1, text="a b c"),          # "a b", "b c"
            Row(doc_id=2, text="solo"),           # too short: no bigrams
        ]
    )
    out = top_ngrams(df, "text", n=2, k=3).collect()
    assert [(r["gram"], r["n_occurrences"]) for r in out] == [
        ("a b", 4),
        ("b a", 2),
        ("b c", 1),
    ]
    # scale shape: map-side partial agg, one exchange on the gram,
    # distributed top-k (never a global sort)
    topk = top_ngrams(df, "text", n=2, k=3)
    plan = physical_plan(topk)
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert count_exchanges(topk) == 1


def test_bpe_train_merges_matches_reference_implementation(spark):
    """Spark BPE merge training must reproduce the reference algorithm
    (Sennrich et al.) exactly: argmax pair by frequency with
    lexicographic tiebreak, left-to-right non-overlapping apply."""
    from pyspark.sql import Row

    from hydraide_spark.functions.text import bpe_train_merges

    rows = [
        Row(doc_id=0, text="low low low low low"),
        Row(doc_id=1, text="lower lower"),
        Row(doc_id=2, text="newest newest newest newest newest newest"),
        Row(doc_id=3, text="widest widest widest"),
        Row(doc_id=4, text="a a a"),  # 1-char word: no pairs, must not crash
    ]
    df = spark.createDataFrame(rows)
    got = bpe_train_merges(df, n_merges=6, min_freq=2)

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 3}
    vocab = {tuple(w): c for w, c in freqs.items()}
    ref = []
    for _ in range(6):
        pc: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        mf = max(pc.values())
        if mf < 2:
            break
        p = sorted(q for q, c in pc.items() if c == mf)[0]
        ref.append((p[0], p[1], mf))
        newv: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, skip = [], False
            for i in range(len(sym)):
                if skip:
                    skip = False
                    continue
                if i < len(sym) - 1 and sym[i] == p[0] and sym[i + 1] == p[1]:
                    out.append(p[0] + p[1])
                    skip = True
                else:
                    out.append(sym[i])
            newv[tuple(out)] = newv.get(tuple(out), 0) + c
        vocab = newv
    assert got == ref


def test_quality_logit_keep_margin(spark):
    """The model-based keep decision must sit far from the boundary on
    the synthetic corpus (>= 1.7 verified across sfs) — a near-zero
    logit would make keep engine-dependent."""
    from hydraide_spark.functions.text import quality_logit
    from hydraide_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    m = docs.select(
        F.min(F.abs(quality_logit(F.col("text")))).alias("m")
    ).collect()[0]["m"]
    assert m >= 1.0


def test_chunk_documents_coverage_and_edges(spark):
    """Every token covered, overlap respected, short/empty docs yield
    exactly one chunk."""
    from hydraide_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10))),
            Row(doc_id=2, text="a b c"),        # shorter than one chunk
            Row(doc_id=3, text="only"),          # single token
        ]
    )
    out = chunk_documents(df, chunk_size=8, overlap=2)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["start_token"])
        for r in out.collect()
    )
    # doc 1: 10 tokens, stride 6 -> chunks at 0 and 6
    assert rows[0] == (1, 0, "w0 w1 w2 w3 w4 w5 w6 w7", 0)
    assert rows[1] == (1, 1, "w6 w7 w8 w9", 6)
    assert rows[2] == (2, 0, "a b c", 0)
    assert rows[3] == (3, 0, "only", 0)
    # coverage: union of [start, start+len) per doc == token count
    covered = {}
    for r in out.collect():
        covered.setdefault(r["doc_id"], set()).update(
            range(r["start_token"], r["start_token"] + r["n_chunk_tokens"])
        )
    assert covered[1] == set(range(10))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_quality_logit_empty_doc_is_finite(spark):
    """ADVICE r3: 0/0 -> NaN on an empty document, whose ordering/NULL
    behavior differs across engines. Denominators guard to 1, so the
    logit is a plain finite double even for '' and whitespace."""
    import math

    from hydraide_spark.functions.text import quality_logit

    df = spark.createDataFrame([("",), ("   ",), ("real text here",)], "text string")
    vals = [r["z"] for r in df.select(quality_logit(F.col("text")).alias("z")).collect()]
    assert all(v is not None and math.isfinite(v) for v in vals)


def _py_bpe(freqs: dict, n_merges: int, min_freq: int = 2):
    """Strictly sequential reference BPE (Sennrich et al.): argmax by
    (freq desc, pair lexicographic), left-to-right non-overlapping
    apply — the ground truth the batched Spark trainer must reproduce
    bit-for-bit."""
    vocab = {}
    for w, c in freqs.items():
        if c >= min_freq:
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    ref = []
    for _ in range(n_merges):
        pc = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        mf = max(pc.values())
        if mf < min_freq:
            break
        p = sorted(q for q, c in pc.items() if c == mf)[0]
        ref.append((p[0], p[1], mf))
        newv = {}
        for sym, c in vocab.items():
            out, skip = [], False
            for i in range(len(sym)):
                if skip:
                    skip = False
                    continue
                if i < len(sym) - 1 and sym[i] == p[0] and sym[i + 1] == p[1]:
                    out.append(p[0] + p[1])
                    skip = True
                else:
                    out.append(sym[i])
            newv[tuple(out)] = newv.get(tuple(out), 0) + c
        vocab = newv
    return ref


def test_bpe_batched_rounds_match_sequential_reference(spark):
    """The batched trainer's guard (symbol-disjoint + freq strictly
    above every earlier selection's created-pair bound) must make any
    batch_size produce the EXACT sequential merge list — on a random
    corpus with heavy pair-count ties and self-pairs, for 40 merges."""
    import random

    from pyspark.sql import Row

    from hydraide_spark.functions.text import bpe_train_merges

    rng = random.Random(11)
    alphabet = "abcdef"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(2, 9)))
        for _ in range(120)
    ] + ["aaaa", "abab", "bbbb"]  # forced self-overlap shapes
    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + rng.randrange(1, 9)
    rows = [Row(doc_id=i, text=" ".join([w] * c)) for i, (w, c) in enumerate(freqs.items())]
    df = spark.createDataFrame(rows)
    ref = _py_bpe(freqs, 40)
    assert len(ref) == 40  # the corpus must actually exercise 40 merges
    for bs in (1, 4, 64):
        got = bpe_train_merges(df, n_merges=40, min_freq=2, batch_size=bs)
        assert got == ref, f"batch_size={bs}"


def test_bpe_encode_matches_sequential_python_apply(spark):
    """Encode applies merges in rank order; the dependency-safe batch
    grouping (symbols disjoint AND not created by an earlier batch
    member) must equal strict sequential application even on chained
    merges like (e,r) -> (er,s) — and must cover min_freq-pruned words
    the trainer never saw."""
    from pyspark.sql import Row

    from hydraide_spark.functions.text import bpe_encode_token_counts

    rows = [
        Row(doc_id=0, text="rers rers rers"),
        Row(doc_id=1, text="zq"),  # cnt=1: pruned in training, still encoded
        Row(doc_id=2, text="ers ser"),
    ]
    df = spark.createDataFrame(rows)
    merges = [("e", "r"), ("er", "s"), ("z", "q")]  # chained + independent

    def encode(word):
        sym = list(word)
        for a, b in merges:
            out, skip = [], False
            for i in range(len(sym)):
                if skip:
                    skip = False
                    continue
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    skip = True
                else:
                    out.append(sym[i])
            sym = out
        return sym

    ref: dict[str, int] = {}
    for r in rows:
        for w in r.text.split():
            for tok in encode(w):
                ref[tok] = ref.get(tok, 0) + 1
    got = {
        r["token"]: r["n_occurrences"]
        for r in bpe_encode_token_counts(df, merges).collect()
    }
    assert got == ref
    assert "ers" in got and "zq" in got  # chain applied; pruned word encoded


def test_unigram_logprob_hand_computed_and_partition_invariant(spark):
    """avg_logprob = mean ln(c_w+1) - ln(N+V) against hand counts, and
    the sorted left-fold must make the float sum bit-identical under
    any partitioning (the pagerank determinism rule for float folds)."""
    import math
    import struct as _struct

    from pyspark.sql import Row

    from hydraide_spark.functions.text import unigram_logprob_scores

    rows = [Row(doc_id=0, text="a a b"), Row(doc_id=1, text="b c")]
    df = spark.createDataFrame(rows)
    # counts: a=2 b=2 c=1; N=5 V=3
    got = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    exp0 = (sorted_sum([math.log(3), math.log(3), math.log(3)]) / 3) - math.log(8)
    exp1 = (sorted_sum([math.log(3), math.log(2)]) / 2) - math.log(8)
    assert abs(got[0]["avg_logprob"] - exp0) < 1e-12
    assert abs(got[1]["avg_logprob"] - exp1) < 1e-12
    assert got[0]["n_tokens"] == 3 and got[1]["n_tokens"] == 2

    big_rows = [
        Row(doc_id=i, text=" ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
        for i in range(200)
    ]
    bdf = spark.createDataFrame(big_rows)
    a = {r["doc_id"]: r["sum_ln_smoothed"] for r in unigram_logprob_scores(bdf).collect()}
    b = {
        r["doc_id"]: r["sum_ln_smoothed"]
        for r in unigram_logprob_scores(bdf.repartition(17)).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert _struct.pack("d", a[k]) == _struct.pack("d", b[k]), k


def sorted_sum(xs):
    s = 0.0
    for x in sorted(xs):
        s += x
    return s


def test_bpe_batch_selection_collision_guards():
    """Symbol-CREATION collisions break the guard-bound argument
    (created-pair counts can stack on a pre-existing symbol's pairs,
    or sum across two creators), so the selection must trim the batch
    at each collision shape. No ordinary corpus reaches these branches
    (30K randomized corpora produced zero duplicate concatenations),
    so the factored-out selection helper is exercised directly with
    synthetic top-K candidate rows."""
    from hydraide_spark.functions.text import _select_round_batch

    # shape 1: candidate's symbol was minted earlier THIS batch
    # (('x','y') mints 'xy'; ('xy','z') must not join the batch)
    cands = [("x", "y", 100), ("xy", "z", 90), ("p", "q", 80)]
    stats: dict = {}
    got = _select_round_batch(cands, 0, {}, {}, set(), stats)
    assert got == [("x", "y", 100)]
    assert stats["collision_stops"] == 1

    # shape 2: two candidates minting the SAME token — created-pair
    # counts would sum across creators, breaking the max-based guard
    cands = [("x", "yz", 100), ("xy", "z", 90)]
    stats = {}
    got = _select_round_batch(cands, 0, {}, {}, set(), stats)
    assert got == [("x", "yz", 100)]
    assert stats["collision_stops"] == 1

    # shape 3: the minted token equals a symbol from an earlier ROUND —
    # pre-existing pairs around it gain count on top of their current
    # frequency, so the batch ends WITH the colliding pair
    cands = [("a", "bc", 100), ("p", "q", 90)]
    stats = {}
    got = _select_round_batch(cands, 0, {}, {}, {"abc"}, stats)
    assert got == [("a", "bc", 100)]
    assert stats["collision_stops"] == 1

    # control: none of the shapes -> both disjoint candidates batch
    got = _select_round_batch(
        [("x", "y", 100), ("p", "q", 90)], 0, {}, {}, set(), None
    )
    assert got == [("x", "y", 100), ("p", "q", 90)]


def test_bpe_batched_rounds_exact_on_tiny_alphabet(spark):
    """Tie-heavy 2-letter corpora (constant symbol sharing, self-pairs,
    chained creations) must keep every batch size exact vs the
    sequential reference."""
    import random

    from pyspark.sql import Row

    from hydraide_spark.functions.text import bpe_train_merges

    for seed in (3, 7, 19):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("ab") for _ in range(rng.randrange(2, 11)))
            for _ in range(80)
        ]
        freqs: dict = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + rng.randrange(1, 7)
        rows = [
            Row(doc_id=i, text=" ".join([w] * c))
            for i, (w, c) in enumerate(freqs.items())
        ]
        df = spark.createDataFrame(rows)
        ref = _py_bpe(freqs, 30)
        got = bpe_train_merges(df, n_merges=30, min_freq=2, batch_size=64)
        assert got == ref, f"seed={seed}"


def test_bpe_local_trainer_matches_spark_and_reference(spark):
    """The driver-side trainer must be bit-identical to both the pure
    sequential reference and the batched Spark rounds — same corpus
    family as the batching test (tie-heavy, self-pairs), plus the
    tiny-alphabet collision corpus."""
    import random

    from pyspark.sql import Row

    from hydraide_spark.functions.text import (
        bpe_train_merges,
        bpe_train_merges_local,
    )

    for seed, alphabet in ((11, "abcdef"), (7, "ab")):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(2, 9)))
            for _ in range(120)
        ] + ["aaaa", "abab", "bbbb"]
        freqs: dict = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + rng.randrange(1, 9)
        rows = [
            Row(doc_id=i, text=" ".join([w] * c))
            for i, (w, c) in enumerate(freqs.items())
        ]
        df = spark.createDataFrame(rows)
        ref = _py_bpe(freqs, 40)
        got_local = bpe_train_merges_local(df, n_merges=40, min_freq=2)
        assert got_local == ref, f"seed={seed} local-vs-reference"
        got_spark = bpe_train_merges(df, n_merges=40, min_freq=2, batch_size=64)
        assert got_local == got_spark, f"seed={seed} local-vs-spark"


def test_bpe_local_trainer_matches_spark_on_documents(spark):
    """End-to-end on the real corpus: the driver-side trainer and the
    Spark-round trainer must produce the identical merge list the
    sequential-replay SQL oracle certifies."""
    from hydraide_spark.functions.text import (
        bpe_train_merges,
        bpe_train_merges_local,
    )
    from hydraide_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    local = bpe_train_merges_local(docs, n_merges=24, min_freq=2)
    dist = bpe_train_merges(docs, n_merges=24, min_freq=2, batch_size=16)
    assert local == dist
    assert len(local) > 0


def test_bpe_local_trainer_vocab_guard(spark):
    """max_vocab is a loud guard: an over-bounded vocabulary must raise
    and name the Spark path, never silently truncate."""
    import pytest
    from pyspark.sql import Row

    from hydraide_spark.functions.text import bpe_train_merges_local

    rows = [Row(doc_id=i, text=f"w{i}a w{i}a") for i in range(40)]
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="bpe_train_merges"):
        bpe_train_merges_local(df, n_merges=4, min_freq=2, max_vocab=10)


def test_bpe_merge_loop_hypothesis_vs_naive_reference():
    """Property: the incremental-pair-count + lazy-heap merge loop is
    bit-identical to the naive recount-everything reference on
    arbitrary corpora (tiny alphabets force ties, self-pairs, chained
    creations). Pure Python — no SparkSession, so hypothesis can churn
    through examples."""
    from hypothesis import given, settings, strategies as st

    from hydraide_spark.functions.text import _bpe_merge_loop

    word = st.text(alphabet="ab", min_size=1, max_size=10)
    corpus = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(corpus=corpus, n_merges=st.integers(0, 25), min_freq=st.integers(1, 3))
    def check(corpus, n_merges, min_freq):
        eligible = {w: c for w, c in corpus.items() if c >= min_freq}
        got = _bpe_merge_loop(
            [list(w) for w in eligible], list(eligible.values()), n_merges, min_freq
        )
        assert got == _py_bpe(eligible, n_merges, min_freq)

    check()


def test_rrf_fuse_hand_computed(spark):
    """RRF fusion arithmetic (Cormack et al. '09): 1/(k0+rank) summed
    in list order; docs missing from a list contribute 0 there; topk
    cuts with a deterministic id tiebreak."""
    from hydraide_spark.functions.retrieval import ranked_list, rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k0=60).collect()}
    assert out[2]["rrf"] == 1.0 / 62 + 1.0 / 61  # both lists
    assert out[1]["rrf"] == 1.0 / 61             # lexical only
    assert out[4]["rrf"] == 1.0 / 62             # dense only
    assert out[1]["rank_1"] is None and out[4]["rank_0"] is None

    # topk + tiebreak: docs 1 and 4 tie at rank-sum symmetry? no —
    # construct an exact tie: both appear in exactly one list at the
    # same rank -> equal rrf, lower doc_id wins the cut
    lex2 = spark.createDataFrame([(9, 1)], "doc_id long, rank int")
    dense2 = spark.createDataFrame([(5, 1)], "doc_id long, rank int")
    kept = rrf_fuse([lex2, dense2], k0=60, topk=1).collect()
    assert [r["doc_id"] for r in kept] == [5]

    # ranked_list: deterministic dense-rank ordering with id tiebreak
    scored = spark.createDataFrame(
        [(10, 0.5), (11, 0.9), (12, 0.9), (13, 0.1)],
        "doc_id long, score double",
    )
    rl = {r["doc_id"]: r["rank"] for r in ranked_list(scored, "doc_id", "score", topk=3).collect()}
    assert rl == {11: 1, 12: 2, 10: 3}


def test_mmr_greedy_hypothesis_vs_bruteforce():
    """_mmr_greedy must equal a transparently-written reference
    implementation on random bounded instances (ids, rels, sims)."""
    from hypothesis import given, settings, strategies as st

    from hydraide_spark.functions.retrieval import _mmr_greedy

    def ref_mmr(ids, rels, sims, k, lam):
        sel, rem = [], sorted(ids)
        while rem and len(sel) < k:
            scored = []
            for c in rem:
                pen = max((sims.get((c, s), 0.0) for s in sel), default=0.0)
                scored.append((-(lam * rels[c] - (1 - lam) * pen), c))
            scored.sort()
            sel.append(scored[0][1])
            rem.remove(scored[0][1])
        return sel

    # draw rels/sims from a SMALL grid so ties actually occur and the
    # id tiebreak is exercised
    grid = st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0])

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(2, 8),
        k=st.integers(1, 8),
        lam=st.sampled_from([0.0, 0.3, 0.5, 1.0]),
        data=st.data(),
    )
    def check(n, k, lam, data):
        ids = list(range(n))
        rels = {i: data.draw(grid) for i in ids}
        sims = {}
        for i in ids:
            for j in ids:
                if i < j:
                    s = data.draw(grid)
                    sims[(i, j)] = s
                    sims[(j, i)] = s
        assert _mmr_greedy(ids, rels, sims, k, lam) == ref_mmr(
            ids, rels, sims, k, lam
        )

    check()


def test_mmr_rerank_diversifies(spark):
    """End-to-end: with two tight clusters and lam=0.5, MMR must not
    fill the top ranks from one cluster the way pure relevance would."""
    from hydraide_spark.functions.retrieval import mmr_rerank

    # cluster A: near-identical high-rel vectors; cluster B: orthogonal,
    # slightly lower rel
    rows = [
        (1, 0.99, [1.0, 0.0, 0.01]),
        (2, 0.98, [1.0, 0.0, 0.02]),
        (3, 0.97, [1.0, 0.0, 0.03]),
        (4, 0.80, [0.0, 1.0, 0.0]),
    ]
    cand = spark.createDataFrame(
        rows, "doc_id long, rel double, embedding array<double>"
    )
    out = {r["mmr_rank"]: r["doc_id"] for r in mmr_rerank(cand, k=3).collect()}
    assert out[1] == 1           # best rel first
    assert out[2] == 4           # orthogonal doc beats near-dup 2
    assert out[3] in (2, 3)


def test_bigram_logprob_discriminates_shuffled(spark):
    """The bigram LM sees what the unigram LM cannot: a doc whose
    tokens are all corpus-common but whose TRANSITIONS are novel
    (shuffled word order) scores strictly lower than the fluent
    original, while both share the same unigram score by construction
    (same token multiset)."""
    from hydraide_spark.functions.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    fluent = "the quick fox jumps over the lazy dog " * 6
    shuffled = "fox the dog jumps lazy the over quick " * 6
    corpus = [(i, fluent) for i in range(10)] + [(100, fluent), (101, shuffled)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    bg = {r.doc_id: r.avg_logprob for r in bigram_logprob_scores(df).collect()}
    ug = {r.doc_id: r.avg_logprob for r in unigram_logprob_scores(df).collect()}
    assert bg[101] < bg[100], "shuffled transitions must score lower"
    assert abs(ug[101] - ug[100]) < 1e-9, "unigram model is blind to order"
    # docs with < 2 tokens emit no row
    tiny = spark.createDataFrame([(1, "one")], "doc_id long, text string")
    assert bigram_logprob_scores(tiny).count() == 0


# --- in-engine quality-classifier training (r13) -----------------------------


def test_logreg_gd_loop_reference_math():
    """The pure driver loop vs independently-written reference math
    (naive per-step recomputation with math ops in a DIFFERENT but
    equivalent arrangement is NOT required to match bit-for-bit — the
    loop's contract is its own fixed order — so the reference here
    checks BEHAVIOR: loss decreases and separable data separates)."""
    import math

    from hydraide_spark.functions.text import _logreg_gd_loop

    # 1-D separable: x < 0 -> label 0, x > 0 -> label 1
    feats = [(1.0, -2.0), (1.0, -1.0), (1.0, -0.5), (1.0, 0.5), (1.0, 1.0), (1.0, 2.0)]
    ys = [0, 0, 0, 1, 1, 1]

    def loss(w):
        s = 0.0
        for f, y in zip(feats, ys):
            z = w[0] * f[0] + w[1] * f[1]
            # log(1+exp(-|z|)) + max(0, -yz) form, overflow-free
            zy = z if y else -z
            s += math.log1p(math.exp(-abs(zy))) + max(0.0, -zy)
        return s

    prev = loss([0.0, 0.0])
    for iters in (5, 20, 80):
        w = _logreg_gd_loop(feats, ys, lr=1.0, iterations=iters)
        cur = loss(w)
        assert cur < prev  # GD monotone decrease checkpoints
        prev = cur
    w = _logreg_gd_loop(feats, ys, lr=1.0, iterations=200)
    for f, y in zip(feats, ys):
        z = w[0] * f[0] + w[1] * f[1]
        assert (z >= 0) == bool(y)  # separable data separates


def test_logreg_gd_loop_hypothesis_properties():
    """Property sweep without Spark: for random small datasets the
    loop (a) is deterministic, (b) never overflows (the two-branch
    sigmoid keeps exp's arg <= 0), (c) with label-constant data drives
    p toward that constant label."""
    from hypothesis import given, settings, strategies as st

    from hydraide_spark.functions.text import _logreg_gd_loop

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.floats(-50.0, 50.0, allow_nan=False),
                st.floats(-50.0, 50.0, allow_nan=False),
            ),
            min_size=2,
            max_size=12,
        ),
        st.lists(st.integers(0, 1), min_size=2, max_size=12),
    )
    def run(xs, ys):
        n = min(len(xs), len(ys))
        feats = [(1.0, a, b) for a, b in xs[:n]]
        labels = ys[:n]
        w1 = _logreg_gd_loop(feats, labels, lr=0.5, iterations=30)
        w2 = _logreg_gd_loop(feats, labels, lr=0.5, iterations=30)
        assert w1 == w2  # bit-deterministic
        assert all(abs(x) < float("inf") for x in w1)

    run()

    # label-constant: all-ones data pushes the intercept positive
    feats = [(1.0, 0.3), (1.0, -0.2), (1.0, 0.1)]
    w = _logreg_gd_loop(feats, [1, 1, 1], lr=1.0, iterations=100)
    assert w[0] > 0.5


def test_quality_train_weights_local_end_to_end(spark):
    """Spark collect path == pure loop on hand-built features, the
    trained model drops into quality_logit, and the learned rule
    (stop_ratio >= 0.1) actually classifies a held-out-style check."""
    from pyspark.sql import functions as F

    from hydraide_spark.functions.text import (
        _logreg_gd_loop,
        _quality_feature_row,
        _standardize_features,
        quality_logit,
        quality_train_weights_local,
        QUALITY_TRAIN_FEATURES,
        STOPWORDS,
        tokenize,
    )

    rows = [
        (i, ("the a of to in word" if i % 3 == 0 else "zig zag quux blorp zot nine"))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = tokenize(F.col("text"))
    labeled = df.select(
        "doc_id",
        "text",
        (
            F.lit(10) * F.size(F.filter(toks, lambda w: w.isin(STOPWORDS)))
            >= F.size(toks)
        ).cast("int").alias("label"),
    )
    model = quality_train_weights_local(labeled, "label", lr=2.0, iterations=100)
    assert set(model) == {"weights", "mean", "std"}
    assert list(model["weights"]) == list(QUALITY_TRAIN_FEATURES)

    # replicate driver-side: counts in python over the same rows
    import re

    feats, ys = [], []
    for _i, text in rows:
        tk = re.split(r"\s+", text)
        n_tok = len(tk)
        n_stop = sum(1 for w in tk if w in STOPWORDS)
        feats.append(
            _quality_feature_row(
                n_tok, n_stop, len(text),
                len(re.sub(r"[^A-Za-z]", "", text)),
                len(re.sub(r"[^0-9]", "", text)),
                len(re.sub(r"[^A-Z]", "", text)),
            )
        )
        ys.append(1 if 10 * n_stop >= n_tok else 0)
    mean, std, sf = _standardize_features(feats)
    w_ref = _logreg_gd_loop(sf, ys, lr=2.0, iterations=100)
    assert list(model["weights"].values()) == w_ref  # bit-identical

    # scoring with the trained model separates the two doc families
    scored = df.select(
        "doc_id", quality_logit(F.col("text"), weights=model).alias("z")
    ).collect()
    for r in scored:
        assert (r["z"] >= 0) == (r["doc_id"] % 3 == 0), r


def test_quality_train_rejects_oversized_and_empty(spark):
    import pytest as _pytest

    from hydraide_spark.functions.text import quality_train_weights_local

    df = spark.createDataFrame(
        [(i, "some text here", 1) for i in range(5)],
        "doc_id long, text string, label int",
    )
    with _pytest.raises(ValueError, match="max_train_docs"):
        quality_train_weights_local(df, "label", max_train_docs=3)
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with _pytest.raises(ValueError, match="empty"):
        quality_train_weights_local(empty, "label")


def test_canonical_url_rules(spark):
    """Every canonicalization rule plus the pass-through contract for
    non-http(s) inputs."""
    from pyspark.sql import functions as F

    from hydraide_spark.functions.text import canonical_url

    cases = [
        ("HTTP://WWW.Example.COM:80/A/B/#frag", "http://example.com/A/B"),
        ("https://example.com:443/", "https://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/x/?utm_source=a&b=2&a=1&fbclid=z",
         "http://example.com/x?a=1&b=2"),
        ("http://example.com/x?utm_source=a&UTM_MEDIUM=b",
         "http://example.com/x"),
        ("http://example.com///", "http://example.com/"),
        ("  http://example.com/x  ", "http://example.com/x"),
        # case-sensitive path preserved; only scheme/host lower
        ("HTTPS://HOST.com/CaseSensitive", "https://host.com/CaseSensitive"),
        # port that is NOT the scheme default stays
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://example.com:80/x", "https://example.com:80/x"),
        # non-http passes through trimmed only
        ("mailto:user@example.com", "mailto:user@example.com"),
        ("ftp://Mixed.Case/X", "ftp://Mixed.Case/X"),
        ("not a url at all", "not a url at all"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_url_dedup_report_groups(spark):
    from hydraide_spark.functions.text import url_dedup_report

    rows = [
        (1, "http://Example.com/a/"),
        (2, "http://www.example.com:80/a"),
        (3, "http://example.com/a?utm_source=x"),
        (4, "http://other.com/b?x=1&y=2"),
        (5, "http://other.com/b?y=2&x=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["canonical"]: (r["n_variants"], r["n_distinct_raw"], r["keep_id"])
        for r in url_dedup_report(df).collect()
    }
    assert got == {
        "http://example.com/a": (3, 3, 1),
        "http://other.com/b?x=1&y=2": (2, 2, 4),
    }


def test_html_main_text_rules(spark):
    """r14 html_main_text: script/style/comment content vanishes (even
    when it contains tag-looking strings), block boundaries come from
    block-level tags, link-saturated and undersized blocks drop,
    entities decode AFTER stripping (escaped markup stays text), and
    kept blocks join with newlines in document order."""
    from hydraide_spark.functions.text import html_extract_report

    cases = [
        # (html, expected_text, n_kept, n_words)
        (
            "<p>one two three four five</p><p>six seven eight nine ten</p>",
            "one two three four five\nsix seven eight nine ten",
            2,
            10,
        ),
        # exactly min_words-1 -> dropped
        ("<p>one two three four</p>", "", 0, 0),
        # link density <= 1/2 kept (2*ll <= len), saturated dropped —
        # both 5 words, so density is the only discriminator
        (
            '<p><a href="/">aa bb</a> cc dd ee</p>',  # ll=5, len=14 -> kept
            "aa bb cc dd ee",
            1,
            5,
        ),
        (
            '<p><a href="/">aa bb cc dd</a> ee</p>',  # ll=11, len=14 -> drop
            "",
            0,
            0,
        ),
        # script with fake closing tags + style + comment all vanish
        (
            '<script>x = "</p> five words here not kept";</script>'
            "<style>p { color: red }</style><!-- <p>ghost block</p> -->"
            "<p>real words survive the sweep fine</p>",
            "real words survive the sweep fine",
            1,
            6,
        ),
        # entities: decoded after stripping; &amp;lt; single-decodes
        (
            "<p>a &lt;b&gt; c &quot;d&quot; e&nbsp;f &amp;lt; g</p>",
            'a <b> c "d" e f &lt; g',
            1,
            8,
        ),
        # no block tags at all: one block
        ("plain text with no markup at all", "plain text with no markup at all", 1, 7),
        ("", "", 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, *_r) in enumerate(cases)], "doc_id long, html string"
    )
    got = {
        r.doc_id: (r.text, r.n_kept, r.n_words)
        for r in html_extract_report(df).collect()
    }
    for i, (_h, text, n_kept, n_words) in enumerate(cases):
        assert got[i] == (text, n_kept, n_words), (i, got[i])


def test_html_main_text_sentinel_reserved(spark):
    """A hostile \\x01 byte in the input cannot fake a block boundary —
    it is stripped before the tag-to-sentinel replacement."""
    from hydraide_spark.functions.text import html_extract_report

    df = spark.createDataFrame(
        [(0, "<p>alpha beta\x01gamma delta epsilon zeta</p>")],
        "doc_id long, html string",
    )
    r = html_extract_report(df).collect()[0]
    assert r.text == "alpha betagamma delta epsilon zeta"
    assert r.n_kept == 1 and r.n_words == 5


def test_warc_fields_rules(spark):
    """r14 warc_extract: Content-Length-driven payload slicing (the
    trailer never leaks), case-insensitive headers, HTTP vs non-HTTP
    payloads, missing Content-Length falls back to rest-of-record,
    absent headers come back '' and never an ANSI cast error."""
    from hydraide_spark.functions.crawl import warc_extract

    body = "<html><p>hello crawl world</p></html>"
    http = (
        "HTTP/1.1 200 OK\r\ncontent-type: text/html\r\n\r\n" + body
    )
    rec_ok = (
        "WARC/1.0\r\nwarc-type: response\r\nWARC-Target-URI: http://a.com/\r\n"
        f"Content-Length: {len(http)}\r\n\r\n{http}\r\n\r\nTRAILER"
    )
    rec_req = (
        "WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://a.com/\r\n"
        "Content-Length: 18\r\n\r\nGET / HTTP/1.1\r\n\r\n\r\n\r\njunk"
    )
    rec_nolen = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nsoftware: test-crawler"
    )
    df = spark.createDataFrame(
        [(1, rec_ok), (2, rec_req), (3, rec_nolen)], "doc_id long, record string"
    )
    got = {r.doc_id: r for r in warc_extract(df).collect()}
    r1 = got[1]
    assert r1.version == "WARC/1.0"
    assert r1.warc_type == "response"  # case-insensitive header name
    assert r1.http_status == 200
    assert r1.mime == "text/html"
    assert r1.body == body  # TRAILER excluded by the length slice
    assert r1.content_length == len(http)
    r2 = got[2]
    assert r2.warc_type == "request"
    assert r2.http_status is None and r2.mime == ""
    assert r2.body == "GET / HTTP/1.1\r\n\r\n"  # sliced to 18 bytes
    r3 = got[3]
    assert r3.warc_type == "warcinfo"
    assert r3.content_length is None
    assert r3.body == "software: test-crawler"  # no-length fallback
    assert r3.target_uri == "" and r3.http_status is None


def test_robots_rules_and_decisions(spark):
    """r14 robots.txt politeness: grouped UA blocks (consecutive UA
    lines share rules), comments/unknown keys ignored, empty Disallow
    = allow-all, exact-agent group beats '*', longest pattern wins
    with the Allow tiebreak, '*' wildcards + terminal '$' anchors,
    rule-less hosts allowed."""
    from hydraide_spark.functions.crawl import robots_allowed, robots_rules

    robots = (
        "# header comment\n"
        "User-agent: mybot\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
        "User-agent: otherbot\n"
        "User-agent: thirdbot\n"
        "Disallow: /\n"
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp/*\n"
        "Allow:\n"
        "Crawl-delay: 10\n"
    )
    df = spark.createDataFrame(
        [("example.com", robots), ("open.com", "User-agent: *\nDisallow:")],
        "host string, robots string",
    )
    rules = robots_rules(df)
    got = {
        (r.host, r.agent, r.pattern): (r.allow, r.plen)
        for r in rules.collect()
    }
    assert got == {
        ("example.com", "mybot", "/private/"): (False, 9),
        ("example.com", "mybot", "/private/ok"): (True, 11),
        ("example.com", "otherbot", "/"): (False, 1),
        ("example.com", "thirdbot", "/"): (False, 1),  # shared group
        ("example.com", "*", "/*.pdf$"): (False, 7),
        ("example.com", "*", "/tmp/*"): (False, 6),
    }

    urls = spark.createDataFrame(
        [(u,) for u in [
            "http://example.com/private/secret.html",
            "http://example.com/private/ok/page",
            "http://example.com/public/x",
            "http://example.com/doc.pdf",
            "http://example.com/doc.pdf.html",  # '$' anchor must NOT match
            "http://example.com/tmp/scratch",
            "http://open.com/anything",
            "http://nowhere.com/x",
        ]],
        "url string",
    )
    my = {r.url.split(".com")[1]: r.allowed
          for r in robots_allowed(urls, rules, "MyBot").collect()}
    assert my == {
        "/private/secret.html": False,
        "/private/ok/page": True,     # longer Allow beats Disallow
        "/public/x": True,
        "/doc.pdf": True,             # '*' group does not apply to mybot
        "/doc.pdf.html": True,
        "/tmp/scratch": True,
        "/anything": True,
        "/x": True,
    }
    rand = {r.url.split(".com")[1]: r.allowed
            for r in robots_allowed(urls, rules, "randombot").collect()}
    assert rand["/doc.pdf"] is False        # terminal '$' match
    assert rand["/doc.pdf.html"] is True    # '$' anchor holds
    assert rand["/tmp/scratch"] is False    # mid-pattern wildcard
    assert rand["/private/secret.html"] is True  # mybot group not selected


def test_robots_crlf_bodies_still_block(spark):
    """r15 ADVICE regression: robots.txt served with CRLF endings must
    parse identically to LF — pre-fix the trailing '\\r' stayed inside
    every pattern value, no rule ever matched, and every Disallow was
    silently ignored (fail-open politeness violation)."""
    from hydraide_spark.functions.crawl import robots_allowed, robots_rules

    body = "User-agent: *\r\nDisallow: /private/\r\nAllow: /private/ok\r\n"
    df = spark.createDataFrame([("x.com", body)], "host string, robots string")
    rules = robots_rules(df)
    rows = rules.collect()
    assert rows and all("\r" not in r.pattern and "\r" not in r.agent for r in rows)
    urls = spark.createDataFrame(
        [
            (1, "http://x.com/private/a"),
            (2, "http://x.com/private/ok/b"),
            (3, "http://x.com/pub"),
        ],
        "i long, url string",
    )
    got = {
        r.url.split(".com")[1]: r.allowed
        for r in robots_allowed(urls, rules, "anybot").collect()
    }
    assert got == {"/private/a": False, "/private/ok/b": True, "/pub": True}


def test_robots_crawl_delay_and_sitemaps(spark):
    """r15 Crawl-delay + Sitemap directives: per-group delays with the
    most-specific-group selection (a delay-less specific group does
    NOT fall back to '*'), invalid values ignored, fractional values
    kept, group-independent case-preserved sitemap discovery."""
    from hydraide_spark.functions.crawl import (
        robots_crawl_delay_for,
        robots_crawl_delays,
        robots_sitemaps,
    )

    bodies = [
        # specific fractional delay beats '*' delay
        ("a.com", "User-agent: mybot\nCrawl-delay: 2.5\nDisallow: /p\n"
                  "User-agent: *\nCrawl-delay: 5\n"
                  "Sitemap: https://a.com/SiteMap.XML\n"
                  "Sitemap: https://a.com/news.xml\n"
                  "Sitemap: https://a.com/SiteMap.XML"),  # dup collapses
        # delay-less specific group: '*' delay must NOT leak through
        ("b.com", "User-agent: mybot\nDisallow: /x\n"
                  "User-agent: *\nCrawl-delay: 7"),
        # invalid value ignored entirely
        ("c.com", "User-agent: *\nCrawl-delay: soon\nDisallow: /"),
        # only '*' delay -> applies to everyone
        ("d.com", "User-agent: *\nCrawl-delay: 1"),
    ]
    df = spark.createDataFrame(bodies, "host string, robots string")
    delays = robots_crawl_delays(df)
    dec = {r.host: r.crawl_delay
           for r in robots_crawl_delay_for(delays, "MyBot").collect()}
    assert dec == {"a.com": 2.5, "d.com": 1.0}  # b: no fallback; c: invalid
    maps = {(r.host, r.sitemap) for r in robots_sitemaps(df).collect()}
    assert maps == {
        ("a.com", "https://a.com/SiteMap.XML"),  # case preserved, deduped
        ("a.com", "https://a.com/news.xml"),
    }


def test_polite_fetch_schedule(spark):
    """r15: per-host rank x resolved delay; delay-less hosts use the
    default; offsets are (rank-1)*delay exactly."""
    from hydraide_spark.functions.crawl import polite_fetch_schedule

    delays = spark.createDataFrame(
        [("slow.com", 2.5)], "host string, crawl_delay double"
    )
    urls = spark.createDataFrame(
        [(u,) for u in [
            "http://slow.com/b", "http://slow.com/a", "http://slow.com/c",
            "http://fast.com/x", "http://fast.com/y",
        ]],
        "url string",
    )
    got = {
        r.url: (r.host, r.rank, r.delay_sec, r.fetch_offset_sec)
        for r in polite_fetch_schedule(urls, delays, default_delay=1.0).collect()
    }
    assert got == {
        "http://slow.com/a": ("slow.com", 1, 2.5, 0.0),
        "http://slow.com/b": ("slow.com", 2, 2.5, 2.5),
        "http://slow.com/c": ("slow.com", 3, 2.5, 5.0),
        "http://fast.com/x": ("fast.com", 1, 1.0, 0.0),
        "http://fast.com/y": ("fast.com", 2, 1.0, 1.0),
    }


# --- sitemap XML parsing (r15) -------------------------------------------------


def _sitemap_bodies(spark):
    from pyspark.sql import Row

    idx = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<sitemap><loc> https://a.com/m1.xml </loc>"
        "<lastmod>2026-01-15</lastmod></sitemap>\n"
        "<sitemap><loc>https://a.com/self.xml</loc></sitemap>\n"
        "<sitemap><loc>https://a.com/unfetched.xml</loc></sitemap>\n"
        "</sitemapindex>"
    )
    self_idx = (
        "<sitemapindex>"
        "<sitemap><loc>https://a.com/m1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    m1 = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.com/p?x=1&amp;y=2&apos;</loc>"
        "<lastmod>\n 2026-03-02 \n</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a.com/q</loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"
        "</urlset>"
    )
    return spark.createDataFrame(
        [
            Row(sitemap_url="https://a.com/sitemap.xml", xml=idx),
            Row(sitemap_url="https://a.com/self.xml", xml=self_idx),
            Row(sitemap_url="https://a.com/m1.xml", xml=m1),
            Row(sitemap_url="https://a.com/other.txt", xml="not xml at all"),
        ]
    )


def test_sitemap_entries_grammar(spark):
    from hydraide_spark.functions.crawl import sitemap_entries

    rows = {
        (r.sitemap_url, r.kind, r.ord): r
        for r in sitemap_entries(_sitemap_bodies(spark)).collect()
    }
    # index children: padded loc trimmed, lastmod carried / absent
    r1 = rows[("https://a.com/sitemap.xml", "index", 1)]
    assert r1.loc == "https://a.com/m1.xml" and r1.lastmod == "2026-01-15"
    assert rows[("https://a.com/sitemap.xml", "index", 2)].lastmod is None
    # urlset entries: entities decoded ONE level, whitespace stripped,
    # priority parsed as double, loc-less block dropped
    u1 = rows[("https://a.com/m1.xml", "urlset", 1)]
    assert u1.loc == "https://a.com/p?x=1&y=2'"
    assert u1.lastmod == "2026-03-02" and u1.priority == 0.8
    u2 = rows[("https://a.com/m1.xml", "urlset", 2)]
    assert u2.lastmod is None and u2.changefreq is None and u2.priority is None
    assert ("https://a.com/m1.xml", "urlset", 3) not in rows
    # non-sitemap body yields nothing
    assert not any(k[0] == "https://a.com/other.txt" for k in rows)


def test_sitemap_url_entries_resolution(spark):
    from hydraide_spark.functions.crawl import sitemap_url_entries

    out = sitemap_url_entries(_sitemap_bodies(spark)).collect()
    roots = {(r.root_sitemap, r.src_sitemap, r.loc) for r in out}
    # via index: m1's entries under the index root
    assert (
        "https://a.com/sitemap.xml",
        "https://a.com/m1.xml",
        "https://a.com/q",
    ) in roots
    # direct pass-through of the fetched urlset body
    assert (
        "https://a.com/m1.xml",
        "https://a.com/m1.xml",
        "https://a.com/q",
    ) in roots
    # the index->index child (self.xml) was dropped: nothing rooted at
    # sitemap.xml comes FROM self.xml, and self.xml's own children are
    # indexes too so it contributes no rows as a root either
    assert not any(r.src_sitemap == "https://a.com/self.xml" for r in out)
    # unfetched child contributes nothing
    assert not any("unfetched" in (r.src_sitemap or "") for r in out)
    # direct and via-index legs agree on the entry payload
    by_leg = {}
    for r in out:
        by_leg.setdefault(r.loc, set()).add(
            (r.lastmod, r.changefreq, r.priority)
        )
    assert all(len(v) == 1 for v in by_leg.values())


# --- CCNet line-level corpus dedup (r15) ---------------------------------------


def test_line_corpus_dedup_semantics(spark):
    from pyspark.sql import Row

    from hydraide_spark.functions.dedup import line_corpus_dedup

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="Sign in\nalpha one\n\nCopyright 2026"),
            Row(doc_id=2, text="Sign in  \nbeta two\nCopyright 2026"),
            Row(doc_id=3, text="\tSign in\ngamma three\nonly mine\nonly mine"),
            Row(doc_id=4, text=""),
        ]
    )
    out = {r.doc_id: r for r in line_corpus_dedup(docs, min_docs=3).collect()}
    # 'Sign in' appears in 3 docs under 3 whitespace paddings — ONE key
    assert out[1].clean_text == "alpha one\n\nCopyright 2026"
    assert out[1].n_removed == 1 and out[1].n_lines == 4
    # 'Copyright 2026' is only in 2 docs: below min_docs, kept
    assert "Copyright 2026" in out[2].clean_text
    # intra-doc repeat survives (distinct-doc count is 1)
    assert out[3].clean_text == "gamma three\nonly mine\nonly mine"
    # empty doc: one blank structural line, kept
    assert out[4].n_lines == 1 and out[4].n_removed == 0
    assert out[4].clean_text == ""


def test_html_link_graph_resolution(spark):
    from pyspark.sql import Row

    from hydraide_spark.functions.crawl import html_link_graph

    html = (
        '<html><body>'
        '<a href="https://b.com/abs">A</a>'
        "<a href='/root'>R</a>"
        '<a href="rel/x">REL</a>'
        '<a href="//cdn.com/c">P</a>'
        '<a href="../up">UP</a>'
        '<a rel="nofollow" href="/nf"> NF  <i>x</i> &amp; y </a>'
        '<a href="#f">drop</a><a href="JavaScript:alert(1)">drop</a>'
        '<a href="">drop</a>'
        '</body></html>'
    )
    df = spark.createDataFrame(
        [Row(url="https://a.com/d/e/page.html", html=html)]
    )
    rows = {r.dst: r for r in html_link_graph(df).collect()}
    assert set(rows) == {
        "https://b.com/abs",
        "https://a.com/root",
        "https://a.com/d/e/rel/x",
        "https://cdn.com/c",
        "https://a.com/d/e/../up",  # dot-segments documented unnormalized
        "https://a.com/nf",
    }
    assert rows["https://a.com/nf"].nofollow
    assert rows["https://a.com/nf"].anchor == "NF x & y"
    assert not rows["https://b.com/abs"].nofollow


def test_decode_legacy_bodies_split(spark):
    from pyspark.sql import Row

    from hydraide_spark.functions.crawl import decode_legacy_bodies

    sj = "こんにちは".encode("shift_jis")
    rows = [
        Row(charset="utf-8", body="native stays", body_bytes=b"native stays"),
        Row(charset="shift_jis", body="mojibake", body_bytes=sj),
        Row(charset="euc-kr", body="mojibake2",
            body_bytes="안녕".encode("euc-kr")),
        Row(charset="x-nope", body="lenient kept", body_bytes=b"whatever"),
        Row(charset="shift_jis", body="fb",
            body_bytes=b"\xff\xfe bad bytes \x81"),
    ]
    out = {
        (r.charset, bytes(r.body_bytes)): r.body
        for r in decode_legacy_bodies(spark.createDataFrame(rows)).collect()
    }
    # native and unknown-label rows keep their incoming body verbatim
    assert out[("utf-8", b"native stays")] == "native stays"
    assert out[("x-nope", b"whatever")] == "lenient kept"
    # declared legacy charsets decode for real
    assert out[("shift_jis", sj)] == "こんにちは"
    assert out[("euc-kr", "안녕".encode("euc-kr"))] == "안녕"
    # undecodable bytes under a known codec: errors='replace', no raise
    assert "�" in out[("shift_jis", b"\xff\xfe bad bytes \x81")]
