"""Property tests for the corpus-curation operators (pipeline/corpus.py).

The DuckDB oracles in the catalog pin exact values; these tests pin the
SEMANTICS on hand-built corpora where the right answer is obvious:
boilerplate removal drops exactly the shared lines, decontamination flags
exactly the overlapping docs, repetition metrics fire on a repeated
phrase, and stratified sampling is deterministic with sane per-band rates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawler_ai_spark.pipeline import corpus as CP

BOILER = "subscribe to our newsletter follow us on twitter"  # 8 tokens
UNIQ = [
    "quarterly revenue grew nine percent over the prior fiscal year period",
    "the museum opened a new wing devoted to maritime history exhibits",
    "researchers described a novel catalyst for ammonia synthesis at low pressure",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BOILER + " " + UNIQ[0]),
        (1, BOILER + " " + UNIQ[1]),
        (2, UNIQ[2]),
        (3, BOILER),  # fully boilerplate
        (4, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_shared_lines_only(docs):
    out = {r["doc_id"]: r for r in CP.line_dedup(docs).collect()}
    assert len(out) == 5
    # shared 8-token boilerplate line removed wherever it occurs
    for d in (0, 1):
        assert not out[d]["clean_text"].startswith("subscribe")
        assert out[d]["n_removed"] == 1
    # unique content untouched (modulo normalization)
    assert out[2]["clean_text"] == UNIQ[2].lower()
    assert out[2]["n_removed"] == 0
    # fully-boilerplate doc survives as an empty row, not a dropped row
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 1
    assert out[4]["n_lines"] == 0 and out[4]["clean_text"] == ""
    # survivors keep their original order
    assert out[0]["clean_text"].startswith("quarterly revenue")


def test_line_dedup_min_df_threshold(docs):
    # min_df=3: the boilerplate line appears in 3 docs -> still removed;
    # raise to 4 and nothing qualifies.
    out3 = {r["doc_id"]: r["n_removed"] for r in CP.line_dedup(docs, min_df=3).collect()}
    assert out3[0] == 1
    out4 = {r["doc_id"]: r["n_removed"] for r in CP.line_dedup(docs, min_df=4).collect()}
    assert all(v == 0 for v in out4.values())


def test_decontaminate_flags_overlap(spark, docs):
    bench = spark.createDataFrame([(BOILER,)], "gram string")
    out = {r["doc_id"]: r for r in CP.decontaminate(docs, bench).collect()}
    assert out[0]["contaminated"] and out[1]["contaminated"] and out[3]["contaminated"]
    assert not out[2]["contaminated"] and not out[4]["contaminated"]
    # doc 3 is exactly the benchmark gram (8 tokens -> one window)
    assert out[3]["n_hits"] == 1


def test_decontaminate_short_doc_whole_text_gram(spark):
    # sub-n docs contribute their whole text as one gram
    docs = spark.createDataFrame([(0, "tiny doc")], "doc_id long, text string")
    bench = spark.createDataFrame([("tiny doc",)], "gram string")
    row = CP.decontaminate(docs, bench).collect()[0]
    assert row["contaminated"] and row["n_hits"] == 1


def test_repetition_metrics(spark):
    phrase = "the quick brown fox jumps over the lazy"  # 8 tokens
    rows = [(0, (phrase + " ") * 6), (1, " ".join(UNIQ))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {row["doc_id"]: row for row in CP.repetition_metrics(docs).collect()}
    assert out[0]["repetitive"] and out[0]["dup_line_ratio"] > 0.8
    assert not out[1]["repetitive"]
    assert out[1]["dup_line_ratio"] == 0.0
    # 'the' appears twice per phrase -> 'the lazy'/'lazy the' repeats
    assert out[0]["top_bigram_ratio"] > out[1]["top_bigram_ratio"]


def test_source_rollup_tiers(spark):
    # 3 sources with obvious verdicts: clean prose -> full; half the docs
    # sharing one template -> dup_rate 0.5 > 0.2 -> half; short garbage
    # -> mean quality ~0.3 -> eighth
    rows = []
    for i in range(20):
        rows.append((i, "good", "the quick brown fox jumps over a lazy dog near " + str(i)))
        rows.append((100 + i, "dupy", "identical press release body" if i < 10 else "unique filler text number " + str(i)))
        rows.append((200 + i, "junk", "zz " + str(i)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in CP.source_rollup(docs).collect()}
    assert out["good"]["tier"] == "full" and out["good"]["dup_rate"] == 0.0
    assert out["dupy"]["tier"] == "half" and abs(out["dupy"]["dup_rate"] - 0.45) < 0.01
    assert out["junk"]["tier"] == "eighth"
    assert out["good"]["n_docs"] == 20 and out["good"]["tokens_total"] == 220


def test_source_filter_rates_and_determinism(spark):
    n = 2000
    rows = [(i, "s" + str(i % 3), "text " + str(i)) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rollup = spark.createDataFrame(
        [("s0", "full"), ("s1", "half"), ("s2", "eighth")], "source string, tier string"
    )
    a = CP.source_filter(docs, rollup).collect()
    b = CP.source_filter(docs, rollup).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    by_tier = {}
    for r in a:
        by_tier.setdefault(r["tier"], []).append(r["doc_id"])
    assert len(by_tier["full"]) == (n + 2) // 3  # every full doc kept
    assert 0.40 <= len(by_tier["half"]) / (n // 3) <= 0.60
    assert 0.07 <= len(by_tier["eighth"]) / (n // 3) <= 0.18


def test_incremental_ingest_gates(spark):
    existing = spark.createDataFrame(
        [(0, "alpha beta gamma"), (2, "delta epsilon zeta")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),       # known -> not new
            (3, "ALPHA   beta GAMMA"),     # known after normalization -> not new
            (5, "eta theta iota"),         # fresh, first in batch -> new
            (7, "eta theta iota"),         # within-batch dup -> not new
            (9, "kappa lambda mu"),        # fresh -> new
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["is_new"] for r in CP.incremental_ingest(incoming, existing).collect()}
    assert out == {1: False, 3: False, 5: True, 7: False, 9: True}


def test_pack_sequences_manifest_invariants(spark):
    # docs of 5,9,2 tokens (+1 EOD each) packed into 8-token windows:
    # stream = [0,6) [6,16) [16,19) over windows [0,8) [8,16) [16,24)
    rows = [
        (0, "s", "a b c d e"),
        (1, "s", "f g h i j k l m n"),
        (2, "s", "o p"),
        (3, "t", "x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = CP.pack_sequences(docs, window=8).collect()
    got = {
        (r["source"], r["window_id"], r["doc_id"]): (
            r["doc_from"], r["doc_to"], r["global_offset"])
        for r in out
    }
    assert got == {
        ("s", 0, 0): (0, 6, 0),      # doc0 fully in window 0
        ("s", 0, 1): (0, 2, 6),      # doc1 head fills window 0
        ("s", 1, 1): (2, 10, 6),     # doc1 middle fills window 1
        ("s", 2, 2): (0, 3, 16),     # doc2 (+EOD) starts window 2
        ("t", 0, 3): (0, 4, 0),      # second shard restarts at offset 0
    }
    # invariant: every window except a shard's last is exactly full
    fill = {}
    for (src, w, _), (a, b, _o) in got.items():
        fill[(src, w)] = fill.get((src, w), 0) + (b - a)
    for (src, w), tot in fill.items():
        last = max(k[1] for k in fill if k[0] == src)
        assert tot == 8 or w == last, (src, w, tot)


def test_pack_windows_materializes_the_manifest(spark):
    # same stream as the manifest test: every window's text is the exact
    # token range, EOD separators included, docs reassembled in order
    rows = [
        (0, "s", "a b c d e"),
        (1, "s", "f g h i j k l m n"),
        (2, "s", "o p"),
        (3, "t", "x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = CP.pack_windows(docs, window=8).collect()
    got = {(r["source"], r["window_id"]): (r["window_text"], r["n_tokens"]) for r in out}
    E = CP.EOD_TOKEN
    assert got == {
        ("s", 0): (f"a b c d e {E} f g", 8),
        ("s", 1): (f"h i j k l m n {E}", 8),
        ("s", 2): (f"o p {E}", 3),
        ("t", 0): (f"x y z {E}", 4),
    }


def test_shuffle_shards_deterministic_stable_balanced(spark):
    docs = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    a = CP.shuffle_shards(docs).collect()
    b = CP.shuffle_shards(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard, keymap = {}, {}
    for r in a:
        by_shard.setdefault(r["shard_id"], []).append(r["position"])
        keymap[r["doc_id"]] = (r["shard_id"], r["shuffle_key"])
    # positions are a contiguous 1..n ranking per shard
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # all shards live, roughly uniform (md5 keyspace: ~50/shard at n=400)
    assert set(by_shard) == set(range(CP.SHUFFLE_SHARDS))
    assert all(20 <= len(ps) <= 80 for ps in by_shard.values())
    # growth-stable: existing docs keep shard + key when the corpus grows,
    # so incremental re-shuffles never move already-written docs
    grown = spark.range(0, 800).withColumnRenamed("id", "doc_id")
    g = {
        r["doc_id"]: (r["shard_id"], r["shuffle_key"])
        for r in CP.shuffle_shards(grown).collect()
    }
    assert all(g[d] == v for d, v in keymap.items())


def test_stratified_sample_deterministic_and_banded(spark):
    n = 4000
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(i % 90 + 1))) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = CP.stratified_sample(docs).collect()
    b = CP.stratified_sample(docs).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    kept = {r["doc_id"]: r for r in a}
    # every long doc kept
    longs = [i for i in range(n) if i % 90 + 1 >= 70]
    assert all(i in kept for i in longs)
    # mid band ~1/2, short band ~1/8 (binomial tolerance)
    mids = [i for i in range(n) if 40 <= i % 90 + 1 < 70]
    shorts = [i for i in range(n) if i % 90 + 1 < 40]
    mid_rate = sum(i in kept for i in mids) / len(mids)
    short_rate = sum(i in kept for i in shorts) / len(shorts)
    assert 0.42 <= mid_rate <= 0.58
    assert 0.08 <= short_rate <= 0.17
    # bands assigned correctly
    for r in a:
        n_tok = r["doc_id"] % 90 + 1
        want = "long" if n_tok >= 70 else ("mid" if n_tok >= 40 else "short")
        assert r["bucket"] == want and r["n_tokens"] == n_tok


def test_training_manifest_capstone_invariants(spark):
    """The composed capstone (catalog corpus_training_manifest) must hold
    the packing contract end-to-end: every non-last window per shard is
    exactly PACK_WINDOW tokens, window ids are contiguous from 0, token
    counts equal the window_text token counts, and the run is
    deterministic (RNG-free shuffle key)."""
    from crawler_ai_spark.catalog import QUERIES

    q = QUERIES["corpus_training_manifest"]
    a = q(spark, "/root/testdata/sf0.001").collect()
    assert a, "capstone produced no windows"
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["window_id"])
        assert [r["window_id"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["n_tokens"] == CP.PACK_WINDOW, (shard, r["window_id"])
        for r in rows:
            assert len(r["window_text"].split(" ")) == r["n_tokens"]
    b = q(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_line_dedup_join_modes_agree(docs):
    """auto / broadcast / shuffle pick different join strategies for the
    boilerplate probe (the 100 TB size gate) but must return identical
    rows; unknown modes are rejected."""
    base = sorted(map(tuple, CP.line_dedup(docs, boiler_join="broadcast").collect()))
    for mode in ("auto", "shuffle"):
        got = sorted(map(tuple, CP.line_dedup(docs, boiler_join=mode).collect()))
        assert got == base, mode
    with pytest.raises(ValueError):
        CP.line_dedup(docs, boiler_join="bogus")


def test_repetition_empty_doc_is_not_repetitive(spark):
    """A zero-line / zero-bigram doc has NO repetition: all ratios 0.0 and
    the gate off (the ungated 1 - 0/1 form flagged every empty doc)."""
    rows = [(0, ""), (1, "   "), (2, "single")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in CP.repetition_metrics(docs).collect()}
    for i in (0, 1):
        assert out[i]["n_lines"] == 0 and out[i]["n_bigrams"] == 0
        assert out[i]["dup_line_ratio"] == 0.0
        assert out[i]["dup_bigram_ratio"] == 0.0
        assert out[i]["top_bigram_ratio"] == 0.0
        assert not out[i]["repetitive"]
    # one token: one line, zero bigrams — still nothing repeated
    assert out[2]["n_lines"] == 1 and out[2]["n_bigrams"] == 0
    assert out[2]["dup_line_ratio"] == 0.0 and not out[2]["repetitive"]


@pytest.fixture(scope="module")
def zipf_docs(spark):
    """Zipf-skewed shard layout: one hot source holding ~80% of docs with
    interleaved doc_ids, plus small tails — the case the hot-shard
    pre-split exists for."""
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for doc_id in range(60):
        src = "hot" if doc_id % 5 != 0 else f"tail{doc_id % 3}"
        n = 3 + (doc_id * 7) % 13  # varying doc lengths incl. < window
        text = " ".join(words[(doc_id + j) % len(words)] for j in range(n))
        if doc_id == 17:
            text = ""  # empty doc: contributes only its EOD token
        rows.append((doc_id, src, text))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_presplit_bitwise_matches_single_window(zipf_docs):
    """The hot-shard pre-split (contiguous doc_id-range sub-shards +
    stitched offsets) must reproduce the single-window packing output
    EXACTLY — manifest and materialized windows — on a skewed corpus,
    for strides that split mid-source, per-doc, and not at all."""
    want_seq = sorted(map(tuple, CP.pack_sequences(zipf_docs, window=16).collect()))
    want_win = sorted(map(tuple, CP.pack_windows(zipf_docs, window=16).collect()))
    assert want_seq and want_win
    for stride in (1, 7, 1000):
        got_seq = sorted(
            map(tuple, CP.pack_sequences(zipf_docs, window=16, sub_shard_docs=stride).collect())
        )
        assert got_seq == want_seq, f"manifest diverged at stride {stride}"
        got_win = sorted(
            map(tuple, CP.pack_windows(zipf_docs, window=16, sub_shard_docs=stride).collect())
        )
        assert got_win == want_win, f"windows diverged at stride {stride}"


def test_lm_bigram_score_hand_computed(spark):
    """Add-1 bigram LM on a 3-doc corpus, verified against a by-hand
    model: fluent repeated phrasing scores above a gibberish doc, and the
    numbers equal the closed-form counts."""
    import math

    from crawler_ai_spark.pipeline.corpus import lm_bigram_score

    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat ran"),
            (2, "zq xv"),
            (3, "   "),  # blank -> 0 bigrams, NULL score
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r for r in lm_bigram_score(docs).collect()}
    # corpus tokens: the(2) cat(2) sat(1) ran(1) zq(1) xv(1) -> V = 6
    # bigrams: (the,cat) x2, (cat,sat), (cat,ran), (zq,xv)
    v = 6

    def p(c12, c1):
        return (c12 + 1) / (c1 + v)

    d0 = (math.log2(p(2, 2)) + math.log2(p(1, 2))) / 2
    d2 = math.log2(p(1, 1))
    assert got[0].n_bigrams == 2 and abs(got[0].lm_score - round(d0, 4)) < 1e-9
    assert got[1].n_bigrams == 2 and got[1].lm_score == got[0].lm_score
    assert got[2].n_bigrams == 1 and abs(got[2].lm_score - round(d2, 4)) < 1e-9
    assert got[3].n_bigrams == 0 and got[3].lm_score is None
    # the curation property: in-distribution text outscores one-off junk
    assert got[0].lm_score > got[2].lm_score


def test_c4_line_columns(spark):
    from crawler_ai_spark.pipeline.corpus import c4_line_columns
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            # 2 kept lines, 4 sentences -> keep
            (0, "One two three four five.\nshort.\nSix seven eight nine? "
                "Ten eleven twelve thirteen! And one more here."),
            # kept lines but lorem -> drop
            (1, "One two three four five.\nSix seven eight nine ten.\n"
                "More lorem ipsum filler here now.\nAnother real sentence "
                "ends properly here."),
            # brace -> drop
            (2, "One two three four five. Six seven eight nine ten. "
                "Closing eleven twelve thirteen fourteen.\nvar x = { }"),
            # only 2 sentences kept -> drop
            (3, "One two three four five. Six seven eight nine ten.\nno end"),
        ],
        "doc_id long, text string",
    )
    cols = c4_line_columns(F.col("text"))
    got = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", cols["c4_keep"].alias("k"), cols["n_kept_lines"].alias("n"),
            cols["n_sentences"].alias("s"),
        ).collect()
    }
    assert got[0].k and got[0].n == 2 and got[0].s == 4
    assert not got[1].k  # lorem page
    assert not got[2].k  # brace page
    assert not got[3].k and got[3].s == 2


def test_sentence_span_dedup(spark):
    from crawler_ai_spark.pipeline.corpus import sentence_span_dedup

    docs = spark.createDataFrame(
        [
            (0, "A one. B two. C three. D zero four."),
            (1, "A one. B two. C three. D one four."),  # shares span 0
            (2, "Tiny. Doc."),  # < 3 sentences -> no spans
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_pos): r.is_kept
        for r in sentence_span_dedup(docs).collect()
    }
    # doc 0: spans (A,B,C) and (B,C,D0) both kept (first occurrence)
    # doc 1: (A,B,C) is a duplicate of doc 0's -> dropped; its unique
    # tail span kept
    assert got == {(0, 0): True, (0, 1): True, (1, 0): False, (1, 1): True}
