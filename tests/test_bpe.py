"""BPE learning (pipeline/bpe.py) vs an independent pure-Python
implementation of the published algorithm (Sennrich et al. 2016),
including the apply-side fold."""

import collections

import pytest

from crawler_ai_spark.pipeline import bpe as B

TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest new new",
    None,
]


def _py_learn(n_merges):
    vocab = collections.Counter()
    for t in TEXTS:
        for w in (t or "").lower().split():
            vocab[w] += 1
    seg = {w: " " + " ".join(w) + " </w> " for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, s in seg.items():
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        seg = {w: s.replace(f" {l} {r} ", f" {l}{r} ") for w, s in seg.items()}
    return merges, seg


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )


def test_learn_merges_matches_reference(docs_df):
    merges, segged = B.learn_merges(docs_df, 6)
    exp_merges, exp_seg = _py_learn(6)
    assert merges == exp_merges
    got = {r.word: r.seg for r in segged.collect()}
    assert got == exp_seg
    # the classic outcome on this corpus: 'est</w>' forms within 6 merges
    assert any(l + r == "est</w>" for l, r, _ in merges)


def test_apply_merges_matches_learning(docs_df, spark):
    merges, segged = B.learn_merges(docs_df, 6)
    words = segged.select("word")
    applied = {r.word: r.seg for r in B.apply_merges(words, [(l, r) for l, r, _ in merges]).collect()}
    learned = {r.word: r.seg for r in segged.collect()}
    assert applied == learned
    # unseen word segments with learned units only
    new = spark.createDataFrame([("lowest",)], ["word"])
    row = B.apply_merges(new, [(l, r) for l, r, _ in merges]).collect()[0]
    assert "".join(row.pieces) == "lowest</w>"
