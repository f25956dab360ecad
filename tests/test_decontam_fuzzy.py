"""Fuzzy benchmark decontamination (corpus.decontaminate_fuzzy)."""

from crawler_ai_spark.pipeline.corpus import decontaminate_fuzzy


def test_flags_near_copies_not_distinct_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),   # exact
            (1, "the quick brown fox jumps over the lazy dog"),          # near
            (2, "completely different content about spark tables here"), # clean
            (3, "quick brown fox"),                                      # tiny overlap
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_flagged, r.contaminated, r.max_jaccard)
           for r in decontaminate_fuzzy(docs, bench, threshold=0.5).collect()}
    assert got[0] == (1, True, 1.0)
    assert got[1][1] is True and 0.5 <= got[1][2] < 1.0
    assert got[2] == (0, False, None)
    assert got[3][1] is False  # 1 shared shingle of 8+1 → far below 0.5
