"""Language-mixture sampling (pipeline/corpus.py: mixture_rates /
mixture_sample): binding-language math, achieved-mixture accuracy, and
infeasible recipes. Cross-engine float identity is pinned by the
catalog's corpus_mixture_sample oracle row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, per_lang: dict[str, int], words_per_doc: int = 20):
    rows = []
    i = 0
    for lang, n in sorted(per_lang.items()):
        for _ in range(n):
            rows.append((i, lang, " ".join(f"w{i}x{k}" for k in range(words_per_doc))))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_binding_language_kept_whole(spark):
    from crawler_ai_spark.pipeline.corpus import mixture_rates

    # en has 4x the tokens of vi; target 50/50 -> vi binds (T = vi/0.5),
    # vi rate 1.0, en rate = 0.5*T/avail_en = 0.25
    docs = _docs(spark, {"en": 400, "vi": 100})
    rates = {r.lang: r for r in mixture_rates(docs, {"en": 0.5, "vi": 0.5}).collect()}
    assert rates["vi"].rate == pytest.approx(1.0)
    assert rates["en"].rate == pytest.approx(0.25)
    assert rates["vi"].thr == 65536 or rates["vi"].thr == 65535


def test_achieved_mixture_near_target(spark):
    from crawler_ai_spark.pipeline.corpus import mixture_sample

    docs = _docs(spark, {"en": 600, "vi": 200, "zh": 200})
    targets = {"en": 0.5, "vi": 0.25, "zh": 0.25}
    kept = mixture_sample(docs, targets)
    tok = {
        r.lang: r.t
        for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    total = sum(tok.values())
    # md5-key sampling at a few hundred docs: within 6 points of target
    for lang, w in targets.items():
        assert abs(tok[lang] / total - w) < 0.06, (lang, tok)


def test_non_target_language_dropped(spark):
    from crawler_ai_spark.pipeline.corpus import mixture_sample

    docs = _docs(spark, {"en": 50, "de": 50})
    kept = mixture_sample(docs, {"en": 1.0})
    assert kept.where(F.col("lang") == "de").count() == 0
    assert kept.where(F.col("lang") == "en").count() == 50  # binding, kept whole


def test_infeasible_recipe_surfaces_as_empty(spark):
    from crawler_ai_spark.pipeline.corpus import mixture_sample

    # target demands a language the corpus lacks: T binds to 0 and the
    # sample is empty rather than silently renormalized
    docs = _docs(spark, {"en": 50})
    assert mixture_sample(docs, {"en": 0.5, "xx": 0.5}).count() == 0


def test_deterministic_and_resumable(spark):
    from crawler_ai_spark.pipeline.corpus import mixture_sample

    docs = _docs(spark, {"en": 300, "vi": 100})
    t = {"en": 0.6, "vi": 0.4}
    a = sorted(r.doc_id for r in mixture_sample(docs, t).collect())
    b = sorted(r.doc_id for r in mixture_sample(docs, t).collect())
    assert a == b and a  # same docs every run, non-empty
