"""Text analysis operators: token counts, language ID, quality score,
fingerprints — exact expectations on hand-built docs + behavior on the
driver's documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rove_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog and it is happy."),
        (2, "Der Hund ist nicht mit der Katze und das ist gut für alle."),
        (3, "le chat est dans la maison et il ne dort pas pour une fois"),
        (4, "el perro es grande y no come con los gatos por la noche"),
        (5, "zzz qqq xxx"),
        (6, ""),
        (7, "word word word word word word word word"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats_exact(spark, docs):
    out = {r.doc_id: r for r in textstats.with_token_stats(docs).collect()}
    assert out[7].n_tokens_ws == 8
    assert out[6].n_tokens_ws == 0 and out[6].n_tokens_bpe == 0
    # "The ... dog and it is happy." → 13 words + trailing period token
    assert out[1].n_tokens_ws == 13
    assert out[1].n_tokens_bpe == 14  # 13 word tokens + "."
    assert out[7].avg_token_len == pytest.approx(4.0)


def test_langid(spark, docs):
    out = {r.doc_id: r.lang_pred for r in textstats.with_langid(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "und"
    assert out[6] == "und"


def test_quality_score(spark, docs):
    out = {r.doc_id: r for r in textstats.with_quality(docs).collect()}
    assert out[1].quality_score > out[5].quality_score  # real sentence beats junk
    assert out[1].quality_score > out[7].quality_score  # repetition penalized
    assert 0.0 <= out[6].quality_score <= 1.0
    assert out[7].distinct_word_ratio == pytest.approx(1 / 8)
    assert out[1].stopword_ratio > 0.2


def test_fingerprints(spark, docs):
    out = textstats.with_fingerprint(docs)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].fp_exact != rows[2].fp_exact
    # robust fingerprint is stable under a tiny suffix edit, exact is not
    edited = spark.createDataFrame(
        [(1, rows[1].text if hasattr(rows[1], "text") else None)], "doc_id long, text string"
    )
    base = docs.filter(F.col("doc_id") == 1).select("text").first()[0]
    pair = spark.createDataFrame(
        [(1, base), (2, base + " extra")], "doc_id long, text string"
    )
    fps = {r.doc_id: r for r in textstats.with_fingerprint(pair, k_smallest=4).collect()}
    assert fps[1].fp_exact != fps[2].fp_exact
    assert fps[1].fp_robust == fps[2].fp_robust


def test_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textstats.with_quality(textstats.with_langid(textstats.with_token_stats(docs)))
    row = out.agg(
        F.min("quality_score"), F.max("quality_score"), F.countDistinct("lang_pred")
    ).first()
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert out.count() == docs.count()


def test_plan_stays_jvm_side(spark, docs):
    out = textstats.with_quality(textstats.with_langid(textstats.with_token_stats(docs)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
