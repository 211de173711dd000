"""Differential equality: the Arrow-C++ term-frequency path must produce
exactly the pandas-UDF tokenizer's (doc_id, term, tf) relation — including
on non-ASCII rows routed through the exact fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from bm25_index_tool_spark.arrow_tokenize import doc_term_freqs
from bm25_index_tool_spark.tokenize import tokenize_unicode61


def _pandas_path(df):
    return (
        df.select("doc_id", F.explode(tokenize_unicode61(F.col("txt"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def test_arrow_matches_pandas_tokenizer(spark):
    rows = [
        (1, "Hello hello WORLD"),
        (2, "café au lait café"),
        (3, "snake_case_name getHttpResponse2 vip-layerprd701.dc-ratingen.de"),
        (4, ""),
        (5, "番茄 tomato 番茄"),
        (6, "a1b2 100% true! naïve élève ÀÇÉ"),
        (7, "x" * 5000 + " y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, txt string").repartition(3)
    arrow = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in doc_term_freqs(df, F.col("txt")).collect()
    }
    pandas_ = {
        (r["doc_id"], r["term"]): r["tf"] for r in _pandas_path(df).collect()
    }
    assert arrow == pandas_
    assert arrow[(1, "hello")] == 2
    assert arrow[(2, "cafe")] == 2
    assert (5, "番茄") in arrow


def test_arrow_matches_pandas_on_corpus(spark, small_corpus):
    from bm25_index_tool_spark import build as B

    ids = B.assign_doc_ids(small_corpus, num_partitions=4)
    text = F.concat_ws(" ", "full_path", "filename", "content")
    arrow = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in doc_term_freqs(ids, text).collect()
    }
    pandas_ = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in ids.select(
            "doc_id", F.explode(tokenize_unicode61(text)).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        .collect()
    }
    assert arrow == pandas_
