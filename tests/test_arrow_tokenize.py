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


def test_arrow_code_profile_matches_pandas(spark):
    """The RE2 capture-group pre-split (no lookarounds) must insert exactly
    the boundaries of tokenize._CAMEL_RE, then match the pandas code
    tokenizer end-to-end — including the non-ASCII fallback branch and dl."""
    from bm25_index_tool_spark.tokenize import tokenize_code

    rows = [
        (1, "getHttpResponse2xx HTTPServer2 parseJSONFast"),
        (2, "snake_case_name x9y9z aBaB A1b2C3"),
        (3, "naïveCamelCase caféAuLait2 番茄Tomato7"),  # non-ASCII branch
        (4, ""),
        (5, "ALLCAPS lowercase MixedUPPERlower123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, txt string").repartition(2)
    arrow = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_term_freqs(df, F.col("txt"), profile="code").collect()
    }
    pdf = (
        df.select("doc_id", F.explode(tokenize_code(F.col("txt"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    from pyspark.sql.window import Window

    pdf = pdf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("int")
    )
    pandas_ = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in pdf.collect()
    }
    assert arrow == pandas_
    assert (1, "http") in arrow and (1, "2") in arrow and (1, "xx") in arrow
    # CJK chars are unicode61 token chars and the camel rules are ASCII-
    # only, so 番茄Tomato7 yields 番茄tomato + 7 on BOTH paths
    assert (3, "番茄tomato") in arrow and (3, "7") in arrow


def test_arrow_code_lang_profile(spark):
    """Lang-specific routing: identifier splitting ONLY for code-language
    rows; prose rows keep unicode61 whole tokens.  Arrow ≡ pandas twin."""
    from bm25_index_tool_spark.tokenize import tokenize_code_lang

    rows = [
        (1, "getHttpResponse2 fastPath", "java"),
        (2, "getHttpResponse2 fastPath", "md"),
        (3, "naïveCamelCase x9y", "py"),
        (4, "naïveCamelCase x9y", None),
        (5, "", "rs"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, txt string, lang string"
    ).repartition(2)
    arrow = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_term_freqs(df, F.col("txt"), profile="code_lang").collect()
    }
    pdf = (
        df.select(
            "doc_id",
            F.explode(
                tokenize_code_lang(F.col("txt"), F.col("lang"))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    from pyspark.sql.window import Window

    pdf = pdf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("int")
    )
    pandas_ = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in pdf.collect()
    }
    assert arrow == pandas_
    # java row split; md row kept whole
    assert (1, "http") in arrow and (1, "fast") in arrow
    assert (2, "gethttpresponse2") in arrow and (2, "fastpath") in arrow
    # non-ASCII code row routed through the exact fallback WITH splitting
    assert (3, "x") in arrow and (3, "9") in arrow
    # null lang → prose rules
    assert (4, "x9y") in arrow


def test_code_profile_index_build(spark, tmp_path):
    """End-to-end: a code-profile index build takes the Arrow path and a
    query for a split identifier fragment matches (north-star code-aware
    tokenization)."""
    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark.score import LoadedIndex, score_query

    rows = [
        ("r", "src/a.py", "c", "py", "def getHttpResponse2(): return fetchRemoteData()"),
        ("r", "src/b.py", "c", "py", "class PlainThing: pass"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx = str(tmp_path / "codeidx")
    B.build_index(spark, corpus, idx, tokenizer_profile="code", num_buckets=4)
    index = LoadedIndex.open(spark, idx)
    got = score_query(index, "http response", 5, include_content=False).collect()
    assert [r["path"] for r in got] == ["r/src/a.py"]
