"""Corpus source adapter tests: format-parameterized build (VERDICT r01
#10 'done' criterion), schema validation, Iceberg gating, MERGE template."""

from __future__ import annotations

import pytest

from bm25_index_tool_spark import build as B
from bm25_index_tool_spark import corpus as C
from bm25_index_tool_spark.sources import merge_corpus_sql, read_corpus


@pytest.fixture(scope="module")
def corpus_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("src") / "corpus.parquet")
    spark.createDataFrame(C.generate_rows(40, seed=17), C.CORPUS_SCHEMA) \
        .write.mode("overwrite").parquet(p)
    return p


@pytest.mark.parametrize("fmt", ["plain", "parquet_scheme"])
def test_build_from_uri_formats(spark, tmp_path, corpus_parquet, fmt):
    uri = corpus_parquet if fmt == "plain" else f"parquet:{corpus_parquet}"
    df = read_corpus(spark, uri)
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    m = B.build_index(spark, df, str(tmp_path / f"idx_{fmt}"), num_buckets=4)
    assert m.num_docs == 40


def test_extra_columns_pruned(spark, tmp_path):
    from pyspark.sql import functions as F

    p = str(tmp_path / "wide.parquet")
    spark.createDataFrame(C.generate_rows(5, seed=1), C.CORPUS_SCHEMA) \
        .withColumn("extra", F.lit(1)).write.parquet(p)
    df = read_corpus(spark, p)
    assert "extra" not in df.columns


def test_missing_columns_rejected(spark, tmp_path):
    p = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1, "x")], "a int, b string").write.parquet(p)
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus(spark, p)


def test_iceberg_without_catalog_fails_gracefully(spark):
    """This sandbox has no Iceberg runtime — the adapter must surface a
    clear, actionable error instead of a raw AnalysisException."""
    with pytest.raises(ValueError, match="iceberg table .* jar"):
        read_corpus(spark, "iceberg:cat.db.corpus")


def test_merge_sql_template():
    sql = merge_corpus_sql("cat.db.corpus", "staged_updates")
    assert "MERGE INTO cat.db.corpus t" in sql
    assert "USING staged_updates u" in sql
    assert "WHEN MATCHED AND u.is_deleted THEN DELETE" in sql
    assert "t.content_md5 <> u.content_md5" in sql
