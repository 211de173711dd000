"""Edge cases: empty corpus, single doc, duplicate paths, huge top_k on
tiny index, queries against empty indices."""

from __future__ import annotations

import pytest

from bm25_index_tool_spark import build as B
from bm25_index_tool_spark import corpus as C
from bm25_index_tool_spark.score import LoadedIndex, score_query


def test_single_doc_index(spark, tmp_path):
    rows = [("r/a", "src/only.py", "c" * 40, "python", "apple banana apple")]
    df = spark.createDataFrame(rows, C.CORPUS_SCHEMA)
    d = str(tmp_path / "one")
    m = B.build_index(spark, df, d, num_buckets=2)
    assert m.num_docs == 1
    idx = LoadedIndex.open(spark, d)
    res = score_query(idx, "apple", 10).collect()
    assert len(res) == 1 and res[0]["doc_id"] == 1
    # N=1, df=1 → idf = ln(0.5/1.5) < 0 → clamp → tiny positive score
    assert 0 < res[0]["score"] < 1e-5
    assert score_query(idx, "missing", 10).count() == 0


def test_empty_corpus_build_and_query(spark, tmp_path):
    df = spark.createDataFrame([], C.CORPUS_SCHEMA)
    d = str(tmp_path / "empty")
    m = B.build_index(spark, df, d, num_buckets=2)
    assert m.num_docs == 0 and m.avgdl == 0.0
    idx = LoadedIndex.open(spark, d)
    assert score_query(idx, "anything", 5).count() == 0


def test_duplicate_paths_validation(spark, tmp_path):
    rows = [
        ("r/a", "src/x.py", "c" * 40, "python", "one"),
        ("r/a", "src/x.py", "d" * 40, "python", "two"),
    ]
    df = spark.createDataFrame(rows, C.CORPUS_SCHEMA)
    with pytest.raises(ValueError, match="Duplicate document path"):
        B.build_index(
            spark, df, str(tmp_path / "dup"), num_buckets=2,
            validate_unique_paths=True,
        )


def test_topk_larger_than_corpus(spark, small_index, oracle):
    got = score_query(small_index, "the", 10_000).collect()
    exp = oracle.search_bm25("the", 10_000)
    assert [r["doc_id"] for r in got] == [e[0] for e in exp]
