"""bm25_index_tool_spark — a from-scratch, PySpark-native inverted-index
builder and BM25 query engine with the query/data-processing capabilities of
the reference tool ``dnvriend/bm25-index-tool`` (single-process Python +
SQLite FTS5), re-expressed Spark-first.

Nothing here is a port: the reference delegates posting-list construction and
BM25 ranking to SQLite FTS5 (see SURVEY.md §0); this package builds the
inverted index as DataFrames (postings / doc-length / term-stats tables
persisted as term-bucketed parquet) and answers top-k BM25 queries with
either a pure-DataFrame join plan (Catalyst ``TakeOrderedAndProject``) or a
compressed block-max WAND scorer in ``mapInArrow`` — both rank-identical to
SQLite FTS5's ``bm25()`` (k1=1.2, b=0.75, idf-clamp 1e-6, 3-column tf/dl).
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: avoid importing pyspark at package import
    if name == "BM25SparkClient":
        from bm25_index_tool_spark.client import BM25SparkClient

        return BM25SparkClient
    if name == "tokenize_fts5_query":
        from bm25_index_tool_spark.tokenize import tokenize_fts5_query

        return tokenize_fts5_query
    raise AttributeError(name)
