"""Related-document search (SURVEY.md §2.7 F7, §2.2 T3).

Reference flow (reference ``core/related.py:113-195``): take the source
document's top-10 TF terms (lowercase ``[a-z][a-z0-9]+`` tokens, stopword +
len≤2 filtered), run a normal BM25 search with ``top_k + 1``, drop the
source path, head(top_k).

Spark-first: the term extraction for a *single* doc is driver-side (tiny);
the corpus-wide variant (``top_terms_df``) is the distributed
explode→filter→groupBy→top-n used by the ``related_terms`` query-surface
entry and the pipeline text-analysis ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bm25_index_tool_spark.score import LoadedIndex, score_tokens
from bm25_index_tool_spark.tokenize import (
    STOPWORDS,
    related_terms_local,
    tokenizer_for,
)


def top_terms_df(
    docs: DataFrame,
    text_col: str = "content",
    n: int = 10,
) -> DataFrame:
    """Distributed twin of the reference's per-doc ``Counter.most_common``:
    top-n TF terms per document → (doc_id, term, tf, term_rank).
    Stopword + length filters replicate reference ``core/related.py:19-98``
    (note the reference's token regex ``[a-z][a-z0-9]+`` requires a leading
    letter; unicode61 tokens starting with digits are filtered out here via
    the same rule)."""
    from pyspark.sql.window import Window

    tok = tokenizer_for("unicode61")
    terms = (
        docs.select("doc_id", F.explode(tok(F.col(text_col))).alias("term"))
        .where(F.col("term").rlike("^[a-z][a-z0-9]+$"))
        .where(F.length("term") > 2)
        .where(~F.col("term").isin(sorted(STOPWORDS)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    return (
        terms.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= n)
    )


def search_related(
    index: LoadedIndex,
    source_path: str,
    top_k: int = 10,
    n_terms: int = 10,
) -> DataFrame:
    """Find documents related to ``source_path``.  Raises ValueError if the
    path is not in the index (reference raises for missing documents)."""
    src = (
        index.docs()
        .where(F.col("full_path") == source_path)
        .select("content")
        .collect()
    )
    if not src:
        raise ValueError(f"Document not found in index: {source_path}")
    terms = related_terms_local(src[0]["content"], n=n_terms)
    if not terms:
        raise ValueError(f"No searchable terms in document: {source_path}")
    # Reference queries with top_k+1 then drops the source doc itself.
    result = score_tokens(index, terms, top_k + 1, include_content=False)
    return (
        result.where(F.col("path") != source_path)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )
