"""Driver-contract query surface: every operator family from SURVEY.md §2
plus the training-data pipeline ops, each as BOTH a Spark callable
``(spark, sf_dir) -> DataFrame`` and a DuckDB-runnable ANSI-SQL oracle over
the same parquet tables.

Column names, types, and value rounding are aligned pairwise: the driver's
compare sorts columns by name and hashes values, so every computed column is
explicitly aliased and cast identically on both sides.  Scores derived from
floating-point math are rounded (6–9 dp) to absorb last-ulp libm divergence
between the JVM and DuckDB.

The heavyweight BM25 queries here run over the driver's ``documents`` table
(doc_id, text, lang, source, n_chars) — a single-text-column corpus, so
dl/tf are single-column (the three-column FTS5 semantics are covered by the
rank-identity suite against SQLite in tests/test_rank_identity.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from bm25_index_tool_spark.pipeline import dedup as DD
from bm25_index_tool_spark.pipeline import simsearch as SS
from bm25_index_tool_spark.pipeline import textstats as TS
from bm25_index_tool_spark.tokenize import STOPWORDS

K1, B = 1.2, 0.75

# ---------------------------------------------------------------------------
# shared helpers — Spark side
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tok(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(DD.tokens_col("text")).alias("term")
    )


def _corpus_scalars(docs: DataFrame) -> tuple[float, float]:
    """(N, avgdl) as exact doubles (integer sums divided — engine-identical).

    FTS5 semantics: N counts ALL documents and avgdl = total_tokens / N —
    zero-token docs stay in the denominator (ADVICE r01).  One narrow scan,
    no explode: dl per doc is the size of the token array.
    """
    # explicit long-sum / long-count (not engine AVG accumulation) so the
    # double division is bit-identical between Spark and DuckDB
    row = docs.agg(
        F.count("*").alias("n"),
        (
            F.sum(F.size(DD.tokens_col("text")).cast("long"))
            / F.count("*")
        ).alias("avgdl"),
    ).collect()[0]
    return float(row["n"]), float(row["avgdl"] or 0.0)


def _bm25_scored(docs: DataFrame, terms: list[str]) -> DataFrame:
    """Conjunctive BM25 over the single text column: (doc_id, score) for
    docs containing ALL terms; score formula identical (textually) to the
    SQL oracle below."""
    n, avgdl = _corpus_scalars(docs)
    tok = _tok(docs)
    # dl = per-doc token count = size of the token array — computed on the
    # narrow docs scan instead of exploding every token and shuffle-
    # aggregating them back (identical values: the tok CTE has exactly
    # size(tokens) rows per doc, and the inner join below only ever sees
    # docs with ≥1 matching term, so the explode-dropped zero-token docs
    # never mattered).  Removes one full-corpus explode + Exchange.
    dl = docs.select(
        "doc_id", F.size(DD.tokens_col("text")).cast("double").alias("dl")
    )
    tf = (
        tok.where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    raw_idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    idf = F.when(raw_idf <= 0.0, F.lit(1e-6)).otherwise(raw_idf)
    scored = (
        tf.join(F.broadcast(dfreq.withColumn("idf", idf).select("term", "idf")), "term")
        .join(dl, "doc_id")
        .withColumn(
            "partial",
            F.col("idf")
            * (
                (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
                )
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("_score"), F.count("*").alias("_nt"))
        .where(F.col("_nt") == len(set(terms)))
        .select("doc_id", F.round("_score", 6).alias("score"))
    )
    return scored


def _bm25_scored_multi(
    spark: SparkSession, docs: DataFrame, term_lists: list[list[str]]
) -> DataFrame:
    """(list_idx, doc_id, score) for SEVERAL conjunctive BM25 queries over
    ONE tokenize pass — the corpus is exploded once, dl aggregated once, tf
    computed once for the union of query terms (VERDICT r01 #7: the fusion
    queries previously called ``_bm25_scored`` per list, re-tokenizing the
    corpus ~6× per fused query).  Scores are numerically identical to the
    single-list path (same formula, same dtypes, same 6-dp rounding)."""
    n, avgdl = _corpus_scalars(docs)
    tok = _tok(docs)
    # dl from the narrow docs scan — same reasoning as _bm25_scored
    dl = docs.select(
        "doc_id", F.size(DD.tokens_col("text")).cast("double").alias("dl")
    )
    qrows = [
        (i, t, len(set(terms)))
        for i, terms in enumerate(term_lists)
        for t in set(terms)
    ]
    qterms = spark.createDataFrame(
        qrows, "list_idx int, term string, n_terms int"
    )
    tf = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    raw_idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    dfreq = dfreq.withColumn(
        "idf", F.when(raw_idf <= 0.0, F.lit(1e-6)).otherwise(raw_idf)
    )
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq.select("term", "idf")), "term")
        .join(dl, "doc_id")
        .withColumn(
            "partial",
            F.col("idf")
            * (
                (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
                )
            ),
        )
        .groupBy("list_idx", "n_terms", "doc_id")
        .agg(F.sum("partial").alias("_score"), F.count("*").alias("_nt"))
        .where(F.col("_nt") == F.col("n_terms"))
        .select("list_idx", "doc_id", F.round("_score", 6).alias("score"))
    )


# SQL prelude builders — DuckDB side (kept textually parallel to the Spark
# expressions above; N/avgdl are computed in-SQL from the same tokens).

_SQL_TOK = """
tok AS (
  SELECT doc_id, t.term
  FROM documents, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t(term)
)"""

_SQL_DL = """
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id)"""

# N over ALL documents, avgdl = total_tokens / N (zero-token docs count in
# the denominator — FTS5's nRow semantics, mirrored in _corpus_scalars).
_SQL_STATS = """
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS DOUBLE) / count(*) AS avgdl
  FROM documents)"""


def _sql_bm25(terms: list[str], extra_select: str = "doc_id, score") -> str:
    vals = ", ".join(f"('{t}')" for t in terms)
    n_distinct = len(set(terms))
    return f"""
WITH {_SQL_TOK},
{_SQL_DL},
{_SQL_STATS},
qterms AS (SELECT * FROM (VALUES {vals}) AS q(term)),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tok WHERE term IN (SELECT term FROM qterms)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term,
    CASE WHEN ln((s.n - df + 0.5) / (df + 0.5)) <= 0.0 THEN 1e-6
         ELSE ln((s.n - df + 0.5) / (df + 0.5)) END AS idf
  FROM dfreq, stats s
),
scored AS (
  SELECT tf.doc_id,
    sum(idf.idf * ((tf.tf * {K1 + 1.0}) / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.dl / s.avgdl)))) AS _score,
    count(*) AS _nt
  FROM tf
  JOIN idf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
result AS (
  SELECT doc_id, round(_score, 6) AS score FROM scored WHERE _nt = {n_distinct}
)
SELECT {extra_select} FROM result"""


# ---------------------------------------------------------------------------
# Query definitions: name -> (spark_fn, oracle_sql | None)
# ---------------------------------------------------------------------------

BM25_TERMS = ["spark", "join", "table"]
BM25_ALL_TERMS = ["window", "merge"]
BATCH_QUERIES = [
    (0, ["spark", "join"]),
    (1, ["table", "scan", "filter"]),
    (2, ["vector", "stream"]),
]
RRF_LIST_A = ["spark", "join"]
RRF_LIST_B = ["table", "join"]
RRF_K = 60


def q_bm25_topk(spark, sf_dir):
    """Q1: conjunctive BM25 top-20 (score DESC, doc_id ASC)."""
    return (
        _bm25_scored(_docs(spark, sf_dir), BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


SQL_BM25_TOPK = _sql_bm25(BM25_TERMS) + "\nORDER BY score DESC, doc_id LIMIT 20"


def q_bm25_all_matches(spark, sf_dir):
    """Q1 unbounded: every conjunctive match with its score."""
    return _bm25_scored(_docs(spark, sf_dir), BM25_ALL_TERMS)


SQL_BM25_ALL = _sql_bm25(BM25_ALL_TERMS)


def q_bm25_batch(spark, sf_dir):
    """C3 set-at-a-time: all queries in ONE pass, top-10 each.

    BATCH_QUERIES query_ids are 0..n-1 in order, so list_idx == query_id.
    """
    docs = _docs(spark, sf_dir)
    scored = _bm25_scored_multi(spark, docs, [t for _, t in BATCH_QUERIES])
    w = Window.partitionBy("list_idx").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            F.col("list_idx").alias("query_id"), "doc_id", "score", "rank"
        )
    )


def _sql_batch() -> str:
    vals = ", ".join(
        # set(terms), matching the Spark twin (_bm25_scored_multi): a
        # repeated term would otherwise join twice here, double-counting
        # the partial and inflating _nt past n_terms (code-review r05)
        f"({qid}, '{t}', {len(set(terms))})"
        for qid, terms in BATCH_QUERIES
        for t in sorted(set(terms))
    )
    return f"""
WITH {_SQL_TOK},
{_SQL_DL},
{_SQL_STATS},
qterms AS (SELECT * FROM (VALUES {vals}) AS q(query_id, term, n_terms)),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tok WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term,
    CASE WHEN ln((s.n - df + 0.5) / (df + 0.5)) <= 0.0 THEN 1e-6
         ELSE ln((s.n - df + 0.5) / (df + 0.5)) END AS idf
  FROM dfreq, stats s
),
scored AS (
  SELECT q.query_id, q.n_terms, tf.doc_id,
    sum(idf.idf * ((tf.tf * {K1 + 1.0}) / (tf.tf + {K1} * ({1.0 - B} + {B} * dl.dl / s.avgdl)))) AS _score,
    count(*) AS _nt
  FROM tf
  JOIN qterms q USING (term)
  JOIN idf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, q.n_terms, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(_score, 6) AS score,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(_score, 6) DESC, doc_id) AS INT) AS rank
  FROM scored WHERE _nt = n_terms
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 10"""


def q_rrf_fusion(spark, sf_dir):
    """F2: RRF(k=60) over two ranked BM25 lists (two queries), top-20."""
    docs = _docs(spark, sf_dir)
    both = _bm25_scored_multi(spark, docs, [RRF_LIST_A, RRF_LIST_B])
    w = Window.partitionBy("list_idx").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = both.withColumn("rank", F.row_number().over(w))
    fused = (
        ranked.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank"))), 9
            ).alias("rrf_score")
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(20)
    )
    return fused


def _sql_rrf() -> str:
    a = _sql_bm25(RRF_LIST_A)
    b = _sql_bm25(RRF_LIST_B)
    return f"""
WITH la AS ({a}), lb AS ({b}),
ranked AS (
  SELECT doc_id, 0 AS list_idx,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM la
  UNION ALL
  SELECT doc_id, 1 AS list_idx,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM lb
)
SELECT doc_id, round(sum(1.0 / ({RRF_K}.0 + rank)), 9) AS rrf_score
FROM ranked GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id LIMIT 20"""


def q_union_fusion(spark, sf_dir):
    """F3: union merge — dedupe by doc keeping max score, top-20."""
    docs = _docs(spark, sf_dir)
    return (
        _bm25_scored_multi(spark, docs, [RRF_LIST_A, RRF_LIST_B])
        .groupBy("doc_id")
        .agg(F.max("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


def _sql_union_fusion() -> str:
    return f"""
WITH la AS ({_sql_bm25(RRF_LIST_A)}), lb AS ({_sql_bm25(RRF_LIST_B)}),
u AS (SELECT * FROM la UNION ALL SELECT * FROM lb)
SELECT doc_id, max(score) AS score FROM u GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20"""


def q_intersection_fusion(spark, sf_dir):
    """F4: intersection merge — docs in BOTH lists, mean score."""
    docs = _docs(spark, sf_dir)
    return (
        _bm25_scored_multi(spark, docs, [RRF_LIST_A, RRF_LIST_B])
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("score"), 9).alias("score"),
            F.count_distinct("list_idx").alias("_n"),
        )
        .where(F.col("_n") == 2)
        .select("doc_id", "score")
    )


def _sql_intersection_fusion() -> str:
    return f"""
WITH la AS ({_sql_bm25(RRF_LIST_A)}), lb AS ({_sql_bm25(RRF_LIST_B)}),
u AS (
  SELECT doc_id, score, 0 AS list_idx FROM la
  UNION ALL
  SELECT doc_id, score, 1 AS list_idx FROM lb
)
SELECT doc_id, round(avg(score), 9) AS score
FROM u GROUP BY doc_id HAVING count(DISTINCT list_idx) = 2"""


def q_weighted_fusion(spark, sf_dir):
    """F5: per-list min-max normalize × weight (2.0 / 1.0), sum per doc."""
    docs = _docs(spark, sf_dir)
    both = _bm25_scored_multi(spark, docs, [RRF_LIST_A, RRF_LIST_B]).withColumn(
        "w", F.when(F.col("list_idx") == 0, F.lit(2.0)).otherwise(F.lit(1.0))
    )
    wl = Window.partitionBy("list_idx")
    norm = (
        both.withColumn("_min", F.min("score").over(wl))
        .withColumn("_max", F.max("score").over(wl))
        .withColumn(
            "_norm",
            F.when(
                F.col("_max") > F.col("_min"),
                (F.col("score") - F.col("_min")) / (F.col("_max") - F.col("_min")),
            ).otherwise(F.lit(1.0)),
        )
    )
    return (
        norm.groupBy("doc_id")
        .agg(F.round(F.sum(F.col("_norm") * F.col("w")), 9).alias("weighted_score"))
        .orderBy(F.desc("weighted_score"), F.asc("doc_id"))
        .limit(20)
    )


def _sql_weighted_fusion() -> str:
    return f"""
WITH la AS ({_sql_bm25(RRF_LIST_A)}), lb AS ({_sql_bm25(RRF_LIST_B)}),
u AS (
  SELECT doc_id, score, 0 AS list_idx, 2.0 AS w FROM la
  UNION ALL
  SELECT doc_id, score, 1 AS list_idx, 1.0 AS w FROM lb
),
norm AS (
  SELECT doc_id, w, list_idx,
    min(score) OVER (PARTITION BY list_idx) AS _min,
    max(score) OVER (PARTITION BY list_idx) AS _max,
    score
  FROM u
)
SELECT doc_id,
  round(sum((CASE WHEN _max > _min THEN (score - _min) / (_max - _min) ELSE 1.0 END) * w), 9) AS weighted_score
FROM norm GROUP BY doc_id
ORDER BY weighted_score DESC, doc_id LIMIT 20"""


def q_point_lookup(spark, sf_dir):
    """J4: point lookup by key (predicate pushdown to the parquet scan)."""
    return _docs(spark, sf_dir).where(F.col("doc_id") == 42).select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


SQL_POINT_LOOKUP = """
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE doc_id = 42"""


def q_filter_like(spark, sf_dir):
    """P5-style substring filter + order + limit."""
    return (
        _docs(spark, sf_dir)
        .where(F.col("text").contains("vector"))
        .select("doc_id", "lang")
        .orderBy(F.asc("doc_id"))
        .limit(50)
    )


SQL_FILTER_LIKE = """
SELECT doc_id, lang FROM documents
WHERE text LIKE '%vector%' ORDER BY doc_id LIMIT 50"""


# -- corpus statistics / aggregates (A1-A8, I2) ------------------------------


def q_corpus_stats(spark, sf_dir):
    """A1/A6/I2 scalars in ONE aggregate job (VERDICT r01 #6 flagged the
    extra driver-side distinct().count()).  explode_outer keeps zero-token
    docs as a null-term row, so n_docs counts ALL documents and
    avgdl = total_tokens / n_docs — FTS5's nRow semantics."""
    docs = _docs(spark, sf_dir)
    ex = docs.select(
        "doc_id", F.explode_outer(DD.tokens_col("text")).alias("term")
    )
    return ex.agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.round(
            F.count("term").cast("double") / F.count_distinct("doc_id"), 6
        ).alias("avgdl"),
        F.count_distinct("term").cast("long").alias("n_distinct_terms"),
    )


SQL_CORPUS_STATS = f"""
WITH {_SQL_TOK}
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       round(CAST((SELECT count(*) FROM tok) AS DOUBLE)
             / (SELECT count(*) FROM documents), 6) AS avgdl,
       (SELECT CAST(count(DISTINCT term) AS BIGINT) FROM tok) AS n_distinct_terms"""


def q_doc_lengths(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", F.size(DD.tokens_col("text")).cast("long").alias("dl")
    )


SQL_DOC_LENGTHS = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS dl
FROM documents"""


def q_term_df_top50(spark, sf_dir):
    tok = _tok(_docs(spark, sf_dir))
    return (
        tok.groupBy("term")
        .agg(F.count_distinct("doc_id").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


SQL_TERM_DF_TOP50 = f"""
WITH {_SQL_TOK}
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM tok GROUP BY term
ORDER BY df DESC, term LIMIT 50"""


def q_lang_counts(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


SQL_LANG_COUNTS = "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang"


# mime-type stats (reference GROUP BY mime_type, commands/stats.py:116-133).
# The documents test table has no path column, so both engines derive a
# deterministic synthetic path per doc_id and run the SAME ext→mime mapping
# (generated from build.MIME_BY_EXT on both sides) — this value-checks the
# actual derivation expression used at ingest, not just a count.
MIME_TEST_EXTS = ["py", "java", "go", "json", "md", "png", "weird", "sh"]


def q_mime_counts(spark, sf_dir):
    from bm25_index_tool_spark.build import mime_from_path

    n = len(MIME_TEST_EXTS)
    path = F.concat(
        F.lit("f"),
        F.col("doc_id").cast("string"),
        F.lit("."),
        F.element_at(
            F.array(*[F.lit(e) for e in MIME_TEST_EXTS]),
            (F.pmod(F.col("doc_id"), F.lit(n)) + 1).cast("int"),
        ),
    )
    return (
        _docs(spark, sf_dir)
        .select(mime_from_path(path).alias("mime_type"))
        .groupBy("mime_type")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def _sql_mime_counts() -> str:
    from bm25_index_tool_spark.build import mime_case_sql

    exts = ", ".join(f"'{e}'" for e in MIME_TEST_EXTS)
    n = len(MIME_TEST_EXTS)
    return f"""
SELECT {mime_case_sql('p')} AS mime_type, CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT 'f' || doc_id || '.' || [{exts}][(doc_id % {n}) + 1] AS p
  FROM documents
)
GROUP BY 1
"""


def q_source_sizes(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


SQL_SOURCE_SIZES = """
SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source"""


# -- incremental change detection (I3/J3: anti-joins) ------------------------


def q_incremental_changes(spark, sf_dir):
    """Synthetic stored/current states derived from documents:
    stored = doc_id % 10 != 3; current modifies text of doc_id % 10 == 7.
    Output: (doc_id, change_type) via left_anti / inner+filter joins."""
    docs = _docs(spark, sf_dir)
    stored = docs.where(F.col("doc_id") % 10 != 3).select(
        "doc_id", F.md5("text").alias("h")
    )
    current = docs.select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 10 == 7, F.concat(F.col("text"), F.lit(" MODIFIED")))
            .otherwise(F.col("text"))
        ).alias("h"),
    )
    added = current.join(stored, "doc_id", "left_anti").select(
        "doc_id", F.lit("added").alias("change_type")
    )
    deleted = stored.join(current, "doc_id", "left_anti").select(
        "doc_id", F.lit("deleted").alias("change_type")
    )
    modified = (
        current.alias("c")
        .join(stored.alias("s"), "doc_id")
        .where(F.col("c.h") != F.col("s.h"))
        .select("doc_id", F.lit("modified").alias("change_type"))
    )
    return added.unionByName(deleted).unionByName(modified)


SQL_INCREMENTAL = """
WITH stored AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 != 3
),
current AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 10 = 7 THEN text || ' MODIFIED' ELSE text END) AS h
  FROM documents
)
SELECT c.doc_id, 'added' AS change_type
FROM current c ANTI JOIN stored s USING (doc_id)
UNION ALL
SELECT s.doc_id, 'deleted' AS change_type
FROM stored s ANTI JOIN current c USING (doc_id)
UNION ALL
SELECT c.doc_id, 'modified' AS change_type
FROM current c JOIN stored s USING (doc_id) WHERE c.h != s.h"""


# -- related terms (T3/A5) ----------------------------------------------------


def q_related_terms_doc0(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") == 0)
    tok = _tok(docs)
    return (
        tok.where(F.col("term").rlike("^[a-z][a-z0-9]+$"))
        .where(F.length("term") > 2)
        .where(~F.col("term").isin(sorted(STOPWORDS)))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(10)
    )


def _sql_related() -> str:
    stop = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
WITH {_SQL_TOK}
SELECT term, CAST(count(*) AS BIGINT) AS tf
FROM tok
WHERE doc_id = 0
  AND regexp_full_match(term, '[a-z][a-z0-9]+')
  AND length(term) > 2
  AND term NOT IN ({stop})
GROUP BY term
ORDER BY tf DESC, term LIMIT 10"""


def q_top_term_per_doc(spark, sf_dir):
    """F1 rank construct: the single top-TF term per doc (docs 0..19)."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 20)
    tf = (
        _tok(docs)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "term", "tf")
    )


SQL_TOP_TERM_PER_DOC = f"""
WITH {_SQL_TOK},
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE doc_id < 20 GROUP BY doc_id, term
)
SELECT doc_id, term, tf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rn
  FROM tf
) WHERE rn = 1"""


# -- deduplication -------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup over a corpus WITH duplicates (documents ∪ copies of
    doc_id%25==0 re-keyed +10000): (content_hash, dup_count, doc_ids)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dups = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    combined = docs.unionByName(dups)
    return (
        DD.exact_duplicates(combined, "doc_id", "text")
        .select(
            "content_hash",
            F.col("dup_count").cast("long").alias("dup_count"),
            F.concat_ws(",", F.transform("doc_ids", lambda x: x.cast("string"))).alias("doc_ids"),
        )
    )


SQL_DEDUP_EXACT = """
WITH combined AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
)
SELECT md5(text) AS content_hash,
       CAST(count(*) AS BIGINT) AS dup_count,
       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
FROM combined GROUP BY md5(text) HAVING count(*) > 1"""


SHINGLE_N = 3
# 16 hashes × 4 bands → 4 rows/band: candidate threshold ≈ (1/4)^(1/4) ≈
# 0.71 Jaccard.  Scaled down from a production 128×32 (same r=4 S-curve
# shape) so the DuckDB oracle replays the identical banding cheaply at the
# driver sf; the 128-hash parameterization is exercised in
# tests/test_pipeline.py.
MINHASH_K = 16
MINHASH_BANDS = 4


def q_dedup_minhash_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        DD.minhash_lsh_pairs(
            docs, "doc_id", "text",
            shingle_n=SHINGLE_N, num_hashes=MINHASH_K, bands=MINHASH_BANDS,
        )
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        )
    )


def _sql_minhash() -> str:
    mh_cols = ",\n    ".join(
        f"min(md5('{i}|' || shingle)) AS mh_{i}" for i in range(MINHASH_K)
    )
    rows_per_band = MINHASH_K // MINHASH_BANDS
    band_selects = []
    for b in range(MINHASH_BANDS):
        cols = " || '|' || ".join(
            f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT id, {b} AS band, {cols} AS band_sig FROM sig"
        )
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT id, array_to_string(t[i:i+{SHINGLE_N - 1}], ' ') AS shingle
  FROM toks, unnest(range(1, len(t) - {SHINGLE_N} + 2)) AS u(i)
  WHERE len(t) >= {SHINGLE_N}
),
sig AS (
  SELECT id,
    {mh_cols}
  FROM sh GROUP BY id
),
banded AS (
  {bands_sql}
)
SELECT DISTINCT CAST(l.id AS BIGINT) AS id_a, CAST(r.id AS BIGINT) AS id_b
FROM banded l JOIN banded r
  ON l.band = r.band AND l.band_sig = r.band_sig AND l.id < r.id"""


JACCARD_THRESHOLD = 0.1
# hot-shingle cap (VERDICT r01 #3): shingles with df > cap are dropped
# before the self-join on BOTH sides; chosen above the fixture's max df so
# the driver-scale results are unchanged while the quadratic guard is live
JACCARD_HOT_CAP = 50


def q_dedup_jaccard_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return DD.ngram_jaccard_pairs(
        docs, "doc_id", "text",
        shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
        hot_shingle_cap=JACCARD_HOT_CAP,
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


def _sql_jaccard() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
sh_all AS (
  SELECT DISTINCT id, array_to_string(t[i:i+{SHINGLE_N - 1}], ' ') AS shingle
  FROM toks, unnest(range(1, len(t) - {SHINGLE_N} + 2)) AS u(i)
  WHERE len(t) >= {SHINGLE_N}
),
hot AS (
  SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) > {JACCARD_HOT_CAP}
),
sh AS (SELECT * FROM sh_all ANTI JOIN hot USING (shingle)),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.id < b.id GROUP BY a.id, b.id
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 9) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}"""


SIMHASH_BITS = 64  # VERDICT r01 #9: 16 bits collide at 10^12 docs


def q_simhash(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return DD.simhash(docs, "doc_id", "text", bits=SIMHASH_BITS).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("simhash").cast("long").alias("simhash"),
    )


def _sql_simhash() -> str:
    sums = []
    for b in range(SIMHASH_BITS):
        pos, digits = DD.simhash_bit_digit(b)
        inlist = ",".join(f"'{d}'" for d in digits)
        sums.append(
            f"sum(CASE WHEN substr(h, {pos}, 1) IN ({inlist}) THEN tf ELSE -tf END) AS s_{b}"
        )
    bit_sums = ",\n    ".join(sums)
    fp_terms = []
    for b in range(SIMHASH_BITS):
        w = -(2**63) if b == 63 else 2**b  # two's complement high bit
        fp_terms.append(
            f"CASE WHEN s_{b} > 0 THEN CAST({w} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    fp = " + ".join(fp_terms)
    return f"""
WITH {_SQL_TOK},
terms AS (
  SELECT doc_id AS id, term, count(*) AS tf, md5(term) AS h
  FROM tok GROUP BY doc_id, term
),
bit_sums AS (
  SELECT id,
    {bit_sums}
  FROM terms GROUP BY id
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST({fp} AS BIGINT) AS simhash FROM bit_sums"""


# -- similarity search ---------------------------------------------------------

COSINE_K = 20


def _query_vec(spark, sf_dir) -> list[float]:
    row = _emb(spark, sf_dir).where(F.col("vec_id") == 0).select("embedding").collect()
    return [float(x) for x in row[0]["embedding"]]


def q_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return SS.brute_force_topk(emb, _query_vec(spark, sf_dir), COSINE_K).select(
        F.col("id").cast("long").alias("vec_id"),
        F.round("cosine", 6).alias("cosine"),
    )


_SQL_VECD = """
vecd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM vecd WHERE vec_id = 0)"""

SQL_COSINE_TOPK = f"""
WITH {_SQL_VECD}
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       round(round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 9), 6) AS cosine
FROM vecd, q
-- ORDER BY the 9-dp value (the Spark side's top-k key): selecting on the
-- 6-dp display rounding would flip k-boundary membership on 6-dp ties
ORDER BY round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 9) DESC, vec_id LIMIT {COSINE_K}"""


# seeded SRP-LSH parameters shared by the Spark query and the SQL oracle
# (VERDICT r01 #4: real random hyperplanes, multi-table OR).  8 bits keeps
# candidate sets non-trivial at the 500-vector driver scale; the 100-TB
# recall/scale characterization (16 bits × 8 tables) lives in
# tests/test_pipeline.py::test_srp_ann_recall.
EMB_DIM = 64
LSH_BITS = 8
LSH_TABLES = 4
LSH_SEED = 42
LSH_PLANES = SS.srp_hyperplanes(EMB_DIM, LSH_BITS, LSH_TABLES, LSH_SEED)


def q_cosine_lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return SS.lsh_bucketed_topk(
        emb, _query_vec(spark, sf_dir), COSINE_K,
        n_bits=LSH_BITS, n_tables=LSH_TABLES, seed=LSH_SEED,
    ).select(
        F.col("id").cast("long").alias("vec_id"),
        F.round("cosine", 6).alias("cosine"),
    )


def _sql_lsh() -> str:
    bucket_cols = ",\n  ".join(
        f"{SS.srp_bucket_sql('v', LSH_PLANES[t])} AS b_{t}"
        for t in range(LSH_TABLES)
    )
    qcols = ", ".join(f"b_{t} AS q_{t}" for t in range(LSH_TABLES))
    cond = " OR ".join(f"b_{t} = q_{t}" for t in range(LSH_TABLES))
    return f"""
WITH {_SQL_VECD},
bucketed AS (SELECT vec_id, v,
  {bucket_cols}
  FROM vecd),
qb AS (SELECT {qcols}, v AS qv FROM bucketed WHERE vec_id = 0)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       round(round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 9), 6) AS cosine
FROM bucketed, qb
WHERE {cond}
ORDER BY round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 9) DESC, vec_id LIMIT {COSINE_K}"""


# IVF-Flat parameters shared by the Spark query and the SQL oracle: the
# deterministic stride-sampled coarse quantizer makes cell assignment and
# probe selection exactly replayable in DuckDB (argmax over 9-dp-rounded
# cosines, first index wins ties — both engines).
IVF_M = 16
IVF_NPROBE = 4


def q_ivf_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return SS.ivf_topk(
        emb, _query_vec(spark, sf_dir), COSINE_K, m=IVF_M, nprobe=IVF_NPROBE
    ).select(
        F.col("id").cast("long").alias("vec_id"),
        F.round("cosine", 6).alias("cosine"),
    )


def _sql_ivf() -> str:
    cos9 = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 9)"
    )
    return f"""
WITH {_SQL_VECD},
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
  FROM vecd
  WHERE vec_id % (SELECT GREATEST(count(*) // {IVF_M}, 1) FROM vecd) = 0
  ORDER BY vec_id LIMIT {IVF_M}
),
ascore AS (
  SELECT d.vec_id, d.v, c.cell,
         {cos9.format(a='d.v', b='c.cv')} AS s
  FROM vecd d CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, v, cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS rn
    FROM ascore) WHERE rn = 1
),
probe AS (
  SELECT cell FROM (
    SELECT c.cell, {cos9.format(a='q.qv', b='c.cv')} AS s,
           row_number() OVER (ORDER BY {cos9.format(a='q.qv', b='c.cv')} DESC, c.cell ASC) AS rn
    FROM cents c, q) WHERE rn <= {IVF_NPROBE}
)
SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
       round({cos9.format(a='a.v', b='q.qv')}, 6) AS cosine
FROM assign a, q
WHERE a.cell IN (SELECT cell FROM probe)
ORDER BY {cos9.format(a='a.v', b='q.qv')} DESC, vec_id LIMIT {COSINE_K}"""


EMB_DUP_THRESHOLD = 0.95


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding near-dup pairs over embeddings ∪ exact copies of
    vec_id%25==0 re-keyed +10000 (the base table has no near-dups, so the
    synthetic copies exercise the SRP banding + threshold machinery with a
    deterministic non-empty result — identical vectors share every SRP
    bucket, so candidate recall for them is 1.0 by construction)."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    dups = emb.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    combined = emb.unionByName(dups)
    return DD.embedding_cosine_dup_pairs(
        combined,
        threshold=EMB_DUP_THRESHOLD,
        dim=EMB_DIM,
        n_bits=LSH_BITS,
        n_tables=LSH_TABLES,
        seed=LSH_SEED,
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("cosine", 6).alias("cosine"),
    )


def _sql_embedding_dups() -> str:
    bucket_cols = ",\n  ".join(
        f"{SS.srp_bucket_sql('v', LSH_PLANES[t])} AS b_{t}"
        for t in range(LSH_TABLES)
    )
    # a pair is a candidate iff it shares a bucket in ANY table
    cond = " OR ".join(f"a.b_{t} = b.b_{t}" for t in range(LSH_TABLES))
    return f"""
WITH combined AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0
),
vecd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM combined
),
bucketed AS (SELECT vec_id, v,
  {bucket_cols}
  FROM vecd)
SELECT DISTINCT CAST(a.vec_id AS BIGINT) AS id_a,
       CAST(b.vec_id AS BIGINT) AS id_b,
       round(round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9), 6) AS cosine
FROM bucketed a JOIN bucketed b
  ON a.vec_id < b.vec_id AND ({cond})
WHERE round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 9) >= {EMB_DUP_THRESHOLD}"""


# -- event-stream ops (batch twins of pipeline/events.py streaming) ------------

EVENT_WINDOW = "10 minutes"
SESSION_GAP_MIN = 30


def q_windowed_event_counts(spark, sf_dir):
    from bm25_index_tool_spark.pipeline import events as EV

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return EV.windowed_event_counts(ev, window_duration=EVENT_WINDOW)


SQL_WINDOWED_EVENTS = f"""
SELECT time_bucket(INTERVAL '{EVENT_WINDOW}', ts) AS window_start,
       time_bucket(INTERVAL '{EVENT_WINDOW}', ts) + INTERVAL '{EVENT_WINDOW}' AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2, 3"""


def q_event_sessions(spark, sf_dir):
    from bm25_index_tool_spark.pipeline import events as EV

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return EV.sessionize_events(ev, gap_minutes=SESSION_GAP_MIN)


SQL_EVENT_SESSIONS = f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id))
              > {SESSION_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT *, CAST(sum(brk) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM o)
SELECT CAST(user_id AS BIGINT) AS user_id, session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, session_idx"""


# -- text analysis --------------------------------------------------------------


def q_token_counts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return TS.token_counts(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
        F.col("word_tokens").cast("long").alias("word_tokens"),
    )


SQL_TOKEN_COUNTS = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens,
       CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS word_tokens
FROM documents"""


def q_quality_scores(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 100)
    return TS.quality_scores(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("n_chars_actual").cast("long").alias("n_chars_actual"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "non_alnum_ratio",
        "stopword_ratio",
        "mean_word_len",
        "keep",
    )


def _sql_quality() -> str:
    stop = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
WITH base AS (
  SELECT doc_id,
    length(text) AS n_chars_actual,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks,
    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_alnum
  FROM documents WHERE doc_id < 100
),
feat AS (
  SELECT doc_id, n_chars_actual, len(toks) AS n_tokens,
    round(CASE WHEN n_chars_actual > 0 THEN CAST(n_chars_actual - n_alnum AS DOUBLE) / n_chars_actual ELSE 0.0 END, 9) AS non_alnum_ratio,
    round(CASE WHEN len(toks) > 0 THEN CAST(len(list_intersect(list_distinct(toks), [{stop}])) AS DOUBLE) / len(toks) ELSE 0.0 END, 9) AS stopword_ratio,
    round(CASE WHEN len(toks) > 0 THEN CAST(n_alnum AS DOUBLE) / len(toks) ELSE 0.0 END, 9) AS mean_word_len
  FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars_actual AS BIGINT) AS n_chars_actual,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       non_alnum_ratio, stopword_ratio, mean_word_len,
       (n_tokens >= 5 AND non_alnum_ratio < 0.6 AND mean_word_len >= 2.0) AS keep
FROM feat"""


def q_lang_id(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return TS.language_id(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("doc_id"),
        "predicted_lang",
        F.col("marker_hits").cast("long").alias("marker_hits"),
    )


def _sql_lang_id() -> str:
    cases = []
    for lang, markers in sorted(TS.LANG_MARKERS.items()):
        marks = ", ".join(f"'{m}'" for m in markers)
        cases.append(
            f"len(list_filter(toks, x -> list_contains([{marks}], x))) AS hits_{lang}"
        )
    hits_cols = ",\n    ".join(cases)
    langs = sorted(TS.LANG_MARKERS)
    # argmax with alphabetical tie-break, matching the Spark fold
    best = f"greatest({', '.join('hits_' + lang for lang in langs)})"
    pick = "CASE "
    for lang in langs:
        pick += f"WHEN hits_{lang} = best THEN '{lang}' "
    pick += "END"
    return f"""
WITH base AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
hits AS (
  SELECT doc_id,
    {hits_cols}
  FROM base
),
best AS (SELECT *, {best} AS best FROM hits)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN best > 0 THEN {pick} ELSE 'und' END AS predicted_lang,
       CAST(greatest(best, 0) AS BIGINT) AS marker_hits
FROM best"""


def q_fingerprints(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return TS.fingerprints(docs, "doc_id", "text").select(
        F.col("id").cast("long").alias("doc_id"), "fingerprint"
    )


SQL_FINGERPRINTS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))), 1, 16) AS fingerprint
FROM documents"""


def q_clean_corpus(spark, sf_dir):
    """Composed training-data cleaning pass — the pipeline a 100-TB corpus
    runs before tokenization, demonstrated as plain DataFrame composition
    (quality filter → exact dedup keeping the lowest doc_id per content
    hash → language-ID the survivors).  Duplicates are injected
    (doc_id%25==0 re-keyed +10000, same fixture as dedup_exact) so the
    dedup stage does real work.  One declarative plan: Catalyst fuses the
    three stages; the only shuffle is the dedup groupBy."""
    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    dups = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    combined = docs.unionByName(dups)
    quality = TS.quality_scores(combined, "doc_id", "text")
    kept = combined.join(
        quality.where("keep").select(
            F.col("id").alias("doc_id"), "n_tokens"
        ),
        "doc_id",
    )
    canonical = (
        kept.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    survivors = kept.join(canonical.select("doc_id"), "doc_id", "left_semi")
    lang = TS.language_id(survivors, "doc_id", "text")
    return survivors.join(
        lang.select(F.col("id").alias("doc_id"), "predicted_lang"), "doc_id"
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "predicted_lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5("text").alias("content_hash"),
    )


def _sql_clean_corpus() -> str:
    hits_cols = ",\n    ".join(
        f"len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{m}'" for m in markers)
        + f"], x))) AS hits_{lang}"
        for lang, markers in sorted(TS.LANG_MARKERS.items())
    )
    langs = sorted(TS.LANG_MARKERS)
    best = f"greatest({', '.join('hits_' + lang for lang in langs)})"
    pick = "CASE "
    for lang in langs:
        pick += f"WHEN hits_{lang} = best THEN '{lang}' "
    pick += "END"
    return f"""
WITH combined AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents
  WHERE doc_id < 200 AND doc_id % 25 = 0
),
base AS (
  SELECT doc_id, text,
    length(text) AS n_chars,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks,
    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_alnum
  FROM combined
),
feat AS (
  SELECT doc_id, text, len(toks) AS n_tokens,
    round(CASE WHEN n_chars > 0 THEN CAST(n_chars - n_alnum AS DOUBLE) / n_chars ELSE 0.0 END, 9) AS non_alnum_ratio,
    round(CASE WHEN len(toks) > 0 THEN CAST(n_alnum AS DOUBLE) / len(toks) ELSE 0.0 END, 9) AS mean_word_len
  FROM base
),
kept AS (
  SELECT doc_id, text, n_tokens FROM feat
  WHERE n_tokens >= 5 AND non_alnum_ratio < 0.6 AND mean_word_len >= 2.0
),
canon AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
survivors AS (
  SELECT k.doc_id, k.text, k.n_tokens FROM kept k
  JOIN canon c ON k.doc_id = c.doc_id
),
sbase AS (
  SELECT doc_id, text, n_tokens,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM survivors
),
hits AS (
  SELECT doc_id, text, n_tokens,
    {hits_cols}
  FROM sbase
),
bests AS (SELECT *, {best} AS best FROM hits)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN best > 0 THEN {pick} ELSE 'und' END AS predicted_lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       md5(text) AS content_hash
FROM bests"""


# -- vector surface: word-window chunker (T4) + chunk-level search (J2) --------

CHUNK_SIZE = 40
CHUNK_OVERLAP = 10
_CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP


def q_chunks(spark, sf_dir):
    """T4 word-window chunker over documents (doc_id < 50): reference
    TextChunker semantics (vector/chunking.py:161-282) — windows of
    CHUNK_SIZE words advancing by CHUNK_SIZE−CHUNK_OVERLAP, stop once a
    window reaches the end.  chunk_md5 proves text equality."""
    from bm25_index_tool_spark import vector as V

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 50).select("doc_id", "text")
    ch = V.chunk_documents(
        docs, id_cols=["doc_id"], text_col="text",
        chunk_size=CHUNK_SIZE, chunk_overlap=CHUNK_OVERLAP,
    )
    return ch.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("start_word").cast("long").alias("start_word"),
        F.col("end_word").cast("long").alias("end_word"),
        F.col("word_count").cast("long").alias("word_count"),
        F.md5("chunk_text").alias("chunk_md5"),
    )


_SQL_CHUNKS_CTE = f"""
w AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS words
  FROM documents {{where}}
),
counted AS (
  SELECT doc_id, words, len(words) AS n,
    CASE WHEN len(words) = 0 THEN 0
         WHEN len(words) <= {CHUNK_SIZE} THEN 1
         ELSE 1 + CAST(ceil((len(words) - {CHUNK_SIZE}) / {_CHUNK_STEP}.0) AS INT) END AS n_chunks
  FROM w
),
c AS (
  SELECT doc_id, words, n, CAST(i AS INT) AS chunk_index,
         CAST(i * {_CHUNK_STEP} AS INT) AS start_word,
         CAST(least(i * {_CHUNK_STEP} + {CHUNK_SIZE}, n) AS INT) AS end_word
  FROM counted, unnest(range(0, n_chunks)) AS u(i)
)"""

SQL_CHUNKS = f"""
WITH {_SQL_CHUNKS_CTE.format(where="WHERE doc_id < 50")}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_index AS BIGINT) AS chunk_index,
       CAST(start_word AS BIGINT) AS start_word,
       CAST(end_word AS BIGINT) AS end_word,
       CAST(end_word - start_word AS BIGINT) AS word_count,
       md5(array_to_string(words[start_word + 1:end_word], ' ')) AS chunk_md5
FROM c"""


SEMANTIC_K = 20


def q_semantic_chunk_search(spark, sf_dir):
    """J2 3-way join (chunks ⋈ vectors ⋈ query) + the reference searcher's
    fetch-3k → per-doc-best-chunk dedupe → top-k (vector/searcher.py:
    74-110).  Chunk embeddings come from the embeddings table via the
    deterministic key (doc_id*7 + chunk_index) % 500 — a stand-in for the
    model-generated vectors, keeping an exact SQL oracle."""
    from bm25_index_tool_spark import vector as V

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200).select("doc_id", "text")
    ch = V.chunk_documents(
        docs, id_cols=["doc_id"], text_col="text",
        chunk_size=CHUNK_SIZE, chunk_overlap=CHUNK_OVERLAP,
    )
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    chunk_vecs = ch.withColumn(
        "vec_id", (F.col("doc_id") * 7 + F.col("chunk_index")) % 500
    ).join(emb, "vec_id")
    res = V.semantic_search_chunks(
        chunk_vecs, _query_vec(spark, sf_dir), SEMANTIC_K, doc_col="doc_id"
    )
    return res.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "score",
        F.col("chunk_index").cast("long").alias("chunk_index"),
    )


SQL_SEMANTIC_CHUNKS = f"""
WITH {_SQL_CHUNKS_CTE.format(where="WHERE doc_id < 200")},
vecd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM vecd WHERE vec_id = 0),
scored AS (
  SELECT c.doc_id, c.chunk_index,
         round(list_dot_product(v.v, qv) / (sqrt(list_dot_product(v.v, v.v)) * sqrt(list_dot_product(qv, qv))), 9) AS score
  FROM c JOIN vecd v ON v.vec_id = (c.doc_id * 7 + c.chunk_index) % 500
  CROSS JOIN q
),
fetched AS (
  SELECT * FROM scored ORDER BY score DESC, doc_id, chunk_index LIMIT {SEMANTIC_K * 3}
),
dedup AS (
  SELECT doc_id, score, chunk_index,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, chunk_index) AS rn
  FROM fetched
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score,
       CAST(chunk_index AS BIGINT) AS chunk_index
FROM dedup WHERE rn = 1
ORDER BY score DESC, doc_id LIMIT {SEMANTIC_K}"""


# -- multimodal plumbing (mapInPandas; value-hash oracle: the deterministic
# fake decode hashes the payload's lowercase-hex encoding, so DuckDB can
# replay it with sha256(VARCHAR) + hex-literal casts — VERDICT r02 #1) ---------


def q_multimodal_features(spark, sf_dir):
    from bm25_index_tool_spark.pipeline.multimodal import (
        decode_image_batch,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=96, seed=42)
    return decode_image_batch(media, deterministic_fake=True)


# payload_i = sha256("42:i").digest() * (1 + i%5); the fake decode hashes
# payload.hex(), and hex(digest*k) == hexdigest*k, so the oracle rebuilds
# the hash chain entirely in VARCHAR space.
SQL_MULTIMODAL = """
WITH gen AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
         END AS kind,
         sha256(repeat(sha256('42:' || i), 1 + i % 5)) AS h
  FROM range(0, 96) t(i)
)
SELECT i::BIGINT AS media_id,
       kind,
       (64 + ('0x' || substr(h, 1, 4))::INT % 1024)::INT AS width,
       (64 + ('0x' || substr(h, 5, 4))::INT % 1024)::INT AS height,
       (CASE WHEN kind = 'image' THEN 1
             ELSE 1 + ('0x' || substr(h, 9, 4))::INT % 300 END)::INT
         AS n_frames,
       substr(h, 1, 16) AS feature_hash
FROM gen
ORDER BY media_id
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "bm25_all_matches": q_bm25_all_matches,
        "bm25_batch": q_bm25_batch,
        "rrf_fusion": q_rrf_fusion,
        "union_fusion": q_union_fusion,
        "intersection_fusion": q_intersection_fusion,
        "weighted_fusion": q_weighted_fusion,
        "point_lookup": q_point_lookup,
        "filter_like": q_filter_like,
        "corpus_stats": q_corpus_stats,
        "doc_lengths": q_doc_lengths,
        "term_df_top50": q_term_df_top50,
        "lang_counts": q_lang_counts,
        "mime_counts": q_mime_counts,
        "source_sizes": q_source_sizes,
        "incremental_changes": q_incremental_changes,
        "related_terms_doc0": q_related_terms_doc0,
        "top_term_per_doc": q_top_term_per_doc,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "simhash": q_simhash,
        "cosine_topk": q_cosine_topk,
        "cosine_lsh_topk": q_cosine_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "chunks": q_chunks,
        "semantic_chunk_search": q_semantic_chunk_search,
        "windowed_event_counts": q_windowed_event_counts,
        "event_sessions": q_event_sessions,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "clean_corpus": q_clean_corpus,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": SQL_BM25_TOPK,
        "bm25_all_matches": SQL_BM25_ALL,
        "bm25_batch": _sql_batch(),
        "rrf_fusion": _sql_rrf(),
        "union_fusion": _sql_union_fusion(),
        "intersection_fusion": _sql_intersection_fusion(),
        "weighted_fusion": _sql_weighted_fusion(),
        "point_lookup": SQL_POINT_LOOKUP,
        "filter_like": SQL_FILTER_LIKE,
        "corpus_stats": SQL_CORPUS_STATS,
        "doc_lengths": SQL_DOC_LENGTHS,
        "term_df_top50": SQL_TERM_DF_TOP50,
        "lang_counts": SQL_LANG_COUNTS,
        "mime_counts": _sql_mime_counts(),
        "source_sizes": SQL_SOURCE_SIZES,
        "incremental_changes": SQL_INCREMENTAL,
        "related_terms_doc0": _sql_related(),
        "top_term_per_doc": SQL_TOP_TERM_PER_DOC,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_minhash_pairs": _sql_minhash(),
        "dedup_jaccard_pairs": _sql_jaccard(),
        "simhash": _sql_simhash(),
        "cosine_topk": SQL_COSINE_TOPK,
        "cosine_lsh_topk": _sql_lsh(),
        "ivf_topk": _sql_ivf(),
        "embedding_dup_pairs": _sql_embedding_dups(),
        "chunks": SQL_CHUNKS,
        "semantic_chunk_search": SQL_SEMANTIC_CHUNKS,
        "windowed_event_counts": SQL_WINDOWED_EVENTS,
        "event_sessions": SQL_EVENT_SESSIONS,
        "token_counts": SQL_TOKEN_COUNTS,
        "quality_scores": _sql_quality(),
        "lang_id": _sql_lang_id(),
        "fingerprints": SQL_FINGERPRINTS,
        "clean_corpus": _sql_clean_corpus(),
        "multimodal_features": SQL_MULTIMODAL,
    }
