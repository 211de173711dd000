"""Similarity search over embedding columns (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k against a query vector; the
  dot product is a JVM-side ``aggregate``/``zip_with`` fold (whole-stage
  codegen, no Python), ``TakeOrderedAndProject`` for the top-k.
* ``lsh_bucketed_topk`` — the scale path: sign-random-projection buckets
  (axis-aligned variant for engine portability) prune the scan to the
  query's bucket; same scoring inside.

At 100 TB the brute force is one narrow scan + no shuffle (per-partition
top-k heaps merged by TakeOrdered); the LSH variant prunes the scan by
bucket pushdown when the table is written partitioned by bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_expr(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def sign_bucket(vec: F.Column, dims: int) -> F.Column:
    """Bucket id from the signs of the first ``dims`` components — a
    deterministic SRP-LSH with axis-aligned hyperplanes (portable to SQL)."""
    bucket = F.lit(0)
    for i in range(dims):
        bucket = bucket + F.when(
            F.element_at(vec, i + 1).cast("double") > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered desc, id asc tie-break."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            F.col(id_col).alias("id"),
            F.round(cosine_expr(F.col(vec_col), q), 9).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 4,
) -> DataFrame:
    """Approximate top-k: scan only the query's sign bucket."""
    qbucket = 0
    for i in range(bucket_dims):
        if float(query_vec[i]) > 0:
            qbucket += 2**i
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.withColumn("bucket", sign_bucket(F.col(vec_col), bucket_dims))
        .where(F.col("bucket") == qbucket)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine_expr(F.col(vec_col), q), 9).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
