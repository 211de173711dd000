"""Multi-index result fusion (SURVEY.md §2.7, F1–F6).

Reference semantics (reference ``core/merge_strategies.py:34-254``), on
per-index top-``fetch_k`` lists where ``fetch_k = max(100, 3*top_k)``
(reference ``core/searcher.py:133``):

* **rrf** (default): score(d) = Σ_i 1/(k + rank_i(d)), k=60; rank starts at 1.
* **union**: dedupe by path keeping the max score.
* **intersection**: only paths present in ALL lists; score = mean.
* **weighted**: per-index min-max normalization to [0,1] (range==0 → 1.0),
  × weight (positional key ``index_{i}``, default 1.0), summed per path.

All are tiny-data operations in the reference (lists of ≤ fetch_k dicts);
here they are DataFrame ops so fused search stays distributed end-to-end
(the per-index candidate lists never have to land on the driver) and the
same code fuses arbitrarily large lists.  Deterministic tie-break:
(fused score DESC, path ASC) — the reference relies on Python dict/sort
stability, which has no distributed analogue; on tie-free data the outputs
are identical (asserted in tests/test_fusion.py).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DEFAULT_RRF_K = 60


def fetch_k_for(top_k: int) -> int:
    """Over-fetch constant — reference ``core/searcher.py:133`` verbatim."""
    return max(100, top_k * 3)


def _with_rank(results: list[DataFrame]) -> DataFrame:
    """F1: tag each per-index list with list_idx + rank (1-based, by the
    search order: score DESC, doc_id ASC)."""
    tagged = [
        df.withColumn("list_idx", F.lit(i)) for i, df in enumerate(results)
    ]
    all_df = functools.reduce(lambda a, b: a.unionByName(b), tagged)
    w = Window.partitionBy("list_idx").orderBy(F.desc("score"), F.asc("doc_id"))
    # materialize ONCE (lazy localCheckpoint): every merge strategy
    # consumes the ranked frame twice (score aggregate + first-seen data,
    # weighted adds per-index min/max) and each branch would otherwise
    # re-run EVERY index's full scoring pipeline — the same recompute
    # shape the dedup operators fixed (code-review r05).  The frame is
    # ≤ fetch_k × n_indices rows.
    return all_df.withColumn("rank", F.row_number().over(w)).localCheckpoint(
        eager=False
    )


_DOC_COLS = ["doc_id", "filename"]


def _first_seen_data(ranked: DataFrame) -> DataFrame:
    """Reference keeps the first-seen doc dict per path (first list that
    returned it, best rank within it)."""
    w = Window.partitionBy("path").orderBy(F.asc("list_idx"), F.asc("rank"))
    cols = [c for c in _DOC_COLS if c in ranked.columns]
    keep = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("path", *cols)
    )
    return keep


def rrf_merge(results: list[DataFrame], top_k: int, k: int = DEFAULT_RRF_K) -> DataFrame:
    ranked = _with_rank(results)
    fused = ranked.groupBy("path").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("score")
    )
    out = fused.join(_first_seen_data(ranked), "path")
    return out.orderBy(F.desc("score"), F.asc("path")).limit(top_k)


def union_merge(results: list[DataFrame], top_k: int) -> DataFrame:
    ranked = _with_rank(results)
    fused = ranked.groupBy("path").agg(F.max("score").alias("score"))
    out = fused.join(_first_seen_data(ranked), "path")
    return out.orderBy(F.desc("score"), F.asc("path")).limit(top_k)


def intersection_merge(results: list[DataFrame], top_k: int) -> DataFrame:
    n = len(results)
    ranked = _with_rank(results)
    fused = (
        ranked.groupBy("path")
        .agg(
            F.avg("score").alias("score"),
            F.countDistinct("list_idx").alias("_n_lists"),
        )
        .where(F.col("_n_lists") == F.lit(n))
        .drop("_n_lists")
    )
    out = fused.join(_first_seen_data(ranked), "path")
    return out.orderBy(F.desc("score"), F.asc("path")).limit(top_k)


def weighted_merge(
    results: list[DataFrame],
    top_k: int,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Min-max normalize per list (a genuine barrier: needs each list's
    min/max before rescoring — computed as a window agg per list_idx, not a
    driver collect), × positional weight ``index_{i}``, sum per path."""
    weights = weights or {}
    ranked = _with_rank(results)
    wlist = Window.partitionBy("list_idx")
    norm = (
        ranked.withColumn("_min", F.min("score").over(wlist))
        .withColumn("_max", F.max("score").over(wlist))
        .withColumn(
            "_norm",
            F.when(
                F.col("_max") > F.col("_min"),
                (F.col("score") - F.col("_min")) / (F.col("_max") - F.col("_min")),
            ).otherwise(F.lit(1.0)),
        )
    )
    # positional weight keys "index_{i}" — reference commands/query.py:332-349
    mapping = F.create_map(
        *[
            x
            for i in range(len(results))
            for x in (F.lit(i), F.lit(float(weights.get(f"index_{i}", 1.0))))
        ]
    )
    norm = norm.withColumn("_w", mapping[F.col("list_idx")])
    fused = norm.groupBy("path").agg(
        F.sum(F.col("_norm") * F.col("_w")).alias("score")
    )
    out = fused.join(_first_seen_data(ranked), "path")
    return out.orderBy(F.desc("score"), F.asc("path")).limit(top_k)


STRATEGIES = {
    "rrf": rrf_merge,
    "union": union_merge,
    "intersection": intersection_merge,
    "weighted": weighted_merge,
}


def merge(
    name: str,
    results: list[DataFrame],
    top_k: int,
    **params,
) -> DataFrame:
    """Factory dispatch — unknown name raises ValueError listing the
    available strategies (reference ``core/merge_strategies.py:257-287``)."""
    if name not in STRATEGIES:
        available = ", ".join(sorted(STRATEGIES))
        raise ValueError(f"Unknown merge strategy '{name}'. Available: {available}")
    if name == "rrf":
        return rrf_merge(results, top_k, k=params.get("k", DEFAULT_RRF_K))
    if name == "weighted":
        return weighted_merge(results, top_k, weights=params.get("weights"))
    return STRATEGIES[name](results, top_k)
