"""Fusion strategies vs a pure-Python reimplementation of the reference's
``core/merge_strategies.py`` semantics (FIXTURES.md §3: corpus split by repo
into two indices, fused results compared)."""

from __future__ import annotations

import math

import pytest

from bm25_index_tool_spark import fusion

# ---- pure-Python goldens (verbatim reference semantics) --------------------


def rrf_local(lists, top_k, k=60):
    scores, data = {}, {}
    for results in lists:
        for rank, doc in enumerate(results, start=1):
            p = doc["path"]
            scores[p] = scores.get(p, 0.0) + 1.0 / (k + rank)
            data.setdefault(p, doc)
    out = sorted(scores.items(), key=lambda x: x[1], reverse=True)[:top_k]
    return [{**data[p], "score": s} for p, s in out]


def union_local(lists, top_k):
    m = {}
    for results in lists:
        for doc in results:
            p = doc["path"]
            if p not in m or doc["score"] > m[p]["score"]:
                m[p] = dict(doc)
    return sorted(m.values(), key=lambda d: d["score"], reverse=True)[:top_k]


def intersection_local(lists, top_k):
    if not lists:
        return []
    maps = [{d["path"]: d for d in results} for results in lists]
    common = set(maps[0])
    for mm in maps[1:]:
        common &= set(mm)
    out = []
    for p in common:
        avg = sum(mm[p]["score"] for mm in maps) / len(maps)
        out.append({**maps[0][p], "score": avg})
    return sorted(out, key=lambda d: d["score"], reverse=True)[:top_k]


def weighted_local(lists, top_k, weights=None):
    weights = weights or {}
    scores, data = {}, {}
    for i, results in enumerate(lists):
        if not results:
            continue
        w = weights.get(f"index_{i}", 1.0)
        ss = [d["score"] for d in results]
        lo, hi = min(ss), max(ss)
        rng = hi - lo
        for d in results:
            norm = (d["score"] - lo) / rng if rng > 0 else 1.0
            p = d["path"]
            scores[p] = scores.get(p, 0.0) + norm * w
            data.setdefault(p, d)
    out = sorted(scores.items(), key=lambda x: x[1], reverse=True)[:top_k]
    return [{**data[p], "score": s} for p, s in out]


LOCALS = {
    "rrf": rrf_local,
    "union": union_local,
    "intersection": intersection_local,
    "weighted": weighted_local,
}


# ---- fixtures: two per-repo sub-indices over the shared corpus -------------


@pytest.fixture(scope="module")
def split_indices(spark, small_rows, tmp_path_factory):
    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark import corpus as C
    from bm25_index_tool_spark.score import LoadedIndex

    base = tmp_path_factory.mktemp("fusion_idx")
    out = []
    for i, pred in enumerate(
        [lambda r: r[0] in ("org0/alpha", "org0/beta"), lambda r: r[0] not in ("org0/alpha", "org0/beta")]
    ):
        rows = [r for r in small_rows if pred(r)]
        df = spark.createDataFrame(rows, C.CORPUS_SCHEMA)
        d = str(base / f"sub{i}")
        B.build_index(spark, df, d, name=f"sub{i}", num_buckets=4)
        out.append(LoadedIndex.open(spark, d))
    return out


def _result_lists(split_indices, query, fetch_k):
    """Per-index candidate lists in search order, as dicts (reference shape)."""
    from bm25_index_tool_spark.score import score_query

    lists, dfs = [], []
    for idx in split_indices:
        df = score_query(idx, query, fetch_k, include_content=False).select(
            "doc_id", "path", "filename", "score"
        )
        rows = df.collect()
        lists.append([r.asDict() for r in rows])
        dfs.append(df)
    return lists, dfs


@pytest.mark.parametrize("strategy", ["rrf", "union", "intersection", "weighted"])
@pytest.mark.parametrize("query", ["data value", "kubernetes networking", "apple"])
def test_fusion_matches_reference_semantics(split_indices, strategy, query):
    top_k = 10
    fetch_k = fusion.fetch_k_for(top_k)
    lists, dfs = _result_lists(split_indices, query, fetch_k)

    params = {"weights": {"index_0": 2.0}} if strategy == "weighted" else {}
    expected = LOCALS[strategy](lists, top_k, **params)
    got = fusion.merge(strategy, dfs, top_k, **params).collect()

    exp_scores = {d["path"]: d["score"] for d in expected}
    got_scores = {r["path"]: r["score"] for r in got}
    # same fused score per path; same result set up to ties at the k-boundary
    boundary = expected[-1]["score"] if expected else None
    for p, s in got_scores.items():
        if p in exp_scores:
            assert math.isclose(s, exp_scores[p], rel_tol=1e-9), (strategy, query, p)
        else:
            assert boundary is not None and math.isclose(
                s, boundary, rel_tol=1e-9
            ), f"non-tie set mismatch: {strategy} {query} {p}"
    assert len(got) == len(expected)


def test_unknown_strategy_raises(split_indices):
    _, dfs = _result_lists(split_indices, "apple", 10)
    with pytest.raises(ValueError, match="Unknown merge strategy"):
        fusion.merge("bogus", dfs, 5)


def test_fetch_k_rule():
    assert fusion.fetch_k_for(10) == 100
    assert fusion.fetch_k_for(50) == 150
    assert fusion.fetch_k_for(1) == 100
