"""Randomized LSM soak: a seeded multi-step add/modify/delete workload with
interleaved tiered merges and full compactions, FTS5-oracle-identical after
EVERY step.

Fixed-scenario suites miss interaction bugs that need a particular state
sequence — the ADVICE r03 high finding (doc_id reuse silently hiding new
docs) required deleting the max-id docs in one update and adding docs in
the next.  This soak walks a deterministic random schedule through that
state space; two steps pin the known-bad shape (delete-newest then add,
re-add of a previously deleted path), the rest is seeded shuffle over
counts and victims.  After every step the live index must be
rank-identical to a fresh SQLite FTS5 oracle built from the current truth
(tie groups compared as sets so equal-score orderings cannot flake), and
the manifest's num_docs must equal the truth's cardinality — the exact
divergence the ADVICE bug produced.
"""

from __future__ import annotations

import math
import random

from bm25_index_tool_spark import corpus as C
from bm25_index_tool_spark.client import BM25SparkClient
from tests.oracle import FTS5Oracle

N0 = 40
SEED = 7
QUERIES = ["apple", "data value", "sort function", "banana spark"]


def _key(row):
    return (row[0], row[1])


def _fresh_rows(n, start):
    """n brand-new rows with soak-unique paths (valid repo/lang values)."""
    base = C.generate_rows(n, seed=900 + start)
    return [
        (r[0], f"soak/add_{start + i}.txt", r[2], r[3], r[4] + f" fennel{start + i}")
        for i, r in enumerate(base)
    ]


def _assert_oracle_identical(client, name, state, step):
    rows = list(state.values())
    oracle = FTS5Oracle()
    oracle.add_documents(C.ordered_rows(rows))
    k = len(rows) + 5  # no top-k boundary: tie groups never straddle the cut
    for q in QUERIES:
        got = client.search(name, q, top_k=k, use_cache=False)
        exp = oracle.search_bm25(q, top_k=k)
        ctx = f"step {step}, query {q!r}"
        assert len(got) == len(exp), ctx
        # scores rank-identical...
        for g, e in zip(got, exp):
            assert math.isclose(g["score"], e[4], rel_tol=1e-9), ctx
        # ...and within an equal-score tie group the same path SET (our
        # doc_ids rotate on modify, so tie order vs oracle rowids is free)
        def _groups(pairs):
            out: dict[float, set] = {}
            for s, p in pairs:
                out.setdefault(round(s, 9), set()).add(p)
            return out

        assert _groups((g["score"], g["path"]) for g in got) == _groups(
            (e[4], e[1]) for e in exp
        ), ctx


def test_lsm_soak_random_schedule(spark, tmp_path):
    rng = random.Random(SEED)
    client = BM25SparkClient(spark, str(tmp_path / "root"))

    state = {_key(r): r for r in C.generate_rows(N0, seed=321)}
    client.create_index(
        "soak", spark.createDataFrame(list(state.values()), C.CORPUS_SCHEMA),
        num_buckets=8,
    )
    next_add = 0
    added_order: list[tuple] = []  # insertion order of soak-added keys

    def _apply(n_add, n_mod, n_del, *, del_newest=False, step=0):
        nonlocal next_add
        keys = list(state)
        if del_newest:  # the ADVICE r03 shape: kill the max-id docs
            victims = [k for k in added_order if k in state][-n_del:]
        else:
            victims = rng.sample(keys, n_del) if n_del else []
        for k in victims:
            del state[k]
        mod_pool = [k for k in state]
        for k in rng.sample(mod_pool, min(n_mod, len(mod_pool))):
            r = state[k]
            state[k] = (r[0], r[1], r[2], r[3], r[4] + f" xylograph{step}")
        fresh = _fresh_rows(n_add, next_add)
        next_add += n_add
        for r in fresh:
            state[_key(r)] = r
            added_order.append(_key(r))
        m = client.update_index(
            "soak",
            spark.createDataFrame(list(state.values()), C.CORPUS_SCHEMA),
        )
        assert m.num_docs == len(state), f"manifest diverged at step {step}"
        _assert_oracle_identical(client, "soak", state, step)
        return m

    # step 0: mixed random batch
    _apply(5, 4, 3, step=0)
    # steps 1+2: the ADVICE r03 high shape — delete the NEWEST (max-id)
    # docs, then add; pre-fix the adds were anti-joined away (invisible to
    # search with manifest.num_docs > live count)
    _apply(0, 0, 3, del_newest=True, step=1)
    _apply(2, 0, 0, step=2)

    # step 3: tiered merge mid-stream, then another random batch
    client.compact_index("soak", tiered=True)
    _assert_oracle_identical(client, "soak", state, "3/post-merge")
    _apply(3, 5, 2, step=3)

    # step 4: full compaction (the ADVICE bug made compaction PERMANENTLY
    # delete hidden docs — identity after the fold is the regression gate),
    # then re-add a previously deleted path (path reuse, fresh content)
    client.compact_index("soak")
    _assert_oracle_identical(client, "soak", state, "4/post-compact")
    dead = next(
        r for r in C.generate_rows(N0, seed=321) if _key(r) not in state
    )
    state[_key(dead)] = (
        dead[0], dead[1], dead[2], dead[3], dead[4] + " reborn quartz"
    )
    _apply(0, 2, 1, step=4)

    # step 5: final mixed batch + full fold, end-state identical
    _apply(4, 3, 4, step=5)
    client.compact_index("soak")
    _assert_oracle_identical(client, "soak", state, "5/final")
