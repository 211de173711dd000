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


def test_streaming_soak_random_schedule(spark, tmp_path):
    """VERDICT r04 #9: the one mutation path the LSM soak doesn't drive —
    ``stream_index_updates`` micro-batches — against the same FTS5 oracle.
    A seeded schedule of streamed add/modify waves (each wave = one new
    source parquet file, drained by an availableNow trigger) with
    ``auto_compact_segments=2`` so TIERED merges fire mid-stream, plus an
    out-of-band full-mode reconcile that DELETES rows between drains
    (upsert semantics make absence ≠ deletion by design — deletes arrive
    via reconcile in this topology).  Rank-identity is asserted after every
    drain."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bm25_index_tool_spark.streaming import stream_index_updates

    rng = random.Random(41)
    client = BM25SparkClient(spark, str(tmp_path / "root"))
    state = {_key(r): r for r in C.generate_rows(30, seed=77)}
    client.create_index(
        "ssoak",
        spark.createDataFrame(list(state.values()), C.CORPUS_SCHEMA),
        num_buckets=8,
    )
    idx_dir = client._index_dir("ssoak")
    src = str(tmp_path / "src")
    os.makedirs(src)
    cols = ["repo", "path", "commit", "lang", "content"]

    def _wave(name, rows):
        pq.write_table(
            pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)}),
            os.path.join(src, name),
        )

    next_add = 0

    def _stream_step(n_add, n_mod, step):
        nonlocal next_add
        changed = []
        for k in rng.sample(list(state), min(n_mod, len(state))):
            r = state[k]
            state[k] = (r[0], r[1], r[2], r[3], r[4] + f" streamling{step}")
            changed.append(state[k])
        fresh = _fresh_rows(n_add, 5000 + next_add)
        next_add += n_add
        for r in fresh:
            state[_key(r)] = r
            changed.append(r)
        _wave(f"wave{step}.parquet", changed)
        q = stream_index_updates(
            spark, idx_dir, src,
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True, auto_compact_segments=2,
        )
        q.awaitTermination(300)
        # refresh the client's handle view after out-of-band writes
        _assert_oracle_identical(client, "ssoak", state, f"stream-{step}")

    _stream_step(3, 2, 0)
    _stream_step(2, 3, 1)  # segment count hits 2 → tiered merge fires here

    # out-of-band reconcile: delete 4 rows (absence in a FULL-mode update)
    for k in rng.sample(list(state), 4):
        del state[k]
    client.update_index(
        "ssoak", spark.createDataFrame(list(state.values()), C.CORPUS_SCHEMA)
    )
    _assert_oracle_identical(client, "ssoak", state, "reconcile-delete")

    _stream_step(2, 2, 2)  # stream again over the post-reconcile state
    _stream_step(0, 3, 3)  # modify-only wave; another auto tiered merge

    # end state: full fold, identity holds
    client.compact_index("ssoak")
    _assert_oracle_identical(client, "ssoak", state, "final/post-compact")
