"""Benchmark harness — prints ONE JSON line with headline timings.

Env:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_REPLICATION   corpus replication factor for the build phase
                      (default 8 — documents×8 so the build measures real
                      distributed work, not session overhead)

Phases:
  index_build      distributed inverted-index build over the replicated
                   corpus → files/sec
  query_p50/p95    single-query latency over the reference-style query set
                   against the built index (bucket-pruned join plan)
  batch_queries    set-at-a-time batch of all queries in one job
  bm25_topk etc.   flagship surface queries straight off the sf tables
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "spark join table",
    "window merge",
    "vector stream",
    "table scan filter",
    "data query",
    "hash group order",
    "batch window",
    "customer line value",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replication = int(os.environ.get("BENCH_REPLICATION", "8"))
    body_x = int(os.environ.get("BENCH_BODY_X", "1"))
    # BENCH_PARTITIONS pins shuffle/bucket counts so scaling runs compare the
    # SAME job (same tasks) at different parallelism — see BENCH/scaling.py.
    partitions = int(os.environ.get("BENCH_PARTITIONS", str(max(cpus, 16))))
    phases = set(
        os.environ.get(
            "BENCH_PHASES",
            "build,query,identity,surface,update,wand,wandhot,semantic",
        ).split(",")
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # -- load gate (VERDICT r02 #2): the host is shared; numbers taken under
    # ambient tenant load are not comparable round-over-round.  Wait for a
    # quiet window (1-min load < BENCH_LOAD_GATE) up to BENCH_LOAD_WAIT s,
    # then record the load actually seen at start + per-phase steal%.
    load_gate = float(os.environ.get("BENCH_LOAD_GATE", "4.0"))
    load_wait = float(os.environ.get("BENCH_LOAD_WAIT", "300"))
    gate_deadline = time.monotonic() + load_wait
    gate_waited = 0.0
    while os.getloadavg()[0] >= load_gate and time.monotonic() < gate_deadline:
        time.sleep(10)
        gate_waited += 10
    load0 = round(os.getloadavg()[0], 2)

    def _cpu_stat():
        with open("/proc/stat") as fh:
            v = list(map(int, fh.readline().split()[1:9]))
        return v

    cpu0 = _cpu_stat()
    phase_steal: dict[str, float] = {}
    # 1-min load at each phase END: co-tenant load inside the VM inflates
    # wall times WITHOUT showing up as hypervisor steal — this attributes
    # mid-run swings the start-of-run gate can't see
    phase_load: dict[str, float] = {}

    def _steal_pct(a, b) -> float:
        return round(100.0 * (b[7] - a[7]) / max(1, sum(b) - sum(a)), 2)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bm25-bench")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", os.environ.get("BENCH_LOCAL_DIR", "/dev/shm/bm25_spark_local"))
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark import surface
    from bm25_index_tool_spark.score import LoadedIndex, score_query, score_query_batch

    timings: dict[str, float] = {}
    diag: dict[str, float] = {}  # instrumentation rows excluded from the total

    # -- corpus: sf documents replicated with distinct paths -----------------
    # Shuffle-free replication: spark.range gives exactly `partitions`
    # evenly-sized splits (no AQE coalescing to defeat the parallelism, no
    # shuffle), the 5000-row base table is broadcast, and the 3GB of
    # generated content materializes wherever it is consumed with full
    # parallelism at any core count.  Row count is arithmetic — no job.
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    corpus = (
        spark.range(0, n_base * replication, 1, partitions)
        .withColumn("doc_id", F.col("id") % n_base)
        .withColumn("rep", (F.col("id") / n_base).cast("long"))
        .join(F.broadcast(base), "doc_id")
        .select(
            F.concat(F.lit("org"), (F.col("doc_id") % 7).cast("string"), F.lit("/"), F.col("source")).alias("repo"),
            F.concat(
                F.lit("src/rep_"), F.col("rep").cast("string"),
                F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt"),
            ).alias("path"),
            F.md5(F.concat(F.col("source"), F.col("doc_id").cast("string"))).alias("commit"),
            "lang",
            (
                F.concat_ws(" ", *([F.col("text")] * body_x))
                if body_x > 1
                else F.col("text")
            ).alias("content"),
        )
    )
    n_files = n_base * replication

    # index store on tmpfs: in production the index lands on S3/HDFS whose
    # bandwidth scales with the cluster; the sandbox's single shared virtio
    # disk (~500 MB/s for ALL tenants) is the one resource that cannot scale
    idx_base = os.environ.get("BENCH_IDX_DIR", "/dev/shm")
    idx_dir = tempfile.mkdtemp(prefix="bm25_bench_idx_", dir=idx_base)
    try:
        c0 = _cpu_stat()
        t0 = time.monotonic()
        B.build_index(
            spark, corpus, idx_dir, name="bench",
            num_buckets=partitions, num_partitions=partitions,
        )
        build_sec = time.monotonic() - t0
        phase_steal["build"] = _steal_pct(c0, _cpu_stat())
        phase_load["build"] = round(os.getloadavg()[0], 2)
        timings["index_build"] = round(build_sec, 3)
        files_per_sec = n_files / build_sec
        # per-stage durations from the build's own lineage checkpoints
        import glob as _glob
        import json as _json
        for ckpt in sorted(_glob.glob(f"{idx_dir}/_checkpoints/stage_*.json")):
            with open(ckpt) as fh:
                j = _json.load(fh)
            stage = j.get("stage", os.path.basename(ckpt))
            timings[f"build_stage_{stage}"] = j.get("duration_sec", 0.0)
            for k, v in j.items():
                if k.endswith("_sec") and k != "duration_sec":
                    timings[f"build_stage_{stage}_{k}"] = v

        # storage footprint — the reference's comparable table row is
        # 31 MB / 2,176 files ≈ 14 KB per doc (content + SQLite index);
        # ours is zstd parquet postings/docs/termstats + checkpoints
        idx_bytes = 0
        for dp, _dn, fns in os.walk(idx_dir):
            for fn in fns:
                try:
                    idx_bytes += os.path.getsize(os.path.join(dp, fn))
                except OSError:
                    pass
        index_out = {
            "index_bytes_total": idx_bytes,
            "index_bytes_per_doc": round(idx_bytes / n_files, 1),
        }

        index = LoadedIndex.open(spark, idx_dir)

        if "query" in phases:
            # warm: one query to JIT/plan-cache
            score_query(index, QUERIES[0], 10, include_content=False).collect()

            c0 = _cpu_stat()
            lat = []

            for q in QUERIES:
                t = time.monotonic()
                score_query(index, q, 10, include_content=False).collect()
                lat.append(time.monotonic() - t)
            lat_sorted = sorted(lat)
            phase_steal["query"] = _steal_pct(c0, _cpu_stat())
            phase_load["query"] = round(os.getloadavg()[0], 2)
            timings["query_p50"] = round(lat_sorted[len(lat) // 2], 3)
            timings["query_p95"] = round(lat_sorted[max(0, int(len(lat) * 0.95) - 1)], 3)
            timings["query_total"] = round(sum(lat), 3)

            # -- query sub-stage split (VERDICT r04 #5): attribute the
            # large-corpus single-query floor.  Each sub-plan runs as its
            # own job, so a stage's wall time INCLUDES its upstream — read
            # the DELTAS: scored≈postings scan+joins+agg; topk−scored≈
            # global top-k; full−topk≈winners/docs fetch (DPP-pruned r05).
            from bm25_index_tool_spark.score import score_stage_frames

            stages = score_stage_frames(index, QUERIES[0], 10)
            for sname, frame in stages.items():
                t = time.monotonic()
                frame.collect()
                # diagnostics dict, NOT timings: the suite total must stay
                # comparable round-over-round — adding instrumented collects
                # to the summed dict would be a self-inflicted "regression"
                diag[f"query_stage_{sname}"] = round(
                    time.monotonic() - t, 3
                )

        t = time.monotonic()
        score_query_batch(index, QUERIES, 10).collect()
        timings["batch_queries"] = round(time.monotonic() - t, 3)

        if "query" in phases:
            # warm path: postings/termstats pinned in executor cache
            index.preload()
            c0 = _cpu_stat()
            warm = []
            for q in QUERIES:
                t = time.monotonic()
                score_query(index, q, 10, include_content=False).collect()
                warm.append(time.monotonic() - t)
            ws = sorted(warm)
            phase_steal["query_warm"] = _steal_pct(c0, _cpu_stat())
            phase_load["query_warm"] = round(os.getloadavg()[0], 2)
            timings["query_warm_p50"] = round(ws[len(ws) // 2], 3)
            timings["query_warm_p95"] = round(ws[max(0, int(len(ws) * 0.95) - 1)], 3)
            index.unload()

        identity_out: dict = {}
        if "identity" in phases and n_files <= int(
            os.environ.get("BENCH_IDENTITY_MAX", "80000")
        ):
            # north-rule headline metric, measured in-artifact: top-k
            # rank-identity rate vs the reference's physical engine (SQLite
            # FTS5 bm25()) on the reference query set over THIS corpus —
            # the same differential oracle the test suite locks semantics
            # against (tests/oracle.py), plus the per-row sha256(content)
            # invariant.  Driver-side oracle cost is reported separately
            # and excluded from the suite total; gated off above
            # BENCH_IDENTITY_MAX files (SQLite insert is O(N) driver work).
            import hashlib as _hashlib
            import math as _math
            import sys as _sys

            _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tests.oracle import FTS5Oracle
            from bm25_index_tool_spark.corpus import ordered_rows

            t = time.monotonic()
            rows = [
                (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
                for r in corpus.collect()
            ]
            oracle = FTS5Oracle()
            oracle.add_documents(ordered_rows(rows))
            oracle_sec = round(time.monotonic() - t, 3)
            ok = 0
            for q in QUERIES:
                exp = oracle.search_bm25(q, top_k=10)
                got = score_query(index, q, 10).collect()
                ident = (
                    [g["doc_id"] for g in got] == [e[0] for e in exp]
                    and all(
                        _math.isclose(e[4], g["score"], rel_tol=1e-9)
                        and g["path"] == e[1]
                        and g["content_sha256"]
                        == _hashlib.sha256(e[3].encode()).hexdigest()
                        for e, g in zip(exp, got)
                    )
                )
                ok += ident
            identity_out = {
                "rank_identity_rate": round(ok / len(QUERIES), 4),
                "rank_identity_queries": len(QUERIES),
                "rank_identity_oracle_sec": oracle_sec,
            }

        if "update" in phases:
            # TRUE-delta incremental update: ~1% of documents modified.
            # Only the delta is tokenized; postings/docs merge per changed
            # bucket/partition (incremental.py) — compare against
            # index_build (the full-rebuild cost of the same corpus).
            from bm25_index_tool_spark.incremental import apply_update

            cur = corpus.withColumn(
                "content",
                F.when(
                    F.crc32(F.col("path")) % 100 == 0,
                    F.concat_ws(" ", F.col("content"), F.lit("deltamarker update")),
                ).otherwise(F.col("content")),
            )
            c0 = _cpu_stat()
            t = time.monotonic()
            apply_update(spark, idx_dir, cur)  # default = LSM append
            timings["incremental_update_1pct"] = round(time.monotonic() - t, 3)
            phase_steal["update"] = _steal_pct(c0, _cpu_stat())
            phase_load["update"] = round(os.getloadavg()[0], 2)
            from bm25_index_tool_spark.delta_store import LAST_UPDATE_TIMINGS

            for k, v in LAST_UPDATE_TIMINGS.items():
                timings[f"update_{k}_sec"] = v
            # compaction is the deferred half of the append strategy's cost
            # — measured separately: latency-critical ingest pays only the
            # append, compaction amortizes in the background
            from bm25_index_tool_spark.delta_store import compact_index

            t = time.monotonic()
            compact_index(spark, idx_dir)
            timings["compaction_after_1pct"] = round(time.monotonic() - t, 3)

            # streaming-shaped upsert: a ~100-file micro-batch through the
            # same path foreachBatch uses (mode=upsert, append strategy) —
            # the latency a continuous-ingest trigger pays
            k = max(n_files // 100, 1)
            batch = corpus.where(F.crc32(F.col("path")) % k == 1).withColumn(
                "content",
                F.concat_ws(" ", F.col("content"), F.lit("microbatch tick")),
            )
            c0 = _cpu_stat()
            t = time.monotonic()
            apply_update(spark, idx_dir, batch, mode="upsert")
            timings["upsert_microbatch_100"] = round(time.monotonic() - t, 3)
            phase_steal["upsert_cold"] = _steal_pct(c0, _cpu_stat())
            phase_load["upsert_cold"] = round(os.getloadavg()[0], 2)
            from bm25_index_tool_spark.delta_store import (
                LAST_UPDATE_TIMINGS as _UT,
            )

            for k2, v2 in _UT.items():
                timings[f"upsert_{k2}_sec"] = v2
            # second tick: the steady-state trigger cost — diffs against the
            # cached stored-docs projection instead of re-scanning the index
            batch2 = batch.withColumn(
                "content",
                F.concat_ws(" ", F.col("content"), F.lit("tick two")),
            )
            c0 = _cpu_stat()
            t = time.monotonic()
            apply_update(spark, idx_dir, batch2, mode="upsert")
            timings["upsert_microbatch_warm"] = round(time.monotonic() - t, 3)
            phase_steal["upsert_warm"] = _steal_pct(c0, _cpu_stat())
            phase_load["upsert_warm"] = round(os.getloadavg()[0], 2)
            for k2, v2 in _UT.items():
                timings[f"upsert_warm_{k2}_sec"] = v2
            # tiered merge: fold the two outstanding micro-batch segments
            # (cost ∝ delta, never O(base) — the steady-state compaction)
            from bm25_index_tool_spark.delta_store import merge_segments

            t = time.monotonic()
            merge_segments(spark, idx_dir, upto_seg=1 << 30)
            timings["tiered_merge_2segs"] = round(time.monotonic() - t, 3)

        if "wand" in phases:
            from bm25_index_tool_spark.blocks import build_blocks
            from bm25_index_tool_spark.wand import wand_search

            c0 = _cpu_stat()
            t = time.monotonic()
            build_blocks(spark, idx_dir, num_shards=partitions)
            timings["blocks_build"] = round(time.monotonic() - t, 3)
            wand_search(index, QUERIES[0], 10).collect()  # warm
            lat = []
            for q in QUERIES:
                t = time.monotonic()
                wand_search(index, q, 10).collect()
                lat.append(time.monotonic() - t)
            ls = sorted(lat)
            phase_steal["wand"] = _steal_pct(c0, _cpu_stat())
            phase_load["wand"] = round(os.getloadavg()[0], 2)
            timings["wand_p50"] = round(ls[len(ls) // 2], 3)
            timings["wand_p95"] = round(ls[max(0, int(len(ls) * 0.95) - 1)], 3)

        if "semantic" in phases:
            # semantic-search scale path: vector store (chunk + embed all
            # docs), IVF ANN over it, then exact-scan vs ANN-probe latency
            # on the same queries — the ANN's win is reading nprobe cell
            # partitions instead of every chunk vector
            from bm25_index_tool_spark.vector import (
                build_vector_ann,
                build_vector_index,
                semantic_search_index,
            )

            c0 = _cpu_stat()
            t = time.monotonic()
            build_vector_index(spark, idx_dir)
            timings["vector_store_build"] = round(time.monotonic() - t, 3)
            t = time.monotonic()
            build_vector_ann(spark, idx_dir, m=64)
            timings["vector_ann_build"] = round(time.monotonic() - t, 3)
            sq = QUERIES[:3]
            results: dict[str, list] = {"scan": [], "ivf": []}
            for method, key in (("scan", "semantic_scan_p50"),
                                ("ivf", "semantic_ivf_p50")):
                semantic_search_index(
                    spark, idx_dir, sq[0], 10, method=method
                ).collect()  # warm
                lat = []
                for q in sq:
                    t = time.monotonic()
                    rows = semantic_search_index(
                        spark, idx_dir, q, 10, method=method
                    ).collect()
                    lat.append(time.monotonic() - t)
                    results[method].append({r["path"] for r in rows})
                timings[key] = round(sorted(lat)[len(lat) // 2], 3)
            # ANN quality alongside its speed: recall@10 of the IVF probe
            # vs the exact scan on the same queries (1.0 = probes covered
            # every true neighbor's cell).  The deterministic fake embedder
            # yields near-uniform vectors — IVF's worst case (neighbors
            # spread evenly over cells, so recall ≈ nprobe/m); sweep nprobe
            # to show the recall/cost curve rather than one point.  Real
            # clustered embeddings sit far above this floor at equal nprobe
            # (test_pipeline's clustered fixture gates recall ≥ 0.9).
            rec = [
                len(s & i) / max(len(s), 1)
                for s, i in zip(results["scan"], results["ivf"])
            ]
            index_out["semantic_ivf_recall_at_10"] = round(
                sum(rec) / len(rec), 3
            )
            from bm25_index_tool_spark.vector import _load_ann_meta

            _ann = _load_ann_meta(idx_dir)
            m_cells = len(_ann["centroids"])
            index_out["semantic_ivf_nprobe_default"] = _ann["nprobe_default"]
            index_out["semantic_ivf_cells"] = m_cells
            # default is m/4 — sweep one point below and one above it
            for frac, npr in (("eighth", m_cells // 8), ("half", m_cells // 2)):
                hits = []
                for qi, q in enumerate(sq):
                    rows = semantic_search_index(
                        spark, idx_dir, q, 10, method="ivf", nprobe=npr
                    ).collect()
                    got = {r["path"] for r in rows}
                    s = results["scan"][qi]
                    hits.append(len(s & got) / max(len(s), 1))
                index_out[f"semantic_ivf_recall_nprobe_{frac}"] = round(
                    sum(hits) / len(hits), 3
                )
            phase_steal["semantic"] = _steal_pct(c0, _cpu_stat())
            phase_load["semantic"] = round(os.getloadavg()[0], 2)

        if "wandhot" in phases:
            # WAND-crossover demo (VERDICT r03 #4): a corpus where every doc
            # matches the query terms (df = N ≫ WAND_DF_THRESHOLD) and tf
            # skew is CLUSTERED in doc_id ranges, so block-max upper bounds
            # prune whole undecoded blocks.  The join plan must shuffle +
            # aggregate every matching row; WAND touches the few blocks that
            # can beat the running top-k.  Auto-selection must pick blocks.
            from bm25_index_tool_spark.blocks import build_blocks as _bb
            from bm25_index_tool_spark.wand import choose_engine, wand_search

            n_hot = int(os.environ.get("BENCH_HOT_DOCS", "320000"))
            hot = spark.range(0, n_hot, 1, partitions).select(
                F.lit("hot").alias("repo"),
                F.concat(
                    F.lit("d/"), F.col("id").cast("string"), F.lit(".txt")
                ).alias("path"),
                F.lit("c0").alias("commit"),
                F.lit("text").alias("lang"),
                F.concat(
                    F.expr("repeat('hotspike ', 1 + int(id / 1000) % 37)"),
                    F.lit("common filler "),
                    F.col("id").cast("string"),
                ).alias("content"),
            )
            hot_dir = tempfile.mkdtemp(prefix="bm25_bench_hot_", dir=idx_base)
            try:
                c0 = _cpu_stat()
                B.build_index(
                    spark, hot, hot_dir, name="hot",
                    num_buckets=partitions, num_partitions=partitions,
                )
                _bb(spark, hot_dir, num_shards=partitions)
                hot_engine = choose_engine(hot_dir)
                hot_idx = LoadedIndex.open(spark, hot_dir)
                hq = "hotspike common"
                score_query(hot_idx, hq, 10, include_content=False).collect()
                wand_search(hot_idx, hq, 10).collect()  # warm both
                jl, wl = [], []
                for _ in range(5):
                    t = time.monotonic()
                    score_query(hot_idx, hq, 10, include_content=False).collect()
                    jl.append(time.monotonic() - t)
                    t = time.monotonic()
                    wand_search(hot_idx, hq, 10).collect()
                    wl.append(time.monotonic() - t)
                timings["hot_join_p50"] = round(sorted(jl)[2], 3)
                timings["hot_wand_p50"] = round(sorted(wl)[2], 3)
                # 1.0 when auto picked blocks on this corpus (df=n_hot)
                timings["hot_auto_picked_blocks"] = float(
                    hot_engine == "blocks"
                )
                phase_steal["wandhot"] = _steal_pct(c0, _cpu_stat())
                phase_load["wandhot"] = round(os.getloadavg()[0], 2)
            finally:
                shutil.rmtree(hot_dir, ignore_errors=True)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # -- flagship surface queries off the raw sf tables ----------------------
    if "surface" in phases:
        c0 = _cpu_stat()
        for name in ["bm25_topk", "dedup_minhash_pairs", "cosine_topk", "simhash"]:
            fn = surface.queries()[name]
            cq = _cpu_stat()
            t = time.monotonic()
            fn(spark, sf_dir).collect()
            timings[name] = round(time.monotonic() - t, 3)
            # per-query steal: attributes any one slow surface row to host
            # noise vs real work (VERDICT r03 #1 — the 2.35→5.51s bm25_topk
            # swing was unattributable without this)
            phase_steal[f"surface_{name}"] = _steal_pct(cq, _cpu_stat())
            # per-row 1-min load too (VERDICT r04 #2): co-tenant load
            # inside the VM inflates wall time without showing as steal
            phase_load[f"surface_{name}"] = round(os.getloadavg()[0], 2)
        phase_steal["surface"] = _steal_pct(c0, _cpu_stat())
        phase_load["surface"] = round(os.getloadavg()[0], 2)

    total = round(sum(timings.values()), 3)
    # -- headline gating (VERDICT r04 #6): an artifact taken under real
    # co-tenant interference must SAY so.  "gated": true means overall
    # steal ≤ BENCH_STEAL_GATE (default 2%) — numbers comparable
    # round-over-round.  Retry protocol when false: re-run in a quieter
    # window (BENCH_LOAD_WAIT raises the wait budget), or re-run only the
    # noisy phases via BENCH_PHASES and read the per-row steal/load maps
    # to attribute any residual outlier before citing it.
    steal_gate = float(os.environ.get("BENCH_STEAL_GATE", "2.0"))
    overall_steal = _steal_pct(cpu0, _cpu_stat())
    print(
        json.dumps(
            {
                "metric": "bm25_spark_headline_suite",
                "value": total,
                "unit": "sec",
                "gated": overall_steal <= steal_gate,
                "steal_gate_pct": steal_gate,
                "queries": {**timings, **diag},
                "sf": sf,
                "n_files_built": n_files,
                "files_per_sec": round(files_per_sec, 1),
                "cpus": cpus,
                "partitions": partitions,
                "load_avg_start": load0,
                "load_gate": load_gate,
                "gate_waited_sec": gate_waited,
                "steal_pct": overall_steal,
                "phase_steal_pct": phase_steal,
                "phase_load": phase_load,
                "body_x": body_x,
                **index_out,
                **identity_out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
