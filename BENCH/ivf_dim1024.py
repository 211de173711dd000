"""VERDICT r04 #1 evidence: IVF build + probe at PRODUCTION embedding
shape — dim=1024 (the reference's real embedding width,
reference vector/embeddings.py:24-26), m=256 cells — which the old
O(m×dim)-literal `ivf_cell_col` expression tree could not compile
sensibly (±524k literal nodes in one Catalyst expression).  The
assign_cells mapInArrow matmul path keeps the plan flat: centroids ride
in the task closure, cell assignment is one (batch×1024)@(1024×256)
numpy matmul per Arrow batch.

Writes BENCH/ivf_dim1024.json + BENCH/ivf_dim1024_plan.txt (the probe's
formatted plan, PartitionFilters asserted).

Usage: python BENCH/ivf_dim1024.py   [IVF_N=100000 IVF_M=256 env overrides]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = int(os.environ.get("IVF_DIM", 1024))
N = int(os.environ.get("IVF_N", 100_000))
M = int(os.environ.get("IVF_M", 256))
NPROBE = int(os.environ.get("IVF_NPROBE", 16))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession

    from bm25_index_tool_spark.pipeline import simsearch as SS

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ivf-dim1024")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def gen(batches):
        import pyarrow as pa

        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            if not len(ids):
                continue
            rng = np.random.RandomState(int(ids[0]) % (2**31 - 1))
            vals = rng.standard_normal(len(ids) * DIM).astype(np.float32)
            offs = pa.array(
                np.arange(0, (len(ids) + 1) * DIM, DIM, dtype=np.int32)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.ListArray.from_arrays(offs, pa.array(vals, pa.float32())),
                ],
                names=["vec_id", "embedding"],
            )

    emb = (
        spark.range(N)
        .repartition(int(CPUS))
        .mapInArrow(gen, "vec_id long, embedding array<float>")
    )
    # deterministic driver-side centroids: this artifact grades the BUILD +
    # PROBE machinery at production shape, not quantizer quality
    crng = np.random.RandomState(7)
    cents = [
        [float(x) for x in v] for v in crng.standard_normal((M, DIM))
    ]
    qrng = np.random.RandomState(11)
    qv = [float(x) for x in qrng.standard_normal(DIM)]

    path = os.path.join(tempfile.mkdtemp(prefix="ivf1024_"), "ivf")
    t0 = time.monotonic()
    SS.write_ivf_index(emb, path, m=M, centroids=cents)
    build_sec = time.monotonic() - t0
    n_cells = sum(1 for d in os.listdir(path) if d.startswith("cell="))

    probe_secs = []
    rows = None
    for _ in range(3):
        t0 = time.monotonic()
        rows = SS.ivf_index_search(
            spark, path, cents, qv, k=10, nprobe=NPROBE
        ).collect()
        probe_secs.append(time.monotonic() - t0)

    import io
    from contextlib import redirect_stdout

    q = SS.ivf_index_search(spark, path, cents, qv, k=10, nprobe=NPROBE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    pruned = "PartitionFilters" in plan and "cell" in plan
    topk = "TakeOrderedAndProject" in plan

    out = {
        "metric": "ivf_build_probe_dim1024",
        "dim": DIM,
        "n_vectors": N,
        "m": M,
        "nprobe": NPROBE,
        "cells_materialized": n_cells,
        "build_sec": round(build_sec, 3),
        "probe_sec_runs": [round(s, 3) for s in probe_secs],
        "probe_p50_sec": round(sorted(probe_secs)[1], 3),
        "rows_returned": len(rows),
        "probe_partition_pruned": pruned,
        "probe_topk_takeordered": topk,
        "loadavg_1min": round(os.getloadavg()[0], 2),
        "note": (
            "expression-twin comparison omitted: ivf_cell_col at m=256 x "
            "dim=1024 is ~524k literal nodes in one Catalyst expression — "
            "the construct this artifact proves is no longer on any "
            "production path"
        ),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "ivf_dim1024.json"), "w") as f:
        json.dump(out, f, indent=2)
    with open(os.path.join(here, "ivf_dim1024_plan.txt"), "w") as f:
        f.write(plan)
    print(json.dumps(out))
    assert pruned and topk and len(rows) == 10
    import shutil

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
