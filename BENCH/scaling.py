"""Scaling-efficiency evidence for the north rule (BASELINE.md): run the
IDENTICAL job (same input, same partition count → same tasks) at N and 4N
parallelism and report throughput at both plus efficiency =
throughput(4N) / (4 × throughput(N)).

No real cluster exists in this sandbox, so parallelism levels are
``local[8]`` vs ``local[32]`` (per the driver's stated protocol).  Each run
is a fresh subprocess of bench.py so JVM/session state never leaks between
levels.

Usage: python BENCH/scaling.py  →  writes BENCH/scaling_results.json and
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_LOW, N_HIGH = 8, 32
PARTITIONS = 32  # pinned: same tasks at both levels
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "16"))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_PARTITIONS=str(PARTITIONS),
        BENCH_REPLICATION=str(REPLICATION),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    t0 = time.strftime("%Y-%m-%dT%H:%M:%S")
    low = run_bench(N_LOW)
    high = run_bench(N_HIGH)

    def tput(r: dict, key: str) -> float:
        return r["n_files_built"] / r["queries"][key] if key == "index_build" else 1.0 / r["queries"][key]

    metrics = {}
    for key, label in [
        ("index_build", "index build (files/sec)"),
        ("batch_queries", "batch query throughput (suites/sec)"),
        ("bm25_topk", "bm25_topk (runs/sec)"),
    ]:
        tl, th = tput(low, key), tput(high, key)
        metrics[key] = {
            "label": label,
            f"throughput_local{N_LOW}": round(tl, 3),
            f"throughput_local{N_HIGH}": round(th, 3),
            "speedup": round(th / tl, 3),
            "efficiency": round(th / (4.0 * tl), 3),
        }

    results = {
        "timestamp": t0,
        "protocol": f"same job, same input ({low['n_files_built']} files), "
        f"{PARTITIONS} partitions, local[{N_LOW}] vs local[{N_HIGH}]",
        "low": low,
        "high": high,
        "metrics": metrics,
    }
    out_json = os.path.join(REPO, "BENCH", "scaling_results.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)

    md = [
        "# BENCH/BASELINE.md — measured numbers & scaling efficiency",
        "",
        f"Generated {t0} by `python BENCH/scaling.py` (fresh subprocess per level;",
        f"identical input: {low['n_files_built']} files, {PARTITIONS} shuffle/bucket partitions;",
        f"parallelism levels local[{N_LOW}] vs local[{N_HIGH}] — the sandbox stand-in for N vs 4N executors).",
        "",
        "| metric | local[8] | local[32] | speedup | efficiency (≥0.8 target) |",
        "|---|---|---|---|---|",
    ]
    for key, m in metrics.items():
        md.append(
            f"| {m['label']} | {m[f'throughput_local{N_LOW}']} | "
            f"{m[f'throughput_local{N_HIGH}']} | {m['speedup']}× | {m['efficiency']} |"
        )
    md += [
        "",
        "## Raw per-phase timings (sec)",
        "",
        "| phase | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for k in low["queries"]:
        md.append(f"| {k} | {low['queries'][k]} | {high['queries'][k]} |")
    md += [
        "",
        "## Reference comparison",
        "",
        f"- Reference single-node build throughput claim: ~2,070 files/s "
        f"(BASELINE.md); ours at local[{N_HIGH}]: "
        f"**{round(low['n_files_built'] / high['queries']['index_build'], 1)} files/s** "
        f"on {low['n_files_built']} files including full postings/stats/manifest write.",
        "- Reference warm query latency ~5 ms on 2,176 docs (in-process SQLite); "
        f"ours p50 {high['queries']['query_p50']} s / p95 {high['queries']['query_p95']} s "
        f"on {low['n_files_built']} docs — dominated by Spark job-launch overhead, "
        "amortized away by the set-at-a-time batch plan "
        f"(8 queries in {high['queries']['batch_queries']} s).",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(md))
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
