"""Extra profiling benchmarks (guide §1.4 noop-sink isolation).

Not part of the driver contract — bench.py stays frozen.  Each subcommand
isolates one operator so its computation is timed without the sink, with
jobs labelled for the UI.  Usage:

    python bench_extra.py <phase> [...]

Phases: build_profile, query_profile, surface <name>, update_profile
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F


def session(cpus=None, partitions=None):
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    partitions = partitions or int(os.environ.get("BENCH_PARTITIONS", str(max(cpus, 16))))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bm25-bench-extra")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", os.environ.get("BENCH_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", "/dev/shm/bm25_spark_local")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark, partitions


def bench_corpus(spark, partitions, replication=8):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
            F.col("text").alias("content"),
        )
    )
    return corpus, n_base * replication


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    d = time.monotonic() - t0
    print(f"{label:45s} {d:8.3f}s")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_profile():
    spark, partitions = session()
    sc = spark.sparkContext
    corpus, n_files = bench_corpus(spark, partitions)
    import tempfile
    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark.build import (
        assign_doc_ids, docs_derived_columns, with_derived_columns,
    )

    sc.setJobDescription("corpus noop")
    t("corpus materialize (noop)", lambda: noop(corpus))
    sc.setJobDescription("assign ids")
    cleanup: list = []
    ids = t("assign_doc_ids (eager part)", lambda: assign_doc_ids(corpus, partitions, cleanup=cleanup))
    sc.setJobDescription("ids+derived noop")
    out = docs_derived_columns(ids).withColumn(
        "doc_pt", F.pmod(F.col("doc_id"), F.lit(partitions))
    )
    t("derived cols (noop, no exchange)", lambda: noop(out))
    sc.setJobDescription("derived+repart noop")
    t("derived + repartition(doc_pt) (noop)", lambda: noop(out.repartition(partitions, "doc_pt")))
    idx_dir = tempfile.mkdtemp(prefix="bx_docs_", dir="/dev/shm")
    sc.setJobDescription("docs write partitioned")
    t("repart + partitionBy write", lambda: (
        out.repartition(partitions, "doc_pt").write.mode("overwrite").partitionBy("doc_pt").parquet(idx_dir + "/docs")
    ))
    sc.setJobDescription("docs write no repart")
    t("partitionBy write, no repartition", lambda: (
        out.write.mode("overwrite").partitionBy("doc_pt").parquet(idx_dir + "/docs2")
    ))
    sc.setJobDescription("docs write plain")
    t("plain write (no partitionBy)", lambda: (
        out.write.mode("overwrite").parquet(idx_dir + "/docs3")
    ))
    for p in cleanup:
        p.unpersist()

    # full build for reference
    sc.setJobDescription("full build")
    idx2 = tempfile.mkdtemp(prefix="bx_full_", dir="/dev/shm")
    t("full build_index", lambda: B.build_index(
        spark, corpus, idx2, name="bench",
        num_buckets=partitions, num_partitions=partitions,
    ))
    import shutil
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(idx2, ignore_errors=True)
    spark.stop()


def tokenize_profile():
    spark, partitions = session()
    sc = spark.sparkContext
    corpus, n_files = bench_corpus(spark, partitions)
    import tempfile
    from bm25_index_tool_spark import build as B

    idx2 = tempfile.mkdtemp(prefix="bx_tok_", dir="/dev/shm")
    B.build_index(spark, corpus, idx2, name="bench",
                  num_buckets=partitions, num_partitions=partitions)
    docs = spark.read.parquet(idx2 + "/docs")
    from bm25_index_tool_spark.arrow_tokenize import doc_term_freqs
    from bm25_index_tool_spark.build import _fts_document

    repart = docs.repartition(partitions, "doc_id")
    sc.setJobDescription("tokenize noop")
    tfs = doc_term_freqs(repart, _fts_document())
    t("tokenize (noop)", lambda: noop(tfs))
    t("tokenize (noop) again", lambda: noop(tfs))
    post = tfs.withColumn("bucket", F.pmod(F.hash("term"), F.lit(partitions)))
    sc.setJobDescription("postings repart sort noop")
    t("postings repart+sort (noop)", lambda: noop(
        post.repartition(partitions, "bucket").sortWithinPartitions("term", "doc_id")
    ))
    import shutil
    shutil.rmtree(idx2, ignore_errors=True)
    spark.stop()


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "build_profile"
    if phase == "build_profile":
        build_profile()
    elif phase == "tokenize_profile":
        tokenize_profile()
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
