#!/usr/bin/env bash
# Packaging check (north rule): the whole build/query path must run via
# spark-submit --py-files on a cluster. Zips the package, submits a job that
# builds an index from the sf0.001 documents table and runs two queries
# through BOTH plans, and asserts non-empty agreeing results.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/bm25_index_tool_spark.zip
rm -f "$ZIP"
(cd . && zip -qr "$ZIP" bm25_index_tool_spark -x '*__pycache__*')

cat > /tmp/bm25_submit_job.py <<'EOF'
import sys, tempfile
from pyspark.sql import SparkSession, functions as F

spark = SparkSession.builder.appName("bm25-submit-smoke").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from bm25_index_tool_spark import build as B
from bm25_index_tool_spark.blocks import build_blocks
from bm25_index_tool_spark.score import LoadedIndex, score_query
from bm25_index_tool_spark.wand import wand_search

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
corpus = docs.select(
    F.concat(F.lit("org/"), F.col("source")).alias("repo"),
    F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
    F.md5(F.col("text")).alias("commit"),
    "lang",
    F.col("text").alias("content"),
)
idx_dir = tempfile.mkdtemp(prefix="bm25_submit_")
B.build_index(spark, corpus, idx_dir, name="smoke", num_buckets=8)
build_blocks(spark, idx_dir, num_shards=4)
index = LoadedIndex.open(spark, idx_dir)
p1 = score_query(index, "spark join table", 5, include_content=False).collect()
p2 = wand_search(index, "spark join table", 5).collect()
assert len(p1) > 0, "plan 1 returned no rows"
assert [r["doc_id"] for r in p1] == [r["doc_id"] for r in p2], "plan mismatch"
print(f"SUBMIT_SMOKE_OK rows={len(p1)} top={p1[0]['doc_id']} score={p1[0]['score']:.6f}")
spark.stop()
EOF

spark-submit \
  --master "local[8]" \
  --conf spark.ui.enabled=false \
  --conf spark.ui.showConsoleProgress=false \
  --conf spark.sql.shuffle.partitions=8 \
  --py-files "$ZIP" \
  /tmp/bm25_submit_job.py 2>&1 | grep -E "SUBMIT_SMOKE_OK|Error|Exception" | head -5
