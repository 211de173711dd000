"""Distributed inverted-index build (SURVEY.md §2.3, §7 step 3).

What the reference delegates to SQLite FTS5 triggers at INSERT time
(reference ``storage/sqlite_storage.py:204-225``) is rebuilt here as an
idiomatic Spark dataflow:

    corpus (repo, path, commit, lang, content)
      → deterministic doc_id assignment (range-partitioned sort + offsets,
        no single-partition window, no monotonically_increasing_id)
      → one vectorized tokenize of the FTS document (path ⊕ filename ⊕
        content — all three FTS5 columns at weight 1.0, SURVEY.md §2.4)
      → explode → partial+final hash-agg to postings (term, doc_id, tf, dl)
        [dl denormalized into postings so query-time scoring never joins
         the N-row doc-length table — scale-critical]
      → term stats (df) as a DataFrame aggregate
      → term-hash-bucketed, sorted parquet + JSON manifest
      → per-stage checkpoints with per-bucket lineage/metrics (resumable)

Skew note: the postings aggregation keys on (term, doc_id) — cardinality is
per-(term,doc) so hot terms do NOT skew the agg.  The bucketed write uses
``repartition(bucket, term)`` + ``sortWithinPartitions``; hot buckets are
bounded by num_buckets choice, and AQE handles residual imbalance.  For the
block-format path, postings of terms with df > salt_threshold are split
into doc_id-sharded salted runs (blocks.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import dataclasses
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from bm25_index_tool_spark.tokenize import token_count_unicode61, tokenizer_for

INDEX_FORMAT_VERSION = 1
DEFAULT_NUM_BUCKETS = 32
BROADCAST_IDS_THRESHOLD = int(
    os.environ.get("BM25_BROADCAST_IDS_THRESHOLD", "5000000")
)

DOCS_DIR = "docs"
POSTINGS_DIR = "postings"
TERMSTATS_DIR = "termstats"
BLOCKS_DIR = "blocks"
CHECKPOINT_DIR = "_checkpoints"
MANIFEST = "manifest.json"


@dataclass
class BM25Params:
    """Carried in the manifest.  The reference *stores* configurable k1/b but
    FTS5 always scores with k1=1.2, b=0.75 (reference ``core/indexer.py:42``,
    SURVEY.md §0) — unlike the reference, our scorer genuinely applies these.
    Defaults match FTS5 so default-profile ranking is reference-identical.
    """

    k1: float = 1.2
    b: float = 0.75


@dataclass
class IndexManifest:
    name: str
    num_docs: int
    avgdl: float
    num_buckets: int
    tokenizer_profile: str = "unicode61"
    params: BM25Params = field(default_factory=BM25Params)
    index_version: int = INDEX_FORMAT_VERSION
    created_at: str = ""
    source: dict = field(default_factory=dict)
    # exact corpus token count (avgdl = total_tokens / num_docs) — carried
    # so incremental updates can delta-adjust avgdl without a full scan;
    # -1 in manifests written before this field existed
    total_tokens: int = -1
    # monotonic doc_id high-water mark: the next id an incremental update
    # may mint.  Persisted so id rotation NEVER reuses an id that ever
    # existed — a tombstoned max-id must not be re-minted (the tombstone
    # anti-join would hide the new doc) and a compaction must not reset the
    # counter.  -1 in manifests written before this field existed; readers
    # fall back to max(doc_id) over base ∪ segments BEFORE the tombstone
    # filter (ADVICE r03).
    next_doc_id: int = -1

    def to_json(self) -> str:
        d = dict(self.__dict__)
        d["params"] = self.params.__dict__
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "IndexManifest":
        d = json.loads(s)
        d["params"] = BM25Params(**d["params"])
        # forward compat: drop keys a NEWER engine may have added — a
        # rollback (or mixed-version cluster on a shared index root) must
        # still read every manifest (code-review r05); missing-field
        # defaults below handle the backward direction
        known = {f.name for f in dataclasses.fields(cls)}
        m = cls(**{k: v for k, v in d.items() if k in known})
        if m.total_tokens < 0 and m.num_docs >= 0:
            # pre-field manifest: reconstruct from avgdl (exact — avgdl was
            # computed as total/num_docs in double, round-trips for realistic
            # corpus sizes)
            m.total_tokens = int(round(m.avgdl * m.num_docs))
        return m


def load_manifest(index_dir: str) -> IndexManifest:
    with open(os.path.join(index_dir, MANIFEST)) as f:
        return IndexManifest.from_json(f.read())


def save_manifest(index_dir: str, manifest_json: str) -> None:
    """Commit the manifest atomically (tmp + fsync + os.replace).  An
    in-place truncate-and-write would let a concurrent reader — every
    query revalidates the handle against the manifest stat — load a torn
    or empty file; the os.replace guarantees readers only ever see a
    complete committed manifest, matching the rename discipline every
    other index file already follows."""
    path = os.path.join(index_dir, MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(manifest_json)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Deterministic doc_id assignment — scalable (no global single-partition sort)
# ---------------------------------------------------------------------------

# Natural-sort key columns mirroring reference core/file_discovery.py:97-112:
# (first integer embedded in the filename, then the name); we order globally
# by (repo, dirname, natural_int, filename, path) — the oracle fixture
# inserts rows in the identical order so SQLite rowid == doc_id.
_BIG = 2**62


def _order_cols():
    return [
        F.col("repo"),
        F.col("_dirname"),
        F.col("_natint"),
        F.col("filename"),
        F.col("path"),
    ]


def with_derived_columns(corpus: DataFrame) -> DataFrame:
    """Add full_path / filename / natural-sort helper columns."""
    return (
        corpus.withColumn("full_path", F.concat_ws("/", "repo", "path"))
        .withColumn("filename", F.element_at(F.split(F.col("path"), "/"), -1))
        .withColumn(
            "_dirname", F.regexp_replace(F.col("path"), r"[^/]+$", "")
        )
        .withColumn(
            "_natint",
            F.coalesce(
                F.nullif(
                    F.regexp_extract(F.col("filename"), r"(\d+)", 1), F.lit("")
                ).cast("long"),
                F.lit(_BIG),
            ),
        )
    )


def assign_doc_ids(
    corpus: DataFrame,
    num_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Deterministic contiguous ``doc_id`` (1-based, FTS5-rowid-like) without
    a driver bottleneck or an extra shuffle:

    1. project the NARROW key columns (repo, path + derived sort helpers) —
       content bytes never enter the range shuffle or the Arrow sockets,
    2. range-partition + sort within partitions (global order across
       ordered partitions); persist the (tiny) sorted keys — on a real
       cluster a staging-parquet write serves the same purpose
       fault-tolerantly,
    3. collect per-partition row COUNTS only, prefix-sum to offsets,
    4. assign ``doc_id = offset[pid] + position`` as a pure JVM expression:
       position within the sorted partition comes from the low 33 bits of
       ``monotonically_increasing_id()`` (documented layout: partition id
       in the high bits, per-partition record index in the low 33), the
       offset from a literal array indexed by ``spark_partition_id()``.
       No window function → no second shuffle, and — unlike the previous
       ``mapInArrow`` assigner — no JVM↔Python boundary at all (guide §4:
       the id column was the only thing Python created; the Arrow
       round-trip and the Python-worker pool spin-up were pure overhead),
    5. hash-join (repo, path, doc_id, derived cols) back to the full corpus
       — a plain JVM shuffle join that scales with cores/executors.
    """
    keys, total, persisted = _narrow_ids(
        with_derived_columns(corpus.select("repo", "path")), num_partitions
    )
    # the sorted-keys frame stays persisted (determinism under recompute);
    # callers pass `cleanup` and unpersist once their writes materialize —
    # otherwise every build/update pins one cached key table for the life
    # of the session (code-review r05)
    if cleanup is not None:
        cleanup.append(persisted)
    # The ids table is narrow (repo, path, doc_id); broadcast it while it
    # fits so the full-width corpus (content!) never shuffles.  Past the
    # threshold a plain shuffle join takes over — the 10^12-file regime.
    if total <= BROADCAST_IDS_THRESHOLD:
        keys = F.broadcast(keys)
    return corpus.join(keys, ["repo", "path"])


def _narrow_ids(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    cols = _order_cols()
    if num_partitions:
        df = df.repartitionByRange(num_partitions, *cols)
    else:
        df = df.repartitionByRange(*cols)
    from pyspark import StorageLevel

    df = (
        df.sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .drop("_dirname", "_natint")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the counts aggregation doubles as the cache materialization — one job,
    # not checkpoint + count.  (Partition placement stays deterministic under
    # recompute: the range shuffle's map output is reused, not resampled.)
    counts = {
        r["_pid"]: r["cnt"]
        for r in df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    # dense offsets array indexed by partition id (empty partitions get the
    # running offset too — they contribute no rows, the value is unused)
    n_parts = (max(counts) + 1) if counts else 0
    offsets, acc = [0] * n_parts, 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    # Pure-JVM id assignment over the sorted partitions (stays inside
    # whole-stage codegen; no Python workers, no Arrow transpose):
    # monotonically_increasing_id() is documented as (partitionId << 33) +
    # record-index-within-partition, so the low 33 bits are exactly the
    # 0-based position in the sorted partition — deterministic here because
    # the input is the persisted range-shuffled sort (same property the
    # Arrow assigner relied on).  A single partition can't exceed 2^33 rows
    # (Spark's own shuffle limit is far lower).
    off_arr = (
        F.array(*[F.lit(o) for o in offsets]) if offsets else F.array(F.lit(0))
    )
    out = df.withColumn(
        "doc_id",
        (
            F.element_at(off_arr, F.col("_pid") + 1)
            + F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
            + 1
        ).cast("long"),
    ).drop("_pid")
    return (
        out,
        acc,
        df,  # the persisted frame, for the caller's deferred unpersist
    )


# ---------------------------------------------------------------------------
# Checkpointed build stages (resumable; FIXTURES.md §7)
# ---------------------------------------------------------------------------


class BuildCheckpoints:
    """Per-stage lineage + metrics checkpoints.  A stage whose checkpoint
    records status=complete is skipped on re-run (resume).  Generalizes the
    reference's per-batch ``indexing_progress`` JSON resume
    (reference ``vector/indexer.py:221-263``, ``sqlite_storage.py:791-818``)
    to distributed partitioned writes.
    """

    def __init__(self, index_dir: str):
        self.dir = os.path.join(index_dir, CHECKPOINT_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"stage_{stage}.json")

    def is_complete(self, stage: str) -> bool:
        p = self._path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("status") == "complete"

    def mark_complete(self, stage: str, metrics: dict) -> None:
        tmp = self._path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"status": "complete", "stage": stage, **metrics}, f, indent=2)
        os.replace(tmp, self._path(stage))

    def read(self, stage: str) -> dict:
        with open(self._path(stage)) as f:
            return json.load(f)


# extension → MIME map (reference derives mime per file at ingest via
# mimetypes.guess_type with an application/octet-stream fallback,
# ``vector/indexer.py:80-99``; the core text indexer stores text/plain,
# ``core/indexer.py:86``).  Kept as data so the Spark Column expression and
# the DuckDB oracle CASE are generated from ONE source (surface.mime_counts).
MIME_BY_EXT = {
    "py": "text/x-python",
    "java": "text/x-java",
    "scala": "text/x-scala",
    "go": "text/x-go",
    "rs": "text/x-rust",
    "c": "text/x-c",
    "h": "text/x-c",
    "cpp": "text/x-c++",
    "js": "text/javascript",
    "ts": "text/typescript",
    "json": "application/json",
    "yaml": "application/yaml",
    "yml": "application/yaml",
    "xml": "application/xml",
    "html": "text/html",
    "css": "text/css",
    "md": "text/markdown",
    "sql": "application/sql",
    "sh": "application/x-sh",
    "toml": "application/toml",
    "csv": "text/csv",
    "txt": "text/plain",
    "png": "image/png",
    "jpg": "image/jpeg",
    "gif": "image/gif",
    "pdf": "application/pdf",
}
MIME_FALLBACK = "text/plain"  # text corpus: reference core/indexer.py:86


def mime_from_path(path_col) -> F.Column:
    """MIME type from the path's extension — pure Column expression: ONE
    lower+regexp_extract per row and a literal-map GetMapValue lookup.
    (A chained CASE would inline the regexp into every branch condition —
    27 regex evaluations per row, measured as +30% on the docs stage.)"""
    ext = F.lower(F.regexp_extract(path_col, r"\.([A-Za-z0-9]+)$", 1))
    mapping = F.create_map(
        *[F.lit(x) for pair in MIME_BY_EXT.items() for x in pair]
    )
    return F.coalesce(mapping[ext], F.lit(MIME_FALLBACK))


def mime_case_sql(path_sql: str) -> str:
    """The DuckDB twin of ``mime_from_path`` — generated from the same map."""
    ext = f"lower(regexp_extract({path_sql}, '\\.([A-Za-z0-9]+)$', 1))"
    whens = "\n".join(
        f"WHEN '{e}' THEN '{m}'" for e, m in MIME_BY_EXT.items()
    )
    return f"CASE {ext} {whens} ELSE '{MIME_FALLBACK}' END"


def docs_derived_columns(ids: DataFrame) -> DataFrame:
    """Content-derived columns of the docs table (sha256/md5/size/mime/
    timestamp) — shared by the full build and the incremental delta path."""
    return (
        ids.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("content_md5", F.md5(F.col("content")))
        .withColumn("size", F.length("content").cast("long"))
        .withColumn("mime_type", mime_from_path(F.col("path")))
        .withColumn("indexed_at", F.current_timestamp())
    )


def _fts_document() -> F.Column:
    """The FTS5 'document' = all three indexed columns at weight 1.0
    (path, filename, content — verified in SURVEY.md §2.4: tf counts hits in
    all three and dl sums all three).  A single space-joined concat
    tokenizes identically to tokenizing the columns separately, so one
    vectorized pass suffices.
    """
    return F.concat_ws(" ", F.col("full_path"), F.col("filename"), F.col("content"))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    name: str = "default",
    *,
    tokenizer_profile: str = "unicode61",
    params: BM25Params | None = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    num_partitions: int | None = None,
    resume: bool = False,
    fail_after_stage: str | None = None,
    source: dict | None = None,
    validate_unique_paths: bool = False,
) -> IndexManifest:
    """Build (or resume building) a BM25 index at ``index_dir``.

    ``fail_after_stage`` injects a failure for the resume test fixture.
    ``validate_unique_paths`` raises ValueError when (repo, path) is not
    unique — the reference enforces path uniqueness via its SQLite UNIQUE
    constraint (``sqlite_storage.py:183``); here it is an optional check
    (one extra aggregate) because the common ingestion path guarantees it.
    """
    if validate_unique_paths:
        dup = (
            corpus.groupBy("repo", "path")
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            raise ValueError(
                f"Duplicate document path in corpus: {r['repo']}/{r['path']}"
            )
    # serialize with any concurrent updater/compactor on the same dir —
    # create --overwrite racing an update would interleave their staged
    # writes (delta_store.write_lock; reentrant, advisory, cross-process)
    from bm25_index_tool_spark.delta_store import write_lock

    with write_lock(index_dir):
        return _build(
            spark,
            corpus,
            index_dir,
            name=name,
            tokenizer_profile=tokenizer_profile,
            params=params,
            num_buckets=num_buckets,
            num_partitions=num_partitions,
            resume=resume,
            fail_after_stage=fail_after_stage,
            source=source,
            ids_preassigned=False,
        )


def _build(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    name: str,
    tokenizer_profile: str,
    params: BM25Params | None,
    num_buckets: int,
    num_partitions: int | None,
    resume: bool,
    fail_after_stage: str | None,
    source: dict | None,
    ids_preassigned: bool,
) -> IndexManifest:
    params = params or BM25Params()
    if not resume and os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    ckpt = BuildCheckpoints(index_dir)
    tok = tokenizer_for(tokenizer_profile)

    docs_path = os.path.join(index_dir, DOCS_DIR)
    postings_path = os.path.join(index_dir, POSTINGS_DIR)
    termstats_path = os.path.join(index_dir, TERMSTATS_DIR)

    def _stage(stage: str, fn) -> dict:
        if ckpt.is_complete(stage):
            return ckpt.read(stage)
        t0 = time.monotonic()
        metrics = fn()
        metrics["duration_sec"] = round(time.monotonic() - t0, 4)
        ckpt.mark_complete(stage, metrics)
        if fail_after_stage == stage:
            raise RuntimeError(f"injected failure after stage {stage}")
        return ckpt.read(stage)

    # -- stage 1: docs table with deterministic doc_id + invariants ---------
    # The docs table is partitioned by doc_pt = pmod(doc_id, num_buckets):
    # incremental updates rewrite only the partitions containing changed
    # doc_ids (IO ∝ delta, not corpus), and point lookups by doc_id prune
    # to one partition.
    def _docs() -> dict:
        t_ids0 = time.monotonic()
        _id_cache: list = []
        if ids_preassigned:
            ids = with_derived_columns(corpus).drop("_dirname", "_natint")
        else:
            ids = assign_doc_ids(corpus, num_partitions, cleanup=_id_cache)
        # sub-timing: assign_doc_ids runs the range-sample + counts jobs
        # eagerly; everything after is the derived-column + write job
        ids_sec = round(time.monotonic() - t_ids0, 4)
        # defensive: a low-split source (tiny parquet, driver-created DF)
        # would serialize the hash/write work below into a handful of tasks
        target_p = num_partitions or spark.sparkContext.defaultParallelism
        if ids.rdd.getNumPartitions() < target_p:
            ids = ids.repartition(target_p, "doc_id")
        out = docs_derived_columns(ids).withColumn(
            "doc_pt", F.pmod(F.col("doc_id"), F.lit(num_buckets))
        )
        # Observation: row count rides along with the write — no read-back
        # job and no up-front emptiness probe (isEmpty would re-run the id
        # assignment).  A dynamic partitionBy write of an empty relation
        # leaves an unreadable dir; detect that from the observed count
        # afterwards and replace with a schema'd empty plain parquet.
        from pyspark.sql import Observation

        obs = Observation("docs_metrics")
        out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        # no sortWithinPartitions here: sorting full content rows costs real
        # CPU+spill and nothing reads docs in doc_id order (lookups prune by
        # doc_pt; top-k joins broadcast)
        (
            out.repartition(num_buckets, "doc_pt")
            .write.mode("overwrite")
            .partitionBy("doc_pt")
            .parquet(docs_path)
        )
        rows = obs.get["rows"]
        for _p in _id_cache:  # docs parquet is written; key cache done
            _p.unpersist()
        if rows == 0:
            spark.createDataFrame([], out.schema).write.mode(
                "overwrite"
            ).parquet(docs_path)
        return {"rows": rows, "ids_sec": ids_sec}

    m_docs = _stage("docs", _docs)
    num_docs = m_docs["rows"]
    docs = spark.read.parquet(docs_path)

    # -- stages 2-3: ONE tokenize pass; termstats derive from the postings
    # parquet (a cheap columnar term scan) rather than a persisted tf
    # relation — caching the full (doc_id, term, tf, dl) relation costs
    # more than the read-back saves (measured at local[2]).  The tokenizer
    # (the dominant CPU cost) still runs exactly once over the corpus.
    from bm25_index_tool_spark.arrow_tokenize import doc_term_freqs

    # Explicit repartition before the tokenizer: a small docs table read back
    # from parquet may coalesce into 1-2 input splits (file packing), which
    # would serialize the CPU-heavy tokenize stage.  At 100 TB the scan has
    # ample natural splits and this is a cheap even-out; locally it is the
    # difference between 1 core and all cores tokenizing.
    tokenize_parallelism = num_partitions or max(
        num_buckets, spark.sparkContext.defaultParallelism
    )
    # Tokenize + per-doc tf entirely in Arrow C++ (arrow_tokenize.py): each
    # doc lives in one row, so (doc_id, term, tf) leaves the map already
    # aggregated — no JVM explode, no 10^2-tokens-per-doc shuffle blow-up.
    # (The pandas-UDF tokenizer remains the semantic reference; differential
    # equality is asserted in tests/test_arrow_tokenize.py.)  Both built-in
    # profiles (unicode61, code) take the Arrow path; unknown future
    # profiles keep the general pandas-UDF fallback.
    from bm25_index_tool_spark.arrow_tokenize import ARROW_PROFILES

    repart = docs.repartition(tokenize_parallelism, "doc_id")
    if tokenizer_profile in ARROW_PROFILES:
        # dl arrives denormalized from the Arrow worker (each doc is one
        # input row → its total token count is complete in-batch): postings
        # need NO doc_id shuffle at all downstream of the tokenizer.
        tfs = doc_term_freqs(repart, _fts_document(), profile=tokenizer_profile)
    else:
        from pyspark.sql.window import Window

        tfs = (
            repart.select("doc_id", F.explode(tok(_fts_document())).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("int").alias("tf"))
            .withColumn(
                "dl",
                F.sum("tf").over(Window.partitionBy("doc_id")).cast("int"),
            )
        )

    def _postings() -> dict:
        # dl is already denormalized in tfs (computed inside the tokenize
        # worker — zero extra shuffle; the former separate doclens stage
        # dominated low-parallelism builds, VERDICT r01 #5).  No persist, no
        # Observation on this hot write: tokenizer output flows straight
        # into the bucket exchange → sort → write.
        post = tfs.withColumn(
            "bucket", F.pmod(F.hash("term"), F.lit(num_buckets))
        )
        if num_docs == 0:
            # dynamic partitionBy writes no files for an empty relation,
            # leaving an unreadable dir — write a schema'd empty parquet
            post.write.mode("overwrite").parquet(postings_path)
            return {"rows": 0, "per_bucket_rows": {}}
        t_w0 = time.monotonic()
        (
            # "bucket" sort prefix: satisfies the dynamic-partition writer's
            # required ordering (partition cols first), so the writer adds
            # NO second sort — one sort pass instead of two over the full
            # postings relation.  Within each bucket= dir the file order is
            # (term, doc_id), exactly as before.
            post.repartition(num_buckets, "bucket")
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(postings_path)
        )
        write_sec = round(time.monotonic() - t_w0, 4)
        # partition-column-only scan: row counts come from parquet metadata
        per_bucket = {
            str(r["bucket"]): r["cnt"]
            for r in spark.read.parquet(postings_path)
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        return {
            "rows": sum(per_bucket.values()),
            "per_bucket_rows": per_bucket,
            "write_sec": write_sec,
        }

    _stage("postings", _postings)

    def _termstats() -> dict:
        # df and Σtf per term derive from the WRITTEN postings — a narrow
        # (term, tf) columnar scan with map-side partial aggregation; the
        # total-token sum for avgdl rides along as an Observation.  This
        # replaces a second pass over a persisted 10^8-row tf relation
        # (cache write + memory pressure cost more than this scan).
        from pyspark.sql import Observation

        src = spark.read.parquet(postings_path)
        stats = (
            src.groupBy("term")
            .agg(
                F.count("*").cast("long").alias("df"),
                F.sum("tf").cast("long").alias("_ttf"),
            )
            .withColumn("bucket", F.pmod(F.hash("term"), F.lit(num_buckets)))
        )
        if num_docs == 0:
            stats.select("term", "df", "bucket").write.mode(
                "overwrite"
            ).parquet(termstats_path)
            return {"rows": 0, "total_tokens": 0}
        obs = Observation("termstats_metrics")
        (
            stats.repartition(num_buckets, "bucket")
            .sortWithinPartitions("bucket", "term")
            .observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                F.sum("_ttf").alias("total_tokens"),
            )
            .select("term", "df", "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(termstats_path)
        )
        got = obs.get
        return {"rows": got["rows"], "total_tokens": int(got["total_tokens"] or 0)}

    m_ts = _stage("termstats", _termstats)
    if m_ts.get("total_tokens") is None:
        # resuming over a pre-r02 'termstats' checkpoint that recorded only
        # {rows}: recompute from the written postings (sum tf == total token
        # occurrences) instead of KeyError-ing (ADVICE r02)
        row = (
            spark.read.parquet(postings_path)
            .agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("t"))
            .collect()[0]
        )
        m_ts["total_tokens"] = int(row["t"])
    # FTS5 avgdl = total_tokens / nRow over ALL docs — zero-token documents
    # count in the denominator (they are rows in the FTS table with dl=0).
    # A mean over only docs-with-postings would diverge on corpora with
    # empty or punctuation-only files (ADVICE r01).
    avgdl = m_ts["total_tokens"] / num_docs if num_docs else 0.0

    manifest = IndexManifest(
        name=name,
        num_docs=int(num_docs),
        avgdl=float(avgdl),
        num_buckets=num_buckets,
        tokenizer_profile=tokenizer_profile,
        params=params,
        created_at=time.strftime("%Y-%m-%dT%H:%M:%S"),
        source=source or {},
        total_tokens=int(m_ts["total_tokens"]),
        # assign_doc_ids is 1-based contiguous → first free id is N+1
        next_doc_id=int(num_docs) + 1,
    )
    save_manifest(index_dir, manifest.to_json())
    return manifest
