"""LSM-style append path for incremental updates (VERDICT r02 #3).

Why: the per-bucket-swap merge path (incremental.apply_update) rewrites
every bucket/partition a delta term or doc_id lands in.  A *scattered* 1%
delta (the realistic shape — edits spread across the corpus) touches every
one of the ~nb term-hash buckets and doc_pt partitions, so its IO converges
on a full rebuild — the measured 0.79× full-build cost at sf0.1.  No swap
granularity fixes that; scattered updates need the classic log-structured
answer instead (Lucene segments + deletes; Delta/Iceberg/Hudi MOR):

* each update appends an immutable **segment** — new postings / termstat
  adjustments / doc rows — plus a **tombstone** list of replaced doc_ids;
  base files are never touched (byte-identical, trivially so);
* modified documents **rotate** to fresh doc_ids: the old id is tombstoned
  everywhere, the new rows live only in the segment — no in-place edit of
  any base row, and one broadcast anti-join hides every dead row;
* readers compose the live view:
    postings  = (base ∪ segments) ⟕anti tombstones
    docs      = (base ∪ segments) ⟕anti tombstones
    termstats = Σ df over (base ∪ df-adjustment segments), df > 0
  Bucket/doc_pt partition pruning pushes through the union and the
  broadcast anti-join, so query plans keep their shape;
* write IO is ∝ delta: tokenize added∪modified, RE-tokenize the removed
  docs' old content (delta-sized) to derive the negative df adjustments
  and removed token counts — never a postings-table scan;
* read amplification is bounded by **compaction** (`compact_index`): fold
  segments + tombstones back into fresh base tables (a partitioned write
  of the live view — the same job shape as a build's write stages, minus
  tokenization).  `apply_update(strategy="append")` auto-compacts past
  ``auto_compact_segments`` outstanding segments.

Crash safety: a segment becomes visible via a SINGLE ``os.replace`` of its
staged directory per table; a journal written after staging and removed
after the manifest lets recovery roll the (tiny) commit window forward.

The reference has no analogue — its SQLite layer updates rows in place
(``storage/sqlite_storage.py`` upserts); this module is the distributed
re-design of that intent for object-store-backed indexes where files are
immutable and scattered in-place edits are the enemy.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import shutil
import threading
import time as _time_mod

from pyspark.sql import DataFrame, SparkSession, functions as F

POSTINGS_SEG_DIR = "postings_seg"
TERMSTATS_SEG_DIR = "termstats_seg"
DOCS_SEG_DIR = "docs_seg"
TOMBSTONES_DIR = "tombstones"
# vector-store deltas (chunk re-embeds of changed docs; path-keyed
# tombstones) ride the same segment/journal machinery — vector.py owns the
# content, this module owns the layout + commit protocol
VECTOR_SEG_DIR = "vector_seg"
VECTOR_TS_DIR = "vector_tombstones"
SEG_JOURNAL = "_segment.journal"

_SEG_DIRS = (
    POSTINGS_SEG_DIR,
    TERMSTATS_SEG_DIR,
    DOCS_SEG_DIR,
    TOMBSTONES_DIR,
    VECTOR_SEG_DIR,
    VECTOR_TS_DIR,
)

# ---------------------------------------------------------------------------
# Inter-process write lock
#
# Every writer reads shared mutable state before committing — the manifest's
# next_doc_id high-water mark and max(segment_ids) — and stages to a single
# journal path.  Two concurrent writers (a streaming ingest job plus a
# manual `compact`, or two update processes) would mint colliding doc_ids /
# segment numbers and clobber each other's journal.  An advisory flock on
# a SIBLING file <index_dir>.write.lock serializes them across processes —
# sibling, not inside the dir, because an overwrite build rmtree()s the
# index dir and unlinking a held lock inode would let a second writer
# flock a fresh inode and proceed concurrently.  An RLock keyed
# by dir makes it reentrant in-process (apply_update_append auto-compacts
# via merge_segments/compact_index while already holding the lock) and
# serializes threads of one process.  Readers never take it: they only see
# committed state through atomic os.replace.
# ---------------------------------------------------------------------------
WRITE_LOCK_SUFFIX = ".write.lock"


class _DirWriteLock:
    def __init__(self, lock_path: str):
        self._path = lock_path
        self._rlock = threading.RLock()
        self._depth = 0
        self._fd: int | None = None

    def acquire(self, timeout: float | None) -> None:
        # ONE deadline spans the RLock wait AND the flock poll — computing
        # a fresh deadline after the RLock wait would let the total block
        # for up to 2x the configured timeout
        deadline = (
            None if timeout is None else _time_mod.monotonic() + timeout
        )
        if not self._rlock.acquire(
            timeout=-1 if timeout is None else timeout
        ):
            raise TimeoutError(
                f"another thread holds the write lock ({self._path}); "
                "retry or raise BM25_WRITE_LOCK_TIMEOUT"
            )
        try:
            if self._depth == 0:
                import fcntl

                os.makedirs(os.path.dirname(self._path), exist_ok=True)
                fd = os.open(self._path, os.O_CREAT | os.O_RDWR, 0o644)
                try:
                    while True:
                        try:
                            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                            break
                        except (BlockingIOError, PermissionError):
                            if (
                                deadline is not None
                                and _time_mod.monotonic() >= deadline
                            ):
                                raise TimeoutError(
                                    "another writer holds the write lock "
                                    f"({self._path}); retry or raise "
                                    "BM25_WRITE_LOCK_TIMEOUT"
                                )
                            _time_mod.sleep(0.1)
                except BaseException:
                    # close on ANY failure (timeout, EINTR, ENOLCK on
                    # network mounts) — a long-lived retrying driver
                    # would otherwise leak one fd per attempt
                    os.close(fd)
                    raise
                self._fd = fd
            self._depth += 1
        except BaseException:
            self._rlock.release()
            raise

    def release(self) -> None:
        self._depth -= 1
        if self._depth == 0 and self._fd is not None:
            import fcntl

            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None
        self._rlock.release()

    def __enter__(self):
        self.acquire(_lock_timeout())
        return self

    def __exit__(self, *exc):
        self.release()


_DIR_LOCKS: dict[str, _DirWriteLock] = {}
_DIR_LOCKS_GUARD = threading.Lock()


def _lock_timeout() -> float | None:
    v = os.environ.get("BM25_WRITE_LOCK_TIMEOUT")
    return float(v) if v else None


def write_lock(index_dir: str) -> _DirWriteLock:
    """The write lock for one index dir (context manager)."""
    key = os.path.abspath(index_dir)
    with _DIR_LOCKS_GUARD:
        lock = _DIR_LOCKS.get(key)
        if lock is None:
            # sibling of the index dir: survives an overwrite build's
            # rmtree(index_dir), so the flock inode is never unlinked
            # while held
            lock = _DIR_LOCKS[key] = _DirWriteLock(
                key.rstrip(os.sep) + WRITE_LOCK_SUFFIX
            )
        return lock


def _locked_writer(fn):
    """Decorator for ``fn(spark, index_dir, ...)`` writer entry points."""

    @functools.wraps(fn)
    def wrapper(spark, index_dir, *a, **kw):
        with write_lock(index_dir):
            return fn(spark, index_dir, *a, **kw)

    return wrapper


# per-section wall times of the most recent apply_update_append on this
# driver — bench.py copies them out (update_diff_sec etc.) so the fixed-
# floor breakdown of the update cost is measurable, not guessed
LAST_UPDATE_TIMINGS: dict[str, float] = {}

# ---------------------------------------------------------------------------
# Stored-docs diff-projection cache (VERDICT r03 #2)
#
# Every update's diff needs the narrow (full_path, content_md5, doc_id)
# projection of the live docs view.  A continuous-ingest trigger pays that
# base+segments scan once per micro-batch even though between batches the
# projection changes only by the (tiny) delta.  Cache it per index_dir,
# persisted on the executors; validity is an os-level token (manifest
# mtime/size + committed segment ids) so ANY out-of-band writer — another
# process, a merge update, a compaction — invalidates it for free.  After a
# commit the cache advances incrementally: (old ⟕anti removed) ∪ delta,
# localCheckpointed so lineage stays flat across thousands of batches.
# ---------------------------------------------------------------------------
_STORED_PROJ_CACHE: dict[str, tuple[tuple, DataFrame]] = {}


def _index_state_token(index_dir: str, spark: SparkSession | None = None):
    from bm25_index_tool_spark import build as B

    try:
        st = os.stat(os.path.join(index_dir, B.MANIFEST))
    except FileNotFoundError:
        return None
    # the session id guards against serving a localCheckpoint whose
    # SparkContext has been stopped (a process that recreates its session
    # must rebuild the cached projection)
    try:
        app = spark.sparkContext.applicationId if spark is not None else (
            SparkSession.getActiveSession().sparkContext.applicationId
        )
    except Exception:
        app = None
    return (app, st.st_mtime_ns, st.st_size, tuple(segment_ids(index_dir)))


def _stored_projection(spark, index_dir: str, docs: DataFrame) -> DataFrame:
    """Live (full_path, content_md5, doc_id) — cached across updates."""
    tok = _index_state_token(index_dir, spark)
    hit = _STORED_PROJ_CACHE.get(index_dir)
    if hit is not None and hit[0] == tok:
        return hit[1]
    proj = docs.select("full_path", "content_md5", "doc_id").localCheckpoint(
        eager=True
    )
    if hit is not None:
        hit[1].unpersist()
    _STORED_PROJ_CACHE[index_dir] = (tok, proj)
    return proj


def _advance_stored_projection(
    index_dir: str, old: DataFrame, removed_ids: DataFrame, delta: DataFrame
) -> None:
    """Post-commit cache advance: delta-sized work, no base re-scan."""
    new = (
        old.join(F.broadcast(removed_ids.select("doc_id")), "doc_id", "left_anti")
        .unionByName(delta.select("full_path", "content_md5", "doc_id"))
        .localCheckpoint(eager=True)
    )
    old.unpersist()
    _STORED_PROJ_CACHE[index_dir] = (_index_state_token(index_dir), new)


def invalidate_stored_projection(index_dir: str) -> None:
    hit = _STORED_PROJ_CACHE.pop(os.path.abspath(index_dir), None)
    if hit is not None:
        hit[1].unpersist()


def _committed_seg_dirs(index_dir: str, table_dir: str) -> list[str]:
    """COMMITTED ``seg=N`` dirs of one table — in-flight ``.staging`` dirs
    are invisible to readers (a segment becomes visible atomically via the
    final ``os.replace``)."""
    root = os.path.join(index_dir, table_dir)
    if not os.path.isdir(root):
        return []
    return [
        os.path.join(root, n)
        for n in sorted(os.listdir(root))
        if n.startswith("seg=") and not n.endswith(".staging")
    ]


def has_segments(index_dir: str) -> bool:
    return any(_committed_seg_dirs(index_dir, d) for d in _SEG_DIRS)


def segment_ids(index_dir: str) -> list[int]:
    """Committed segment ids across every segment table (an id may appear
    in only some tables — e.g. a vector-only refresh)."""
    ids: set[int] = set()
    for d in _SEG_DIRS:
        for p in _committed_seg_dirs(index_dir, d):
            ids.add(int(os.path.basename(p).split("=", 1)[1]))
    return sorted(ids)


def _seg_path(index_dir: str, table_dir: str, seg: int) -> str:
    return os.path.join(index_dir, table_dir, f"seg={seg}")


def _seg_dir_id(path: str) -> int:
    return int(os.path.basename(path).split("=", 1)[1])


def _read_all_segments(
    spark: SparkSession,
    index_dir: str,
    table_dir: str,
    keep_seg: bool = False,
    upto: int | None = None,
    after: int | None = None,
):
    """Union of all committed segments of one table (None when empty).
    Explicit seg-dir paths + basePath keep partition discovery working
    (``seg``/``bucket``/``doc_pt`` columns) while ignoring staging dirs;
    the ``seg`` column is dropped — readers never care which segment a row
    came from.  ``upto`` restricts to segment ids ≤ upto (tiered merge);
    ``after`` to ids > after (ANN fold absorption skips absorbed dirs
    entirely — no scan is even scheduled)."""
    def _has_parquet(p: str) -> bool:
        for dp, _d, fs in os.walk(p):
            if any(f.endswith(".parquet") for f in fs):
                return True
        return False

    # a delete-only (or add-only) update commits an EMPTY segment for some
    # tables — a partitioned write of an empty relation leaves only
    # _SUCCESS, which is unreadable and contributes nothing; skip those
    dirs = [
        d for d in _committed_seg_dirs(index_dir, table_dir) if _has_parquet(d)
    ]
    if upto is not None:
        dirs = [d for d in dirs if _seg_dir_id(d) <= upto]
    if after is not None:
        dirs = [d for d in dirs if _seg_dir_id(d) > after]
    if not dirs:
        return None
    root = os.path.join(index_dir, table_dir)
    df = spark.read.option("basePath", root).parquet(*dirs)
    if keep_seg:
        return df
    return df.drop("seg") if "seg" in df.columns else df


def tombstones(spark: SparkSession, index_dir: str):
    return _read_all_segments(spark, index_dir, TOMBSTONES_DIR)


def max_ever_doc_id(
    spark: SparkSession, index_dir: str, docs_base: DataFrame
) -> int:
    """Highest doc_id that EVER existed: max over base ∪ doc segments
    BEFORE the tombstone anti-join, so tombstoned (deleted) ids still
    count.  Legacy fallback for manifests without ``next_doc_id`` —
    deriving it from the tombstone-filtered live view reused dead ids,
    whose new rows the anti-join then hid (ADVICE r03, high)."""
    seg = _read_all_segments(spark, index_dir, DOCS_SEG_DIR)
    allrows = (
        docs_base
        if seg is None
        else docs_base.select("doc_id").unionByName(seg.select("doc_id"))
    )
    return allrows.agg(F.max("doc_id")).collect()[0][0] or 0


def _anti_tombstones(df: DataFrame, ts) -> DataFrame:
    if ts is None:
        return df
    # tombstone cardinality ∝ deletes since last compaction — broadcast it
    return df.join(F.broadcast(ts.select("doc_id")), "doc_id", "left_anti")


def postings_view(spark: SparkSession, index_dir: str, base: DataFrame) -> DataFrame:
    seg = _read_all_segments(spark, index_dir, POSTINGS_SEG_DIR)
    out = base if seg is None else base.unionByName(seg.select(*base.columns))
    return _anti_tombstones(out, tombstones(spark, index_dir))


def docs_view(spark: SparkSession, index_dir: str, base: DataFrame) -> DataFrame:
    seg = _read_all_segments(spark, index_dir, DOCS_SEG_DIR)
    out = base if seg is None else base.unionByName(seg.select(*base.columns))
    return _anti_tombstones(out, tombstones(spark, index_dir))


def termstats_view(spark: SparkSession, index_dir: str, base: DataFrame) -> DataFrame:
    """df per term = base df + Σ segment adjustments; terms whose df drops
    to 0 disappear (all their docs tombstoned)."""
    seg = _read_all_segments(spark, index_dir, TERMSTATS_SEG_DIR)
    if seg is None:
        return base
    unioned = base.select("term", "df", "bucket").unionByName(
        seg.select("term", F.col("df_delta").alias("df"), "bucket")
    )
    return (
        unioned.groupBy("term", "bucket")
        .agg(F.sum("df").alias("df"))
        .where(F.col("df") > 0)
        .select(*base.columns)
    )


# ---------------------------------------------------------------------------
# Append one update as a segment
# ---------------------------------------------------------------------------


def recover_segments_if_needed(spark: SparkSession, index_dir: str) -> bool:
    """Roll a crashed segment commit forward: the journal lists the staged
    dirs and the post-commit manifest; each ``os.replace`` is idempotent
    (skipped when the final dir already exists)."""
    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark import incremental as I

    jpath = os.path.join(index_dir, SEG_JOURNAL)
    if not os.path.exists(jpath):
        # a pending MERGE-strategy journal may reference staged vector
        # segment dirs (incremental.apply_update stages them before its own
        # journal) — leave staging alone until recover_if_needed replays it
        if os.path.exists(os.path.join(index_dir, I.JOURNAL)):
            return False
        for d in _SEG_DIRS:  # pre-journal crash: discard stray staging
            root = os.path.join(index_dir, d)
            if os.path.isdir(root):
                for n in os.listdir(root):
                    if n.endswith(".staging"):
                        shutil.rmtree(os.path.join(root, n), ignore_errors=True)
        # include the vector dir: a compaction crash before the journal
        # otherwise leaks an orphaned vector.compact-tmp (ADVICE r03)
        for sub in (B.POSTINGS_DIR, B.TERMSTATS_DIR, B.DOCS_DIR, "vector"):
            shutil.rmtree(
                os.path.join(index_dir, sub + ".compact-tmp"),
                ignore_errors=True,
            )
        return False
    with open(jpath) as f:
        j = json.load(f)

    if j.get("kind") == "seg_merge":
        # tiered merge: folded seg dirs (ids < merged id) were listed in
        # "drop"; staged merged dirs replace the id-upto dirs.  Both halves
        # are idempotent (a missing staged dir means that table's replace
        # already happened)
        for d in j["drop"]:
            shutil.rmtree(d, ignore_errors=True)
        for tmp, live in j["moves"]:
            if os.path.isdir(tmp):
                shutil.rmtree(live, ignore_errors=True)
                os.replace(tmp, live)
        os.remove(jpath)
        return True

    if j.get("kind") == "compact":
        # roll the compaction's directory replaces forward (tmp dirs were
        # fully written before the journal; a missing tmp means that table
        # was already swapped), then drop every segment dir — the new bases
        # contain all segment rows
        for tmp, live in j["moves"]:
            if os.path.isdir(tmp):
                shutil.rmtree(live, ignore_errors=True)
                os.replace(tmp, live)
        for d in _SEG_DIRS:
            shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
        os.remove(jpath)
        return True

    for staged, final in j["moves"]:
        if os.path.isdir(staged) and not os.path.isdir(final):
            os.replace(staged, final)
        elif os.path.isdir(staged):
            shutil.rmtree(staged, ignore_errors=True)
    # blocks before the manifest — see apply_update_append's commit: the
    # manifest stat is the reader-cache version token
    if j.get("blocks_stale") and os.path.exists(
        os.path.join(index_dir, B.BLOCKS_DIR)
    ):
        from bm25_index_tool_spark.blocks import build_blocks

        build_blocks(spark, index_dir)
    B.save_manifest(index_dir, j["manifest_json"])
    os.remove(jpath)
    return True


def _sized_parallelism(
    spark, n_rows: int | None, rows_per_task: int = 2048
) -> int:
    """Scale-adaptive task count for delta-sized jobs (guide §2): a
    micro-batch of a few hundred docs must not fan out into
    defaultParallelism near-empty tasks (each task pays Python-worker
    handshake + conf deserialization), while a million-doc delta still
    uses the full core count.  ``None`` (unknown size) keeps full
    parallelism."""
    full = spark.sparkContext.defaultParallelism
    if n_rows is None:
        return full
    return max(1, min(full, n_rows // rows_per_task + 1))


def _tokenize_rows(
    spark, rows: DataFrame, profile: str, n_rows: int | None = None
) -> DataFrame:
    """(doc_id, full_path, filename, content) → (doc_id, term, tf, dl) with
    the index's tokenizer profile — identical pipeline to the build.
    ``n_rows``, when the caller already knows the delta size (diff counts),
    sizes the tokenize fan-out to the delta instead of the cluster."""
    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark.arrow_tokenize import ARROW_PROFILES

    parallelism = _sized_parallelism(spark, n_rows)
    repart = rows.repartition(parallelism, "doc_id")
    if profile in ARROW_PROFILES:
        from bm25_index_tool_spark.arrow_tokenize import doc_term_freqs

        return doc_term_freqs(repart, B._fts_document(), profile=profile)
    from pyspark.sql.window import Window

    from bm25_index_tool_spark.tokenize import tokenizer_for

    tok = tokenizer_for(profile)
    return (
        repart.select("doc_id", F.explode(tok(B._fts_document())).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        .withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("int")
        )
    )


def full_diff_frame(cur: DataFrame, stored: DataFrame) -> DataFrame:
    """Full-snapshot diff: ``cur`` is the complete corpus, so absence means
    deletion — a full-outer join on the narrow (full_path, md5)
    projections.  Both sides are corpus-sized; the shuffle is inherent to
    full-snapshot semantics (the reference diffs the same way)."""
    # presence must be judged by SIDE markers, not md5 nullness: the
    # streaming corpus schema allows NULL content (md5(NULL) = NULL), so
    # a stored NULL-md5 doc re-presented with real content would read as
    # "added" (minting a second live doc_id for the path) and a current
    # NULL-content row as "deleted".  doc_id is never NULL on the stored
    # side; the literal flag marks the current side; eqNullSafe makes the
    # modified test NULL-correct (NULL vs NULL = same, NULL vs real =
    # modified).
    return (
        cur.select(
            "full_path", "content_md5", F.lit(True).alias("_cur_present")
        )
        .join(stored, "full_path", "full_outer")
        .withColumn(
            "status",
            F.when(F.col("doc_id").isNull(), F.lit("added"))
            .when(F.col("_cur_present").isNull(), F.lit("deleted"))
            .when(
                ~F.col("content_md5").eqNullSafe(F.col("_s")),
                F.lit("modified"),
            )
            .otherwise(F.lit("same")),
        )
        .where(F.col("status") != "same")
        .select("full_path", "status", "doc_id")
    )


def upsert_diff_frame(cur: DataFrame, stored: DataFrame) -> DataFrame:
    """Micro-batch diff (mode="upsert": absence is NOT deletion): the tiny
    batch side is BROADCAST into the stored projection twice — an inner
    join classifies modified-vs-same (stored side streamed, never shuffled
    or sorted) and an anti-join against the (delta-sized) matched paths
    yields the adds.  At 10⁹ stored docs a full-outer diff would shuffle
    the whole narrow projection every trigger; this plan only scans it
    (plan-audited in PLANS.md §streaming upsert)."""
    cur_sel = cur.select("full_path", "content_md5")
    matched = stored.join(F.broadcast(cur_sel), "full_path", "inner")
    modified = (
        # eqNullSafe: the stream schema allows NULL content, and a plain
        # != would silently drop a NULL→real-content update as "same"
        matched.where(~F.col("content_md5").eqNullSafe(F.col("_s")))
        .select("full_path", F.lit("modified").alias("status"), "doc_id")
    )
    id_type = dict(stored.dtypes)["doc_id"]
    added = (
        cur_sel.join(
            F.broadcast(matched.select("full_path")), "full_path", "left_anti"
        )
        .select(
            "full_path",
            F.lit("added").alias("status"),
            F.lit(None).cast(id_type).alias("doc_id"),
        )
    )
    return modified.unionByName(added)


@_locked_writer
def apply_update_append(
    spark: SparkSession,
    index_dir: str,
    current: DataFrame,
    *,
    mode: str = "full",
    auto_compact_segments: int | None = 16,
    auto_compact_strategy: str = "full",
) -> "object":
    """Append-strategy incremental update; returns the new IndexManifest.

    ``auto_compact_strategy``: past ``auto_compact_segments`` outstanding
    segments, "full" folds everything into the base (zero read amp, O(base)
    cost) while "tiered" merges the oldest half into one segment
    (cost ∝ delta — the steady-state ingest choice, see merge_segments).

    One narrow single-pass diff (full outer join on full_path over
    (full_path, md5) projections — content never enters the diff shuffle),
    delta-only tokenization, and a segment commit whose write volume is
    ∝ |added| + |modified| + |deleted|.  See module docstring.
    """
    from pyspark import StorageLevel

    from bm25_index_tool_spark import build as B
    from bm25_index_tool_spark import incremental as I

    import time as _time

    # journals record staged/final paths verbatim — absolutize so recovery
    # run from a different working directory still resolves them (ADVICE r03)
    index_dir = os.path.abspath(index_dir)

    LAST_UPDATE_TIMINGS.clear()
    _t0 = _time.monotonic()

    def _mark(section: str) -> None:
        nonlocal _t0
        now = _time.monotonic()
        LAST_UPDATE_TIMINGS[section] = round(
            LAST_UPDATE_TIMINGS.get(section, 0.0) + (now - _t0), 3
        )
        _t0 = now

    recover_segments_if_needed(spark, index_dir)
    I.recover_if_needed(spark, index_dir)
    manifest = B.load_manifest(index_dir)
    nb = manifest.num_buckets

    docs_base = spark.read.parquet(os.path.join(index_dir, B.DOCS_DIR))
    docs = docs_view(spark, index_dir, docs_base)

    # ---- single-pass NARROW diff ------------------------------------------
    cur = current.withColumn(
        "full_path", F.concat_ws("/", "repo", "path")
    ).withColumn("content_md5", F.md5("content"))
    stored_proj = _stored_projection(spark, index_dir, docs)
    stored = stored_proj.select(
        "full_path", F.col("content_md5").alias("_s"), "doc_id"
    )
    if mode == "upsert":
        diff = upsert_diff_frame(cur, stored)
    elif mode == "full":
        diff = full_diff_frame(cur, stored)
    else:
        raise ValueError(f"unknown update mode {mode!r} (full|upsert)")
    # per-status counts ride the checkpoint materialization as an
    # Observation — no separate count job over the (tiny) diff
    from pyspark.sql import Observation

    obs = Observation("diff_counts")
    diff = diff.observe(
        obs,
        *[
            F.count(F.when(F.col("status") == s, 1)).alias(s)
            for s in ("added", "modified", "deleted")
        ],
    ).localCheckpoint(eager=True)
    got = obs.get
    counts = {k: int(got[k]) for k in ("added", "modified", "deleted")}
    if all(v == 0 for v in counts.values()):
        return manifest

    # duplicate-path rejection is handled by the delta-level guard below
    # (strictly more comprehensive: it also catches a path appearing twice
    # with one copy unchanged) — no separate diff-level job.
    # removed_ids derives from the checkpointed diff: tiny, recomputed
    # locally wherever used — no extra materialization job.
    removed_ids = diff.where(
        F.col("status").isin("deleted", "modified")
    ).select("doc_id")
    _mark("diff")

    # ---- delta docs: added ∪ modified ALL get fresh ids (rotation) ---------
    # ids come from the manifest's monotonic high-water mark, NOT from the
    # live (tombstone-filtered) view — after deleting the max-id docs the
    # next update must not re-mint their ids (ADVICE r03, high)
    if manifest.next_doc_id > 0:
        max_id = manifest.next_doc_id - 1
    else:  # legacy manifest: backfill from base ∪ segments pre-anti-join
        max_id = max_ever_doc_id(spark, index_dir, docs_base)
    # checkpoint the delta rows FIRST (one corpus scan; delta-sized output)
    # so id assignment + tokenize + docs staging never re-scan the corpus
    delta_src = (
        cur.join(
            diff.where(F.col("status").isin("added", "modified"))
            .select("full_path"),
            "full_path",
            "left_semi",
        )
        .select(*I._CORPUS_COLS)
        .localCheckpoint(eager=True)
    )
    _mark("delta_scan")  # corpus scan + semi-join, checkpointed delta rows
    # the diff counts already bound the delta: size every delta-side job to
    # it (guide §2 — a 100-file micro-batch must not fan out into
    # defaultParallelism near-empty tasks, a 10^7-doc delta still uses all
    # cores).  NOT the exact delta row count (a duplicated path adds rows),
    # but the dup guard below rejects that case anyway.
    n_delta = counts["added"] + counts["modified"]
    _id_cache: list = []
    delta_full = B.with_derived_columns(
        B.assign_doc_ids(
            delta_src,
            num_partitions=_sized_parallelism(spark, n_delta, 65_536),
            cleanup=_id_cache,
        )
        .withColumn("doc_id", F.col("doc_id") + F.lit(max_id))
        .select("doc_id", *I._CORPUS_COLS)
    ).drop("_dirname", "_natint")
    _mark("delta_extract")

    # second dup guard (delta-sized): a path appearing twice in `current`
    # with one copy unchanged slips past the diff-level check — both copies
    # land in delta_src via the semi-join and would mint two doc_ids.
    # Checked on the CHECKPOINTED narrow delta (not delta_full, whose plan
    # re-runs the id-assignment join for this one probe).
    dup2 = (
        delta_src.groupBy(F.concat_ws("/", "repo", "path").alias("full_path"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup2:
        raise ValueError(
            f"duplicate full_path in update corpus: {dup2[0]['full_path']!r}"
            " — dedupe the input to one row per path before apply_update"
        )

    delta_post = (
        _tokenize_rows(
            spark, delta_full, manifest.tokenizer_profile, n_rows=n_delta
        )
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(nb)))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    delta_tokens = int(
        delta_post.agg(F.coalesce(F.sum("tf"), F.lit(0))).collect()[0][0]
    )

    # ---- removed docs: re-tokenize OLD content (delta-sized) ---------------
    # gives (a) negative df adjustments per term, (b) removed token count —
    # no postings scan anywhere in this function.  A pure-add micro-batch
    # (the common streaming shape) skips both jobs entirely.
    df_adds = delta_post.groupBy("term").agg(
        F.count("*").cast("long").alias("df_delta")
    )
    if counts["modified"] + counts["deleted"] > 0:
        removed_docs = docs.join(
            F.broadcast(removed_ids), "doc_id", "left_semi"
        ).select("doc_id", "full_path", "filename", "content")
        removed_tfs = _tokenize_rows(
            spark, removed_docs, manifest.tokenizer_profile,
            n_rows=counts["modified"] + counts["deleted"],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        removed_tokens = int(
            removed_tfs.agg(F.coalesce(F.sum("tf"), F.lit(0))).collect()[0][0]
        )
        df_adds = df_adds.unionByName(
            removed_tfs.groupBy("term").agg(
                (-F.count("*")).cast("long").alias("df_delta")
            )
        )
    else:
        removed_tfs = None
        removed_tokens = 0

    _mark("tokenize")
    df_adjust = (
        df_adds.groupBy("term")
        .agg(F.sum("df_delta").alias("df_delta"))
        .where(F.col("df_delta") != 0)
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(nb)))
    )

    # ---- STAGE the segment -------------------------------------------------
    seg = (max(segment_ids(index_dir)) + 1) if segment_ids(index_dir) else 1
    moves: list[tuple[str, str]] = []

    # segment writes are delta-sized: fan out to the delta, not to nb tasks
    # of a few rows each (guide §2/§6 — a micro-batch segment should be a
    # handful of files; one task happily writes every bucket=/doc_pt= dir
    # through the dynamic-partition writer).  Large deltas still spread.
    n_stage_tasks = _sized_parallelism(spark, n_delta, 50_000)

    def _stage(df: DataFrame, table_dir: str, part_col: str | None) -> None:
        final = _seg_path(index_dir, table_dir, seg)
        staged = final + ".staging"
        os.makedirs(os.path.join(index_dir, table_dir), exist_ok=True)
        if part_col:
            # sort prefix = the partition column: satisfies the dynamic
            # writer's required ordering (no second sort inserted) while
            # keeping postings (term, doc_id)-clustered within each bucket
            df2 = (
                df.repartition(n_stage_tasks, part_col).sortWithinPartitions(
                    part_col, "term", "doc_id"
                )
                if table_dir == POSTINGS_SEG_DIR
                else df.repartition(n_stage_tasks, part_col)
            )
            w = df2.write.mode("overwrite").partitionBy(part_col)
        else:
            # tombstones: tiny id list — few files, not one per partition
            w = df.coalesce(4).write.mode("overwrite")
        w.parquet(staged)
        moves.append((staged, final))

    delta_docs = B.docs_derived_columns(delta_full).withColumn(
        "doc_pt", F.pmod(F.col("doc_id"), F.lit(nb))
    )
    # legacy pre-doc_pt base: keep the partition column in the segment
    # anyway (docs_view projects it away when composing with such a base)
    docs_seg_cols = list(docs_base.columns)
    if "doc_pt" not in docs_seg_cols:
        docs_seg_cols.append("doc_pt")

    # all four writes read only persisted/checkpointed inputs — run them as
    # CONCURRENT Spark jobs (one driver thread each) so a small micro-batch
    # pays one write's scheduling latency, not four in series (VERDICT
    # r03 #2); a delete-free batch skips the tombstone write entirely
    stage_jobs = [
        (delta_post.select("term", "doc_id", "tf", "dl", "bucket"),
         POSTINGS_SEG_DIR, "bucket"),
        (df_adjust.select("term", "df_delta", "bucket"),
         TERMSTATS_SEG_DIR, "bucket"),
        (delta_docs.select(*docs_seg_cols), DOCS_SEG_DIR, "doc_pt"),
    ]
    if counts["modified"] + counts["deleted"] > 0:
        stage_jobs.append((removed_ids, TOMBSTONES_DIR, None))
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(stage_jobs)) as pool:
        futs = [pool.submit(_stage, *job) for job in stage_jobs]
        for f in futs:
            f.result()

    # vector store, when present, refreshes in the SAME transaction: chunks
    # of deleted∪modified docs tombstone out, added∪modified docs re-embed
    # (the reference's incremental vector update, commands/update.py:292+)
    if os.path.isdir(os.path.join(index_dir, "vector")):
        from bm25_index_tool_spark.vector import stage_vector_refresh

        removed_paths = diff.where(
            F.col("status").isin("deleted", "modified")
        ).select(F.col("full_path").alias("path"))
        stage_vector_refresh(
            spark, index_dir, delta_full, removed_paths, seg, moves
        )
    _mark("stage_writes")

    new_num_docs = manifest.num_docs - counts["deleted"] + counts["added"]
    new_total = manifest.total_tokens - removed_tokens + delta_tokens
    new_manifest = B.IndexManifest(
        name=manifest.name,
        num_docs=new_num_docs,
        avgdl=(new_total / new_num_docs) if new_num_docs else 0.0,
        num_buckets=nb,
        tokenizer_profile=manifest.tokenizer_profile,
        params=manifest.params,
        created_at=manifest.created_at,
        source=manifest.source,
        total_tokens=new_total,
        # added ∪ modified minted ids max_id+1 .. max_id+n — advance the HWM
        next_doc_id=max_id + counts["added"] + counts["modified"] + 1,
    )

    # ---- JOURNAL + COMMIT (one rename per table) ---------------------------
    jpath = os.path.join(index_dir, SEG_JOURNAL)
    journal = {
        "seg": seg,
        "moves": moves,
        "manifest_json": new_manifest.to_json(),
        "blocks_stale": os.path.exists(os.path.join(index_dir, B.BLOCKS_DIR)),
    }
    with open(jpath + ".tmp", "w") as f:
        json.dump(journal, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(jpath + ".tmp", jpath)

    for staged, final in moves:
        os.replace(staged, final)

    if os.path.exists(os.path.join(index_dir, B.BLOCKS_DIR)):
        # blocks BEFORE the manifest commit: the manifest stat is the
        # reader-cache version token, so a blocks-engine query racing
        # this window caches under the OLD version, which the manifest
        # write below retires — never stale-results-under-new-version
        from bm25_index_tool_spark.blocks import update_blocks

        update_blocks(
            spark, index_dir,
            delta_post.select("term", "doc_id", "tf", "dl"), removed_ids,
        )
    delta_post.unpersist()
    for _p in _id_cache:  # segment writes committed; drop the key cache
        _p.unpersist()
    B.save_manifest(index_dir, new_manifest.to_json())
    if removed_tfs is not None:
        removed_tfs.unpersist()
    os.remove(jpath)
    # advance the diff-projection cache incrementally — the next micro-batch
    # diffs against this instead of re-scanning base ∪ segments
    _advance_stored_projection(index_dir, stored_proj, removed_ids, delta_docs)
    _mark("commit")

    if (
        auto_compact_segments is not None
        and len(segment_ids(index_dir)) >= auto_compact_segments
    ):
        if auto_compact_strategy == "tiered":
            merge_segments(spark, index_dir)
        else:
            compact_index(spark, index_dir)
    return new_manifest


# ---------------------------------------------------------------------------
# Compaction: fold segments + tombstones into fresh base tables
# ---------------------------------------------------------------------------


@_locked_writer
def merge_segments(
    spark: SparkSession, index_dir: str, upto_seg: int | None = None
) -> int:
    """Tiered compaction (VERDICT r03 #7): fold every committed segment
    with id ≤ ``upto_seg`` into ONE merged segment (id = newest folded id)
    WITHOUT touching the base tables.

    Cost ∝ Σ folded segment sizes — never O(base) — so steady-state ingest
    keeps read amplification bounded without ever paying the full fold
    (``compact_index`` rewrites the whole base: ~0.3× a build).  This is
    the LSM L0→L1 step (Lucene's segment merge): ``compact_index`` remains
    the full fold for maintenance windows.

    Correctness leans on the monotonic doc_id high-water mark: ids are
    never reused, so a tombstone with id ≤ upto kills only rows in base or
    folded segments — rows already physically dropped here — and tombstones
    for ids BORN in folded segments can be pruned outright.  Tombstones
    surviving the prune still target base rows; they carry into the merged
    segment.  Outstanding segments/tombstones with id > upto are untouched
    and still compose in the live views.

    Default ``upto_seg``: the median id (fold the oldest half).  Returns
    the number of segment ids folded (0 = nothing to do).  Crash-safe via
    the same journal machinery (kind="seg_merge": drop list + staged
    moves, rolled forward idempotently).
    """
    from bm25_index_tool_spark import build as B

    index_dir = os.path.abspath(index_dir)
    recover_segments_if_needed(spark, index_dir)
    ids = segment_ids(index_dir)
    if upto_seg is None:
        if len(ids) < 2:
            return 0
        # oldest half, but never a 1-segment no-op: with exactly 2
        # outstanding segments fold both (read amp 2→1 at delta cost)
        upto_seg = ids[max(1, (len(ids) + 1) // 2 - 1)]
    folded = [i for i in ids if i <= upto_seg]
    if len(folded) < 2:
        return 0
    upto = folded[-1]
    nb = B.load_manifest(index_dir).num_buckets

    ts = _read_all_segments(spark, index_dir, TOMBSTONES_DIR, upto=upto)
    moves: list[tuple[str, str]] = []

    # task fan-out ∝ folded bytes (guide §2: scale-adaptive partitioning —
    # derive from input size): folding two micro-batch segments is a
    # few-file job, folding months of segments still spreads over nb tasks.
    # The byte count is a driver-side walk of the folded dirs (no Spark job).
    folded_bytes = 0
    for table in _SEG_DIRS:
        for d in _committed_seg_dirs(index_dir, table):
            if _seg_dir_id(d) <= upto:
                for dp, _dn, fns in os.walk(d):
                    for fn in fns:
                        try:
                            folded_bytes += os.path.getsize(
                                os.path.join(dp, fn)
                            )
                        except OSError:
                            pass
    n_merge_tasks = max(1, min(nb, folded_bytes // (128 << 20) + 1))

    def _stage(df, table_dir: str, part_col: str | None, sort_cols=()):
        final = _seg_path(index_dir, table_dir, upto)
        tmp = final + ".staging"
        if part_col:
            df = df.repartition(n_merge_tasks, part_col)
            if sort_cols:
                # part_col prefix satisfies the dynamic writer's required
                # ordering — no second sort inserted
                df = df.sortWithinPartitions(part_col, *sort_cols)
            w = df.write.mode("overwrite").partitionBy(part_col)
        else:
            w = df.coalesce(4).write.mode("overwrite")
        w.parquet(tmp)
        moves.append((tmp, final))

    stage_jobs: list[tuple] = []
    post = _read_all_segments(spark, index_dir, POSTINGS_SEG_DIR, upto=upto)
    if post is not None:
        stage_jobs.append((
            _anti_tombstones(post, ts), POSTINGS_SEG_DIR, "bucket",
            ("term", "doc_id"),
        ))
    tseg = _read_all_segments(spark, index_dir, TERMSTATS_SEG_DIR, upto=upto)
    if tseg is not None:
        stage_jobs.append((
            tseg.groupBy("term", "bucket")
            .agg(F.sum("df_delta").alias("df_delta"))
            .where(F.col("df_delta") != 0)
            .select("term", "df_delta", "bucket"),
            TERMSTATS_SEG_DIR, "bucket",
        ))
    dseg = _read_all_segments(spark, index_dir, DOCS_SEG_DIR, upto=upto)
    if dseg is not None:
        stage_jobs.append((_anti_tombstones(dseg, ts), DOCS_SEG_DIR, "doc_pt"))
    if ts is not None:
        keep_ts = ts.select("doc_id")
        # the prune below relies on the never-reused-id invariant, which
        # only holds for indices whose manifest carries the doc_id
        # high-water mark.  A legacy index (next_doc_id == -1, built before
        # the HWM) may already contain a reused id — dead in base, re-minted
        # in a segment — and pruning its tombstone would RESURRECT the dead
        # base row.  Keep all tombstones there; correctness over compaction
        # gain (ADVICE r04).
        hwm_safe = B.load_manifest(index_dir).next_doc_id > 0
        if dseg is not None and hwm_safe:
            # prune tombstones of ids born in the folded segments: their
            # rows were dropped above and the HWM guarantees no reuse —
            # only base-targeting tombstones survive the merge
            keep_ts = keep_ts.join(
                dseg.select("doc_id"), "doc_id", "left_anti"
            )
        stage_jobs.append((keep_ts, TOMBSTONES_DIR, None))

    # vector store: within the folded group apply the segment-ORDER rule
    # (row alive iff its seg ≥ the path's latest folded tombstone seg);
    # survivors and surviving tombstone paths all take seg id `upto`, which
    # preserves the ordering invariant against segments > upto
    vseg = _read_all_segments(
        spark, index_dir, VECTOR_SEG_DIR, keep_seg=True, upto=upto
    )
    vts = _read_all_segments(
        spark, index_dir, VECTOR_TS_DIR, keep_seg=True, upto=upto
    )
    if vseg is not None:
        alive = vseg
        if vts is not None:
            latest = vts.groupBy("path").agg(F.max("seg").alias("_ts_seg"))
            alive = (
                vseg.join(F.broadcast(latest), "path", "left")
                .where(
                    F.col("_ts_seg").isNull()
                    | (F.col("seg") >= F.col("_ts_seg"))
                )
                .drop("_ts_seg")
            )
        stage_jobs.append((alive.drop("seg"), VECTOR_SEG_DIR, None))
    if vts is not None:
        stage_jobs.append((vts.select("path").distinct(), VECTOR_TS_DIR, None))

    # every staged write reads only committed on-disk segments — run them as
    # concurrent Spark jobs (guide §2.6: back-fill the tail) so a fold of
    # two micro-batch segments pays one write's scheduling latency, not six
    from concurrent.futures import ThreadPoolExecutor

    if stage_jobs:
        with ThreadPoolExecutor(max_workers=len(stage_jobs)) as pool:
            futs = [pool.submit(_stage, *job) for job in stage_jobs]
            for f in futs:
                f.result()

    # drop = every folded dir with id < upto; the id-upto dirs are replaced
    # by the staged moves (and must NOT be in drop — recovery re-runs it)
    drop = [
        d
        for table in _SEG_DIRS
        for d in _committed_seg_dirs(index_dir, table)
        if _seg_dir_id(d) < upto
    ]

    jpath = os.path.join(index_dir, SEG_JOURNAL)
    with open(jpath + ".tmp", "w") as f:
        json.dump({"kind": "seg_merge", "moves": moves, "drop": drop}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(jpath + ".tmp", jpath)
    for d in drop:
        shutil.rmtree(d, ignore_errors=True)
    for tmp, live in moves:
        shutil.rmtree(live, ignore_errors=True)
        os.replace(tmp, live)
    os.remove(jpath)
    # live content is unchanged — revalidate the diff-projection cache
    # in place instead of forcing a rebuild scan on the next micro-batch
    hit = _STORED_PROJ_CACHE.get(index_dir)
    if hit is not None:
        _STORED_PROJ_CACHE[index_dir] = (_index_state_token(index_dir), hit[1])
    # best-effort ANN maintenance (VERDICT r04 #7): absorb the merged
    # vector segment into the partition-pruned fold dirs so steady-state
    # tiered compaction keeps the semantic probe's union tail bounded.
    # Failure is safe: the probe unions the folded segment like any other.
    try:
        from bm25_index_tool_spark import vector as V

        V.absorb_merged_segment_into_ann(spark, index_dir, upto)
    except Exception:
        logging.getLogger(__name__).warning(
            "ANN fold absorption failed for %s (probe stays correct, "
            "just less pruned)", index_dir, exc_info=True,
        )
    return len(folded)


@_locked_writer
def compact_index(spark: SparkSession, index_dir: str) -> None:
    """Materialize the live views as new base tables and drop the segment
    dirs — the same partitioned-write job shapes as the full build's write
    stages, minus tokenization.  Bounded-frequency background work that
    restores zero read amplification; crash-safe via incremental.py's
    journal machinery (whole-directory staging + replace)."""
    from bm25_index_tool_spark import build as B

    index_dir = os.path.abspath(index_dir)  # journaled paths must resolve
    recover_segments_if_needed(spark, index_dir)
    if not has_segments(index_dir):
        return
    nb = B.load_manifest(index_dir).num_buckets
    postings_path = os.path.join(index_dir, B.POSTINGS_DIR)
    termstats_path = os.path.join(index_dir, B.TERMSTATS_DIR)
    docs_path = os.path.join(index_dir, B.DOCS_DIR)

    post = postings_view(spark, index_dir, spark.read.parquet(postings_path))
    ts = termstats_view(spark, index_dir, spark.read.parquet(termstats_path))
    docs = docs_view(spark, index_dir, spark.read.parquet(docs_path))
    if "doc_pt" not in docs.columns:  # pre-doc_pt legacy base
        docs = docs.withColumn("doc_pt", F.pmod(F.col("doc_id"), F.lit(nb)))

    tmp_post = postings_path + ".compact-tmp"
    tmp_ts = termstats_path + ".compact-tmp"
    tmp_docs = docs_path + ".compact-tmp"

    # the three base rewrites read disjoint inputs (live views over
    # committed files) — run them as concurrent Spark jobs (guide §2.6:
    # later jobs back-fill executors freed by the earlier ones' tails)
    def _w_post():
        (
            # part-col sort prefix: no writer-inserted second sort
            post.repartition(nb, "bucket")
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp_post)
        )

    def _w_ts():
        (
            ts.repartition(nb, "bucket")
            .sortWithinPartitions("bucket", "term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp_ts)
        )

    def _w_docs():
        (
            docs.repartition(nb, "doc_pt")
            .sortWithinPartitions("doc_pt", "doc_id")
            .write.mode("overwrite")
            .partitionBy("doc_pt")
            .parquet(tmp_docs)
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [pool.submit(w) for w in (_w_post, _w_ts, _w_docs)]
        for f in futs:
            f.result()
    # a fully-emptied table writes zero partition dirs → unreadable; leave
    # a schema'd empty plain parquet instead (same convention as the build)
    for tmp, df, part_col in (
        (tmp_post, post, "bucket"),
        (tmp_ts, ts, "bucket"),
        (tmp_docs, docs, "doc_pt"),
    ):
        if not any(n.startswith(f"{part_col}=") for n in os.listdir(tmp)):
            spark.createDataFrame([], df.schema).write.mode(
                "overwrite"
            ).parquet(tmp)
    # JOURNAL then commit: every tmp dir is complete before the journal
    # exists, so recovery can always roll FORWARD (replace any table whose
    # tmp still exists, then drop all segment dirs).  Without the journal a
    # crash between replaces would leave a compacted base unioned with its
    # own segments — duplicate rows — which is why the segment dirs are
    # only removed once every base is swapped.
    moves = [
        (tmp_post, postings_path),
        (tmp_ts, termstats_path),
        (tmp_docs, docs_path),
    ]

    # vector store: fold refresh segments + path tombstones the same way
    vec_path = os.path.join(index_dir, "vector")
    if os.path.isdir(vec_path) and (
        _committed_seg_dirs(index_dir, VECTOR_SEG_DIR)
        or _committed_seg_dirs(index_dir, VECTOR_TS_DIR)
    ):
        from bm25_index_tool_spark.vector import vector_view

        tmp_vec = vec_path + ".compact-tmp"
        vector_view(spark, index_dir).write.mode("overwrite").parquet(tmp_vec)
        meta_src = os.path.join(vec_path, "_meta.json")
        if os.path.exists(meta_src):  # sidecar rides along with the swap
            shutil.copyfile(meta_src, os.path.join(tmp_vec, "_meta.json"))
        moves.append((tmp_vec, vec_path))
    jpath = os.path.join(index_dir, SEG_JOURNAL)
    with open(jpath + ".tmp", "w") as f:
        json.dump({"kind": "compact", "moves": moves}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(jpath + ".tmp", jpath)
    for tmp, live in moves:
        shutil.rmtree(live, ignore_errors=True)
        os.replace(tmp, live)
    for d in _SEG_DIRS:
        shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
    os.remove(jpath)
    # compaction preserves live content — revalidate the diff-projection
    # cache in place (same as merge_segments)
    hit = _STORED_PROJ_CACHE.get(index_dir)
    if hit is not None:
        _STORED_PROJ_CACHE[index_dir] = (_index_state_token(index_dir), hit[1])
