"""Deduplication operators for large-scale training-data pipelines.

All four are pure DataFrame compositions (JVM-side expressions — the only
hashes used are ``md5``/``sha2``, which exist identically in Spark and
DuckDB so every operator has a SQL differential oracle):

* **exact**: group by content hash — the classic hash-groupBy dedup.
* **MinHash + LSH**: token-shingle → k min-hashes (min over md5(seed‖
  shingle) hex strings — lexicographic min is engine-portable) → band →
  bucket-join → candidate pairs.  Scale path: the band join shuffles on
  (band, band_signature) so each bucket is tiny; no O(N²) pair blow-up.
* **SimHash**: 16-bit fingerprint from per-term md5 high-bits weighted by
  tf; near-dups share fingerprints (or differ by few bits).
* **n-gram Jaccard**: exact Jaccard over token n-gram sets for candidate
  pairs, via an explode + self-join on shingle + |A∩B|/|A∪B|.

At 100 TB: exact dedup and MinHash banding shuffle on well-distributed hash
keys (no skew); Jaccard verification is restricted to LSH candidates, never
all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_col(text_col: str = "text") -> F.Column:
    """ASCII word tokens — engine-portable (same regex runs in DuckDB)."""
    return F.array_remove(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), "")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per doc: (id, shingle)."""
    toks = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("toks"))
    # n-gram via a join-free slide: shingle i = toks[i..i+n-1]; docs shorter
    # than n tokens produce no shingles (empty sequence guard).
    idx = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
    ).otherwise(F.array().cast("array<int>"))
    return (
        toks.select(
            "id",
            F.explode(
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)))
            ).alias("shingle"),
        )
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts: (content_hash, dup_count, doc_ids)."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_hash"))
        .where(F.col("content_hash").isNotNull())  # NULL ≠ byte-identical
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.sort_array(F.collect_list("id")).alias("doc_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """(id, mh_0..mh_{k-1}): min over md5(f"{seed}|{shingle}") hex strings.
    Lexicographic min over fixed-width hex == min-hash with a 128-bit hash
    family; identical results in any engine with md5()."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    band_bucket_cap: int | None = 100_000,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    ``num_hashes/bands`` tune the S-curve: with r = num_hashes/bands rows
    per band the candidate threshold is ≈ (1/bands)^(1/r) (defaults →
    ≈0.71 Jaccard; production near-dup sweeps use e.g. 128×32 → r=4 at far
    lower collision noise — parameterized, tested at 128 in
    test_pipeline.py).

    ``band_bucket_cap`` (VERDICT r01): a band bucket holding d docs emits
    d(d−1)/2 pairs — 10⁶ exact copies of one boilerplate page would go
    quadratic.  Buckets larger than the cap are dropped before the
    self-join; exact-duplicate groups (the only honest members of such
    mega-buckets) are the job of ``exact_duplicates`` (hash-groupBy, linear),
    and genuine near-dup pairs inside a dropped bucket still surface from
    any other band whose bucket stays under the cap."""
    if bands < 1 or num_hashes % bands != 0:
        # bands > num_hashes would make rows_per_band 0 → EMPTY band_sig →
        # every doc in one mega-bucket per band (quadratic join, or silent
        # zero recall past the cap); a non-divisible combo silently
        # discards trailing hashes and skews the documented S-curve
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(shingles(df, id_col, text_col, shingle_n), num_hashes)
    # ONE projection + posexplode emits all band rows in a single pass —
    # the previous bands-way unionByName re-ran the per-band final
    # aggregation (and its projection) once per branch over the shared
    # exchange (guide §2.4: don't re-scan what one pass can emit)
    band_sigs = F.array(
        *[
            F.concat_ws(
                "|",
                *[f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "id", F.posexplode(band_sigs).alias("band", "band_sig")
    )
    # ONE explicit shuffle on the join key shared by every consumer: the
    # cap aggregate, the anti-join probe and BOTH self-join branches hang
    # off the identical repartition subplan, so ReusedExchange computes the
    # shingle→md5×k→groupBy pipeline once and every consumer reads the one
    # shuffle output (plan-asserted; without it the cold self-join re-ran
    # the pipeline — 7.4 s vs 3.3 s at sf0.1).  This replaces the r5 lazy
    # localCheckpoint, which was result-equal and total-time-equal locally
    # but (a) compiled the subtree EAGERLY at plan-construction time
    # (~2.4 s of driver latency before any job), (b) pinned the banded
    # rows as executor storage blocks, and (c) is not fault-tolerant — a
    # lost executor loses checkpoint blocks unrecoverably, where shuffle
    # output is re-computable (the guide's §2 preference).
    banded = banded.repartition("band", "band_sig")
    if band_bucket_cap is not None:
        big = (
            banded.groupBy("band", "band_sig")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > band_bucket_cap)
            .select("band", "band_sig")
        )
        # anti-join co-partitions with the pair join on (band, band_sig)
        banded = banded.join(big, ["band", "band_sig"], "left_anti")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hot_shingle_cap: int | None = 10_000,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with Jaccard(shingle sets) ≥ threshold.
    Intersection via self-join on shingle (co-partitioned shuffle), union by
    inclusion–exclusion — never materializes the full pair matrix.

    ``hot_shingle_cap`` (VERDICT r01 #3): shingles appearing in more than
    ``cap`` documents are dropped BEFORE the self-join — a shingle with
    document frequency d would otherwise emit d² intermediate rows (one
    boilerplate 3-gram shared by 10⁶ docs = 10¹² rows).  Jaccard is then
    exact over the reduced shingle sets (both the intersection AND the
    per-doc sizes exclude capped shingles).  A hot shingle is by definition
    near-useless evidence of pairwise similarity, so the approximation
    errs only on pairs glued together by boilerplate.  ``None`` disables.
    """
    sh = shingles(df, id_col, text_col, shingle_n)
    # one explicit shuffle on the self-join key feeds all four consumers —
    # hot-shingle aggregate, per-doc sizes, and BOTH self-join branches —
    # via ReusedExchange instead of re-running tokenize→explode→distinct
    # per consumer (same shape + rationale as the minhash fix above; the
    # sizes branch re-keys by id from the same shuffle output)
    sh = sh.repartition("shingle")
    if hot_shingle_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > hot_shingle_cap)
            .select("shingle")
        )
        # anti-join co-partitions with the self-join on shingle below
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))
    )


# hex digits whose bit-3 (value ≥ 8) / bit-2 (value & 4) is set — two
# fingerprint bits extracted per md5 hex digit, giving up to 64 bits from
# the 32-digit md5 (engine-portable: same substring+IN runs in DuckDB)
_HEX_BIT3 = ("8", "9", "a", "b", "c", "d", "e", "f")
_HEX_BIT2 = ("4", "5", "6", "7", "c", "d", "e", "f")


def simhash_bit_digit(b: int) -> tuple[int, tuple[str, ...]]:
    """Fingerprint bit b ← (1-based md5 hex digit position, set-digits)."""
    return b // 2 + 1, (_HEX_BIT3 if b % 2 == 0 else _HEX_BIT2)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, simhash) — per-term bit b from md5(term) hex digits (two bits
    per digit; md5 hex is identical across engines); each bit contributes
    +tf/−tf; fingerprint bit = sign of the sum.

    Default widened to 64 bits (VERDICT r01 #9: 16 bits collide at 10¹²
    docs — E[pairs per fingerprint] ≈ N²/2^bits).  The signed-long
    fingerprint uses two's complement for bit 63 (fp ∈ full int64 range).
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    # ONE shuffle: the tf-weighted bit sum over distinct terms equals the
    # ±1 sum over raw token OCCURRENCES (Σ_term tf·sign ≡ Σ_occurrence
    # sign), so the former groupBy(id, term) tf pre-aggregation — a full
    # extra Exchange — is unnecessary.  The per-occurrence md5 recompute is
    # map-side CPU that partial aggregation amortizes (guide §2.3:
    # aggregate before you shuffle; only id + 64 partial sums cross).
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("term")
    ).withColumn("h", F.md5("term"))
    # Parse the needed md5 hex digits into integer chunks ONCE per row (8
    # hex digits per conv — fits a long), then each fingerprint bit is a
    # shift+mask instead of a substring+IN-set string compare (same values;
    # the DuckDB oracle keeps the readable substring/IN formulation —
    # outputs are bit-identical).  The ~130 per-bit expressions are built
    # as SQL text (selectExpr / F.expr) instead of composed Columns: the
    # Column route cost ~5k py4j round-trips (~1 s of driver time) PER
    # construction; the parsed trees are identical and the whole operator
    # is integer arithmetic, so results cannot differ.
    n_chunks = ((bits - 1) // 2) // 8 + 1
    toks = toks.selectExpr(
        "id",
        *[
            f"CAST(conv(substring(h, {1 + 8 * k}, 8), 16, 10) AS BIGINT) AS c_{k}"
            for k in range(n_chunks)
        ],
    )
    bit_aggs = []
    for b in range(bits):
        pos, _digits = simhash_bit_digit(b)
        k, o = (pos - 1) // 8, (pos - 1) % 8
        # hex digit o (big-endian within the chunk); bit 3 for even b, 2 for odd
        shift = 4 * (7 - o) + (3 if b % 2 == 0 else 2)
        # ±1 per occurrence: branch-free 2·bit − 1
        bit_aggs.append(
            F.expr(f"sum((shiftright(c_{k}, {shift}) & 1) * 2 - 1)").alias(
                f"s_{b}"
            )
        )
    bit_sums = toks.groupBy("id").agg(*bit_aggs)
    fp_terms = " + ".join(
        # two's complement high bit; string-cast keeps LONG_MIN parseable
        f"(CASE WHEN s_{b} > 0 THEN "
        f"CAST('{-(2 ** 63) if b == 63 else 2 ** b}' AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return bit_sums.select(
        "id", F.expr(f"CAST(0 AS BIGINT) + {fp_terms}").alias("simhash")
    )


def embedding_cosine_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 16,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs via seeded SRP-LSH (VERDICT r01 #4): a pair
    is a candidate iff it shares a bucket in ANY of ``n_tables`` tables of
    ``n_bits`` random hyperplanes; exact cosine within candidates.  With
    16 bits the expected bucket occupancy is N/65536 — within-bucket joins
    are bounded by that, never N²/16 like the old 4-fixed-dims variant."""
    from bm25_index_tool_spark.pipeline.simsearch import (
        cosine_expr,
        srp_bucket_sql_col,
        srp_hyperplanes,
    )

    planes = srp_hyperplanes(dim, n_bits, n_tables, seed)
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # NARROW-ID banding (code-review r05): the bucket self-join carries
    # only (table, bucket, id) — carrying the vectors through the
    # n_tables-way union and BOTH join sides would shuffle ~2·n_tables
    # copies of every embedding.  Vectors rejoin only for the (distinct)
    # surviving candidate pairs, exactly the narrow-id pattern the doc_id
    # assignment uses for content.
    # ONE projection + posexplode computes every table's bucket in a single
    # pass over the embeddings (the n_tables-way unionByName re-scanned the
    # source once per table; same fix as write_ann_index — code-review r05)
    buckets = F.array(
        *[srp_bucket_sql_col("`v`", planes[t]) for t in range(n_tables)]
    )
    banded = e.select(
        "id", F.posexplode(buckets).alias("table", "bucket")
    ).repartition("table", "bucket")  # one pass over the SRP expressions,
    # shared by both self-join branches via ReusedExchange (same rationale
    # as minhash_lsh_pairs above)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["table", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pairs = (
        cand.join(
            e.select(F.col("id").alias("id_a"), F.col("v").alias("_va")),
            "id_a",
        )
        .join(
            e.select(F.col("id").alias("id_b"), F.col("v").alias("_vb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("_va"), F.col("_vb")), 9).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    return pairs
