"""Zero-Python-object tokenization: ``mapInArrow`` + Arrow C++ kernels.

The pandas-UDF tokenizer (tokenize.py) is semantically exact but pays for
materializing every token as a Python string (``str.findall`` is row-wise
CPython).  For the build hot path — hundreds of billions of tokens at the
10^12-file target — this module computes per-document term frequencies
entirely in Arrow C++:

    utf8_lower → split_pattern_regex('[^a-z0-9]+') → list_flatten /
    list_parent_indices → group_by(doc, term).count_all()

No per-row Python, no Python token objects; the Arrow batch that crosses
back into the JVM is already the aggregated ``(doc_id, term, tf)`` relation
(each document lives in exactly one input row, so per-doc counts are
complete within a batch).

Semantics parity: for pure-ASCII text (the overwhelming case for source
code) the C++ path produces exactly the unicode61 tokens of tokenize.py.
Rows containing non-ASCII characters are diverted to the exact Python path
(the FTS5-derived translate table of unicode61_tables.py) inside the same
function — identical output, only slower, and only for the rows that need
it.  Differential equality against the pandas path is asserted in
tests/test_arrow_tokenize.py.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column, DataFrame

from bm25_index_tool_spark.tokenize import _TOKEN_RE, fold_unicode61

_ASCII_SPLIT_PATTERN = "[^a-z0-9]+"

# Code-profile identifier pre-split (tokenize._CAMEL_RE semantics) as RE2
# capture-group replaces — RE2 has no lookarounds, but sequential
# non-overlapping GlobalReplace over these four rules inserts exactly the
# same boundaries (differentially asserted in test_arrow_tokenize.py):
#   camelCase, ACRONYMTail, letter→digit, digit→letter.
_CODE_SPLIT_RULES = [
    (r"([a-z0-9])([A-Z])", r"\1 \2"),
    (r"([A-Z])([A-Z][a-z])", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"\1 \2"),
]


def _presplit_code(arr):
    """C++ identifier splitting: ``getHttpResponse2`` → ``get Http
    Response 2`` ahead of the unicode61 split (spaces are separators).
    The rules only touch ASCII letter/digit boundaries, so applying them
    before the ASCII/non-ASCII routing is safe for both branches."""
    for pat, rep in _CODE_SPLIT_RULES:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    return arr

# dl (per-doc total token count) is computed INSIDE the tokenize worker —
# each document lives in exactly one input row, so its total is complete
# within the batch.  Denormalizing dl here removes the doc_id shuffle the
# build would otherwise need (groupBy or window) just to attach lengths.
TF_SCHEMA = "doc_id long, term string, tf int, dl int"


def _python_rows(
    doc_ids, texts
) -> tuple[list[int], list[str], list[int], list[int]]:
    """Exact-path fallback for non-ASCII rows (rare)."""
    out_ids: list[int] = []
    out_terms: list[str] = []
    out_tfs: list[int] = []
    out_dls: list[int] = []
    for did, txt in zip(doc_ids, texts):
        folded = fold_unicode61(txt)
        counts = Counter(_TOKEN_RE.findall(folded))
        dl = sum(counts.values())
        for term, tf in counts.items():
            out_ids.append(did)
            out_terms.append(term)
            out_tfs.append(tf)
            out_dls.append(dl)
    return out_ids, out_terms, out_tfs, out_dls


def _pin_arrow_threads() -> None:
    """Each Spark Python worker must NOT spin up Arrow's default thread pool
    (os.cpu_count() threads): with N workers that is N×cores threads and the
    workers destroy each other's caches (measured: local[32] slower than
    local[8]).  One Arrow thread per worker — Spark provides the
    parallelism across workers."""
    try:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)
    except Exception:
        pass


def _batch_term_freqs(
    batch: pa.RecordBatch, profile: str = "unicode61"
) -> pa.RecordBatch:
    doc_ids = batch.column(0)
    raw = batch.column(1)
    if profile == "code":
        raw = _presplit_code(raw)
    elif profile == "code_lang":
        # lang-specific rule routing: identifier splitting only for rows
        # whose lang column names a programming language
        from bm25_index_tool_spark.tokenize import CODE_LANGS

        lang = pc.utf8_lower(pc.fill_null(batch.column(2), ""))
        is_code = pc.is_in(lang, value_set=pa.array(sorted(CODE_LANGS)))
        raw = pc.if_else(is_code, _presplit_code(raw), raw)
    # route on the ORIGINAL text: the slow path must see unmodified
    # codepoints (FTS5's case/diacritic fold table is keyed on them;
    # Arrow's utf8_lower can disagree with FTS5's case folding outside
    # ASCII).  utf8_lower is applied only on the ASCII fast branch, where
    # it equals FTS5's folding exactly.
    ascii_mask = pc.string_is_ascii(raw)
    all_ascii = pc.all(ascii_mask).as_py()

    if all_ascii:
        fast_ids, fast_text = doc_ids, pc.utf8_lower(raw)
        slow_ids = slow_text = None
    else:
        fast_ids = pc.filter(doc_ids, ascii_mask)
        fast_text = pc.utf8_lower(pc.filter(raw, ascii_mask))
        inv = pc.invert(ascii_mask)
        slow_ids = pc.filter(doc_ids, inv)
        slow_text = pc.filter(raw, inv)

    # C++ path: split → flatten → parent index → filter empties → group
    # count.  dl (per-doc total token count) is an O(n) bincount over the
    # parent indices — each doc is one input row, so its count is complete
    # here — attached AFTER the group-by via a searchsorted doc_id → batch
    # row lookup (a per-token dl column through the group-by costs ~30%,
    # measured; the post-agg gather touches only the ~7× smaller agg set).
    import numpy as np

    token_lists = pc.split_pattern_regex(fast_text, pattern=_ASCII_SPLIT_PATTERN)
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists)
    nonempty = pc.not_equal(flat, "")
    flat = pc.filter(flat, nonempty)
    parents = pc.filter(parents, nonempty)
    pair_ids = pc.take(fast_ids, parents)
    tbl = pa.table({"doc_id": pair_ids, "term": flat})
    agg = tbl.group_by(["doc_id", "term"], use_threads=False).aggregate(
        [([], "count_all")]
    )
    ids_a = agg.column("doc_id")
    terms_a = agg.column("term")
    tfs_a = agg.column("count_all")

    def _flat(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    parents_np = parents.to_numpy(zero_copy_only=False)
    dl_row = np.bincount(parents_np, minlength=len(fast_ids)).astype(np.int64)
    fast_ids_np = _flat(fast_ids).to_numpy(zero_copy_only=False)
    agg_ids_np = _flat(ids_a).to_numpy(zero_copy_only=False)
    if len(agg_ids_np):
        order = np.argsort(fast_ids_np, kind="stable")
        pos = order[
            np.searchsorted(fast_ids_np[order], agg_ids_np)
        ]
        dls_a = pa.array(dl_row[pos], pa.int64())
    else:
        dls_a = pa.array(np.zeros(0, dtype=np.int64), pa.int64())

    if slow_ids is not None and len(slow_ids):
        s_ids, s_terms, s_tfs, s_dls = _python_rows(
            slow_ids.to_pylist(), slow_text.to_pylist()
        )
        ids_a = pa.chunked_array([_flat(ids_a), pa.array(s_ids, pa.int64())])
        terms_a = pa.chunked_array([_flat(terms_a), pa.array(s_terms, pa.string())])
        tfs_a = pa.chunked_array([_flat(tfs_a), pa.array(s_tfs, pa.int64())])
        dls_a = pa.chunked_array(
            [pc.cast(_flat(dls_a), pa.int64()), pa.array(s_dls, pa.int64())]
        )

    return pa.RecordBatch.from_arrays(
        [
            _flat(ids_a),
            _flat(terms_a),
            pc.cast(_flat(tfs_a), pa.int32()),
            pc.cast(_flat(dls_a), pa.int32()),
        ],
        names=["doc_id", "term", "tf", "dl"],
    )


ARROW_PROFILES = ("unicode61", "code", "code_lang")


def doc_term_freqs(
    df: DataFrame,
    text_expr: Column,
    id_col: str = "doc_id",
    profile: str = "unicode61",
) -> DataFrame:
    """``(doc_id, term, tf)`` — the inverted-index source relation, computed
    per input partition with Arrow C++ kernels (one output row per distinct
    (doc, term); rows are already aggregated, no JVM groupBy needed).
    ``profile='code'`` adds the C++ identifier pre-split (north-star
    code-aware tokenization) ahead of identical unicode61 rules;
    ``'code_lang'`` applies it only to rows whose ``lang`` column names a
    programming language (lang-specific rules)."""
    if profile not in ARROW_PROFILES:
        raise ValueError(f"no Arrow path for tokenizer profile {profile!r}")
    cols = [df[id_col].alias("doc_id"), text_expr.alias("_text")]
    if profile == "code_lang":
        cols.append(df["lang"].alias("_lang"))
    src = df.select(*cols)

    def process(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        _pin_arrow_threads()
        for batch in batches:
            if batch.num_rows:
                yield _batch_term_freqs(batch, profile)

    return src.mapInArrow(process, TF_SCHEMA)
