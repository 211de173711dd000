"""Tokenizers — the semantic core of rank identity (SURVEY.md §2.2).

Three tokenizers, mirroring the reference's semantics:

* **Index-side** (T1): SQLite FTS5 ``unicode61`` — lowercase, remove
  diacritics, split on non-alphanumeric codepoints.  The reference applies
  this implicitly via its FTS5 virtual-table DDL
  (reference ``storage/sqlite_storage.py:196-201``).  Here it is a
  vectorized Arrow/pandas UDF (``string -> array<string>``) — no per-row
  Python in the Spark hot path.
* **Query-side** (T2): the reference pre-tokenizes query strings with an
  ASCII regex before handing them to FTS5
  (reference ``storage/sqlite_storage.py:31-56``).  Queries are tiny, so
  this runs driver-side as plain Python — replicated verbatim, including
  the ASCII-only divergence from T1 (``café`` -> ``caf``) and the
  lowercasing that neutralizes FTS5 boolean operators (all reference
  queries are conjunctive bags of tokens).
* **Related-terms** (T3): ``\\b[a-z][a-z0-9]+\\b`` + an 80-word stopword
  set + length>2 filter (reference ``core/related.py:19-98``).

A *code-aware* profile (identifier splitting: snake_case, camelCase,
digit boundaries) is layered as an opt-in extension per the north star;
the default profile stays FTS5-exact for rank identity.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

# ---------------------------------------------------------------------------
# T1 — index-side unicode61 tokenizer (vectorized)
# ---------------------------------------------------------------------------

from bm25_index_tool_spark.unicode61_tables import build_translate_table

# Exact unicode61 (remove_diacritics=1) normalization: one str.translate
# table derived by sweeping EVERY Unicode codepoint through SQLite's own
# tokenizer (tools/gen_unicode61_tables.py).  It performs FTS5's case
# folding, its SELECTIVE Latin diacritic fold (NOT full NFD/NFKD: ``ﬁ``,
# ``x²``, fullwidth letters and Greek accents stay verbatim, matching FTS5
# — the previous NFKD approximation over-folded these; ADVICE r01),
# combining-mark deletion, and maps every non-ASCII separator to ' '.
_U61_TABLE = build_translate_table()

# After normalization every remaining non-ASCII char is a token char and
# the ASCII token chars are [a-z0-9] (underscore is a separator in
# unicode61, verified vs SQLite 3.40.1).
_TOKEN_RE = re.compile("[a-z0-9\u0080-\U0010ffff]+")


def fold_unicode61(text: str) -> str:
    """Exact FTS5-unicode61 normalization of one string (case fold +
    diacritic fold + separators -> ' ')."""
    return text.translate(_U61_TABLE)


def _fold_diacritics_series(s: pd.Series) -> pd.Series:
    """Vectorized unicode61 normalization.  Pure-ASCII rows (the common
    case for source code) take the cheap ``.lower()`` path — equivalent to
    the translate table on ASCII; rows with non-ASCII chars go through the
    full table."""
    s = s.fillna("")
    non_ascii = ~s.map(str.isascii)
    if non_ascii.any():
        s = s.copy()
        s[non_ascii] = s[non_ascii].str.translate(_U61_TABLE)
        s[~non_ascii] = s[~non_ascii].str.lower()
        return s
    return s.str.lower()


def _tokenize_series(s: pd.Series) -> pd.Series:
    return _fold_diacritics_series(s).str.findall(_TOKEN_RE)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_unicode61(content: pd.Series) -> pd.Series:
    """``string -> array<string>`` FTS5-unicode61-equivalent tokenizer."""
    return _tokenize_series(content)


@F.pandas_udf(IntegerType())
def token_count_unicode61(content: pd.Series) -> pd.Series:
    """Token count only — cheaper than materializing arrays for doc lengths."""
    return _tokenize_series(content).map(len).astype("int32")


# -- code-aware profile (north-star addition; opt-in) -----------------------

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|(?<=[A-Za-z])(?=\d)|(?<=\d)(?=[A-Za-z])")


def _split_identifiers(text: str) -> str:
    return _CAMEL_RE.sub(" ", text)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_code(content: pd.Series) -> pd.Series:
    """Code-aware tokenizer: camelCase/digit-boundary splitting *before*
    unicode61 rules, so ``getHttpResponse2`` -> [get, http, response, 2]
    in addition to snake_case splits (underscore is already a separator).
    Opt-in profile — NOT used on the rank-identity path.
    """
    pre = content.fillna("").map(_split_identifiers)
    return _tokenize_series(pre)


# Languages whose documents get identifier splitting under the
# ``code_lang`` profile (north-star "lang-specific rules"): prose/markup
# rows keep plain unicode61 so camelCase words in docs stay whole tokens.
CODE_LANGS = frozenset(
    {
        "py", "python", "java", "scala", "js", "javascript", "ts",
        "typescript", "go", "rs", "rust", "c", "cpp", "h", "hpp", "cs",
        "rb", "ruby", "php", "kt", "kotlin", "swift", "sql", "sh", "bash",
    }
)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_code_lang(content: pd.Series, lang: pd.Series) -> pd.Series:
    """Lang-routed tokenizer: identifier splitting for ``lang ∈
    CODE_LANGS`` rows, plain unicode61 otherwise.  Two-column pandas UDF —
    the semantic reference for the Arrow ``code_lang`` path."""
    pre = content.fillna("")
    is_code = lang.fillna("").str.lower().isin(CODE_LANGS)
    if is_code.any():
        pre = pre.copy()
        pre[is_code] = pre[is_code].map(_split_identifiers)
    return _tokenize_series(pre)


PROFILES = {
    "unicode61": tokenize_unicode61,
    "code": tokenize_code,
    "code_lang": tokenize_code_lang,
}


def tokenizer_for(profile: str):
    try:
        return PROFILES[profile]
    except KeyError:
        raise ValueError(
            f"unknown tokenizer profile '{profile}'; expected one of {sorted(PROFILES)}"
        ) from None


# ---------------------------------------------------------------------------
# T2 — query-side tokenizer (driver-side, verbatim semantics)
# ---------------------------------------------------------------------------

_QUERY_SPLIT_RE = re.compile(r"[^a-zA-Z0-9]+")


def tokenize_fts5_query(query: str) -> list[str]:
    """ASCII pre-tokenizer for query strings — reference
    ``storage/sqlite_storage.py:31-56`` semantics: lowercase, split on any
    non-ASCII-alphanumeric run, drop empties.  Raises ``ValueError`` on a
    query that tokenizes to nothing (the reference surfaces FTS5's syntax
    error as ValueError, ``core/searcher.py:63-68``).

    Goldens: reference ``tests/test_fts5_escape.py`` —
    ``vip-layerprd701.dc-ratingen.de`` -> ``vip layerprd701 dc ratingen de``.
    """
    tokens = [t for t in _QUERY_SPLIT_RE.split(query.lower()) if t]
    if not tokens:
        raise ValueError(f"Query produced no searchable tokens: {query!r}")
    return tokens


# ---------------------------------------------------------------------------
# T3 — related-terms tokenizer + stopwords (reference core/related.py:19-98)
# ---------------------------------------------------------------------------

# Stopword set copied VERBATIM from reference core/related.py:19-98 (78
# words); used by related-document search and the quality-score op.  The
# exact membership matters: "must"/"shall"/"every" are dropped by the
# reference, while e.g. "about"/"their"/"them" are kept and can rank.
STOPWORDS: frozenset[str] = frozenset(
    """a an the and or but in on at to for of with by from as is was are
    were been be have has had do does did will would could should may might
    must shall can this that these those i you he she it we they what which
    who whom when where why how all each every both few more most other some
    such no nor not only own same so than too very just also""".split()
)

_RELATED_TOKEN_RE = re.compile(r"\b[a-z][a-z0-9]+\b")


def related_terms_local(content: str, n: int = 10) -> list[str]:
    """Driver-side twin of the related-terms extraction (single document)."""
    from collections import Counter

    toks = [
        t
        for t in _RELATED_TOKEN_RE.findall(content.lower())
        if t not in STOPWORDS and len(t) > 2
    ]
    return [t for t, _ in Counter(toks).most_common(n)]


def explode_terms(df, text_col: str = "content", profile: str = "unicode61"):
    """``df`` + a ``term`` column: one row per token occurrence."""
    tok = tokenizer_for(profile)
    return df.withColumn("term", F.explode(tok(F.col(text_col))))


def sql_stopword_array() -> str:
    """SQL array literal of STOPWORDS (for oracle parity in DuckDB)."""
    inner = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"[{inner}]"


def terms_dataframe(spark, tokens: Iterable[str]):
    """Tiny query-terms DataFrame ``(term, n_occurrences)`` for broadcast.

    Duplicate query tokens score multiplicatively in FTS5 (``apple apple``
    counts the term's partial score twice) — carried as ``q_mult``.
    """
    from collections import Counter

    counts = Counter(tokens)
    return spark.createDataFrame(
        [(t, int(c)) for t, c in counts.items()], "term string, q_mult int"
    )
