"""Tokenizer goldens — query-side cases ported from the reference's own
test suite (``/root/reference/tests/test_fts5_escape.py``) plus index-side
unicode61 cases verified against SQLite FTS5 (FIXTURES.md §4)."""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest

from bm25_index_tool_spark.tokenize import (
    STOPWORDS,
    _tokenize_series,
    related_terms_local,
    tokenize_fts5_query,
)

# (input, expected space-joined) — semantics of reference tests/test_fts5_escape.py
QUERY_GOLDENS = [
    ("hello", ["hello"]),
    ("hello world", ["hello", "world"]),
    ("vip-layerprd701.dc-ratingen.de", ["vip", "layerprd701", "dc", "ratingen", "de"]),
    ("foo.bar", ["foo", "bar"]),
    ("a:b:c", ["a", "b", "c"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("UPPER Case", ["upper", "case"]),
    ("weird!!punct??", ["weird", "punct"]),
    ("x123 456y", ["x123", "456y"]),
    ("  spaced   out  ", ["spaced", "out"]),
    ("café", ["caf"]),  # ASCII regex drops the é — divergence from index side
    ("tag/sub-tag", ["tag", "sub", "tag"]),
]


@pytest.mark.parametrize("q,expected", QUERY_GOLDENS)
def test_query_tokenizer_goldens(q, expected):
    assert tokenize_fts5_query(q) == expected


@pytest.mark.parametrize("q", ["", "---", "!!!", "_", " . "])
def test_query_tokenizer_empty_raises(q):
    with pytest.raises(ValueError):
        tokenize_fts5_query(q)


INDEX_CASES = [
    "hello world",
    "Hello WORLD",
    "café au lait",
    "snake_case_name",
    "getHttpResponse2",
    "vip-layerprd701.dc-ratingen.de",
    "a1b2c3",
    "",
    "番茄 tomato",
    "naïve élève ÀÇÉ",
    "foo.bar:baz/qux",
    "100% true!",
    # compatibility characters: unicode61 keeps these VERBATIM (no NFKD
    # folding) — ligatures, superscripts, fullwidth forms, enclosed digits
    "ﬁle ﬂow config",
    "x² + y³ units",
    "ｆｕｌｌwidth ＡＢＣ",
    "ℕatural ①②③",
    # non-Latin scripts: diacritics kept (FTS5's fold table is Latin-only)
    "Ωmega άλφα ϊ",
    "й ё Москва straße",
    # Latin Extended Additional (Vietnamese): outside FTS5's fold table
    "ếch việt ồ ậ",
    # µ (micro sign): FTS5 case-folds to Greek μ, Python .lower() does not
    "µ micro",
    # decomposed input: combining marks are stripped inside tokens
    "café latte",
    "žluťoučký kůň ą ć ę",
]


def fts5_tokenize(text: str) -> list[str]:
    """Ground truth: ask SQLite's own unicode61 tokenizer."""
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE VIRTUAL TABLE t USING fts5(c)")
    rows = conn.execute(
        "SELECT token FROM fts5_vocab_helper(?)"
    ) if False else None
    # fts5vocab needs data; simpler: use the fts5 aux via a one-row table
    conn.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    conn.execute("INSERT INTO t VALUES (?)", (text,))
    out = [
        (term, off)
        for term, _doc, _col, off in conn.execute(
            "SELECT term, doc, col, offset FROM v ORDER BY offset"
        )
    ]
    return [term for term, _ in sorted(out, key=lambda x: x[1])]


@pytest.mark.parametrize("text", INDEX_CASES)
def test_index_tokenizer_matches_fts5(text):
    ours = _tokenize_series(pd.Series([text])).iloc[0]
    assert list(ours) == fts5_tokenize(text)


def test_index_tokenizer_matches_fts5_property():
    """Property sweep: random Unicode strings (all planes, no surrogates)
    must tokenize identically to the live FTS5 unicode61 tokenizer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                min_codepoint=0x20,
                max_codepoint=0x10FFFF,
                exclude_categories=("Cs",),
            ),
            max_size=60,
        )
    )
    def check(text):
        ours = _tokenize_series(pd.Series([text])).iloc[0]
        assert list(ours) == fts5_tokenize(text), repr(text)

    check()


def test_related_terms_stopwords_and_length():
    content = "the the the apple apple banana an it to xx yz index index index"
    terms = related_terms_local(content, n=3)
    assert terms == ["index", "apple", "banana"]
    assert "the" in STOPWORDS and "an" in STOPWORDS


# The reference's stopword set, verbatim (reference core/related.py:19-98).
# Membership parity is a rank-identity requirement for related-terms (T3)
# and related-document search (F7): "must"/"shall" must be DROPPED,
# "about"/"their"/"them"/"while" must be KEPT (and can rank as terms).
_REFERENCE_STOPWORDS = {
    "a", "an", "the", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "from", "as", "is", "was", "are", "were", "been",
    "be", "have", "has", "had", "do", "does", "did", "will", "would",
    "could", "should", "may", "might", "must", "shall", "can", "this",
    "that", "these", "those", "i", "you", "he", "she", "it", "we", "they",
    "what", "which", "who", "whom", "when", "where", "why", "how", "all",
    "each", "every", "both", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than",
    "too", "very", "just", "also",
}


def test_stopword_set_matches_reference_verbatim():
    assert len(_REFERENCE_STOPWORDS) == 78
    assert set(STOPWORDS) == _REFERENCE_STOPWORDS


def test_related_terms_reference_membership_semantics():
    # "must"/"shall" are stopwords in the reference — never rank.
    # "about"/"their" are NOT stopwords — they rank on frequency.
    content = "must must must shall shall about about about their their compliance"
    terms = related_terms_local(content, n=5)
    assert terms == ["about", "their", "compliance"]
