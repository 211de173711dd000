"""Property-based pinning of the BM25 formula against SQLite FTS5 on
randomized corpora — no Spark involved: a pure-Python twin of the engine's
scoring expression (same formula, same clamps, same tie-break) must
reproduce FTS5's ranking on arbitrary small corpora and queries.

The Spark scorers are separately differential-tested against the same
oracle on the fixed corpus (test_rank_identity, test_wand); this test
explores the corpus space (degenerate dls, all-common terms, single-doc
corpora, repeated tokens) that a fixed corpus cannot."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.oracle import FTS5Oracle

VOCAB = ["apple", "banana", "cherry", "the", "data", "zz9", "q"]


def python_bm25(corpus_rows, query_tokens, top_k, k1=1.2, b=0.75):
    """Twin of score.py's expression: tokenize the 3 FTS columns (ASCII
    corpora here → simple split), conjunctive AND, idf clamp, tie-break
    (score desc, doc_id asc)."""
    import re

    tok = lambda s: re.findall(r"[^\W_]+", s.lower())
    docs = []
    for i, (repo, path, _c, _l, content) in enumerate(corpus_rows, start=1):
        full_path = f"{repo}/{path}"
        filename = path.rsplit("/", 1)[-1]
        terms = tok(full_path) + tok(filename) + tok(content)
        docs.append((i, terms))
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n if n else 0.0
    from collections import Counter

    dfs = Counter()
    for _, terms in docs:
        for t in set(terms):
            dfs[t] += 1
    qc = Counter(query_tokens)
    out = []
    for doc_id, terms in docs:
        tf = Counter(terms)
        if any(tf[t] == 0 for t in qc):
            continue
        dl = len(terms)
        score = 0.0
        for t, mult in qc.items():
            raw = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            idf = 1e-6 if raw <= 0 else raw
            score += mult * idf * (tf[t] * (k1 + 1.0)) / (
                tf[t] + k1 * (1.0 - b + b * dl / avgdl)
            )
        out.append((doc_id, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:top_k]


contents = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=30).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(contents, min_size=1, max_size=12),
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3),
    st.integers(min_value=1, max_value=8),
)
def test_formula_matches_fts5(doc_contents, query_tokens, top_k):
    rows = [
        ("org/repo", f"src/d_{i}.txt", "c" * 40, "text", content)
        for i, content in enumerate(doc_contents)
    ]
    oracle = FTS5Oracle()
    oracle.add_documents(rows)
    expected = oracle.search_bm25(" ".join(query_tokens), top_k=top_k)
    got = python_bm25(rows, query_tokens, top_k)
    assert [g[0] for g in got] == [e[0] for e in expected]
    for g, e in zip(got, expected):
        assert math.isclose(g[1], e[4], rel_tol=1e-9), (g, e)
