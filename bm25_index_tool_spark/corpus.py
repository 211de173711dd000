"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape is exactly the BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
Seeded, order-independent generation — row ``i`` is a pure function of
``(seed, i)`` so any size prefix is reproducible, tests and bench share it,
and no external data is touched.

Content is drawn from a fixed vocabulary engineered to exercise every
scoring branch verified in SURVEY.md §2.4: very common terms (idf ≤ 0 →
1e-6 clamp), rare terms, terms that appear only in paths/filenames,
accented terms (diacritic folding), identifier-shaped tokens, and documents
with numerically-prefixed filenames (natural-sort discovery order).
"""

from __future__ import annotations

import hashlib
import random
import re

REPOS = ["org0/alpha", "org0/beta", "org1/gamma", "org2/delta", "org2/epsilon"]
EXTS = ["py", "md", "java", "scala"]
LANG_BY_EXT = {"py": "python", "md": "markdown", "java": "java", "scala": "scala"}

# Vocabulary tiers: 'the'/'data' end up in most docs (idf clamp); tail terms
# are rare; 'café' exercises diacritic folding; camelCase exercises the code
# profile; kubernetes/networking mirror the reference README's canonical query.
COMMON = ["the", "data", "value", "function", "return"]
MID = [
    "kubernetes", "networking", "spark", "index", "query", "token",
    "partition", "shuffle", "broadcast", "parquet", "schema", "cluster",
    "config", "apple", "banana", "cherry", "merge", "sort", "hash",
]
RARE = [
    "zanzibar", "quetzal", "obelisk", "palindrome", "catamaran",
    "café", "getHttpResponse", "snake_case_name", "vip-layerprd701",
    "dc-ratingen", "xylophone", "marmalade", "periscope", "labyrinth",
]


def _content_for(rng: random.Random, i: int) -> str:
    words: list[str] = []
    n_sentences = rng.randint(2, 6)
    for _ in range(n_sentences):
        n = rng.randint(5, 14)
        for _ in range(n):
            tier = rng.random()
            if tier < 0.55:
                words.append(rng.choice(COMMON))
            elif tier < 0.88:
                words.append(rng.choice(MID))
            else:
                words.append(rng.choice(RARE))
        words.append(".")
    # a few engineered docs for edge cases
    if i % 37 == 0:
        words += ["apple", "banana"]  # conjunctive-AND fixture
    if i % 41 == 0:
        words += ["café", "au", "lait"]
    return " ".join(words)


def generate_rows(n_docs: int, seed: int = 42) -> list[tuple[str, str, str, str, str]]:
    rows = []
    for i in range(n_docs):
        rng = random.Random(seed * 1_000_003 + i)
        repo = REPOS[i % len(REPOS)]
        ext = EXTS[i % len(EXTS)]
        module = f"module_{i % 11}"
        # numeric filename prefixes exercise natural-sort (01-intro vs 10-advanced)
        if i % 9 == 0:
            fname = f"{(i % 12):02d}-notes_{i}.{ext}"
        else:
            fname = f"file_{i}.{ext}"
        path = f"src/{module}/{fname}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        content = _content_for(rng, i)
        rows.append((repo, path, commit, LANG_BY_EXT[ext], content))
    return rows


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def corpus_df(spark, n_docs: int, seed: int = 42, num_partitions: int | None = None):
    rows = generate_rows(n_docs, seed)
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


# -- Python-side twin of build.assign_doc_ids ordering (oracle parity) -------

_NAT_INT_RE = re.compile(r"(\d+)")
_BIG = 2**62


def order_key(repo: str, path: str) -> tuple:
    filename = path.rsplit("/", 1)[-1]
    dirname = path[: len(path) - len(filename)]
    m = _NAT_INT_RE.search(filename)
    natint = int(m.group(1)) if m else _BIG
    return (repo, dirname, natint, filename, path)


def ordered_rows(rows: list[tuple]) -> list[tuple]:
    """Rows in doc_id order (doc_id = 1-based position). The FTS5 oracle
    inserts in this order so SQLite rowid == our doc_id."""
    return sorted(rows, key=lambda r: order_key(r[0], r[1]))
