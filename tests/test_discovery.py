"""Discovery predicate tests (S1): brace expansion cases ported from the
reference's file-discovery tests, glob→regex semantics, ignore filtering,
and the Spark predicate against a corpus DataFrame."""

from __future__ import annotations

import pytest

from bm25_index_tool_spark.discovery import (
    discover,
    expand_braces,
    glob_to_regex,
    ignore_lines_to_regexes,
    ignore_lines_to_rules,
    matches_locally,
)

BRACES = [
    ("*.{md,txt}", ["*.md", "*.txt"]),
    ("a/{x,y}/b{1,2}", ["a/x/b1", "a/x/b2", "a/y/b1", "a/y/b2"]),
    ("plain", ["plain"]),
]


@pytest.mark.parametrize("pattern,expected", BRACES)
def test_expand_braces(pattern, expected):
    assert expand_braces(pattern) == expected


GLOB_CASES = [
    ("src/*.py", "src/a.py", True),
    ("src/*.py", "src/sub/a.py", False),  # * must not cross segments
    ("src/**/*.py", "src/sub/deep/a.py", True),
    ("src/**/*.py", "src/a.py", True),  # **/ matches zero dirs
    ("**/*.md", "README.md", True),
    ("doc?.md", "doc1.md", True),
    ("doc?.md", "doc12.md", False),
]


@pytest.mark.parametrize("pattern,path,expected", GLOB_CASES)
def test_glob_semantics(pattern, path, expected):
    assert matches_locally(pattern, path) is expected


def test_ignore_lines():
    import re

    regs = ignore_lines_to_regexes(
        ["# comment", "", "*.pyc", "build/", "/rooted.txt", "!negated"]
    )
    assert len(regs) == 3

    def ignored(path):
        return any(re.search(r, path) for r in regs)

    assert ignored("a/b/x.pyc")
    assert ignored("build/out.o") and ignored("a/build/out.o")
    assert ignored("rooted.txt") and not ignored("a/rooted.txt")
    assert not ignored("a/b/x.py")


def _excluded_locally(rules, path):
    """Driver-side twin of ignore_excluded_column (last-match-wins)."""
    import re

    state = False
    for negated, rx in rules:
        if re.search(rx, path):
            state = not negated
    return state


def test_ignore_negation_last_match_wins():
    """Gitignore ``!`` re-include semantics (reference uses pathspec
    gitwildmatch, core/file_discovery.py:336-358; ADVICE r01)."""
    rules = ignore_lines_to_rules(["*.log", "!important.log", "debug/"])
    assert [n for n, _ in rules] == [False, True, False]
    assert _excluded_locally(rules, "a/b/x.log")
    assert not _excluded_locally(rules, "a/b/important.log")
    assert _excluded_locally(rules, "debug/x.py")
    # later exclude overrides an earlier re-include
    rules2 = ignore_lines_to_rules(["!keep.txt", "*.txt"])
    assert _excluded_locally(rules2, "keep.txt")
    # re-include after directory exclude (documented divergence from git's
    # parent-dir rule: this subset re-includes)
    rules3 = ignore_lines_to_rules(["logs/", "!logs/keep.log"])
    assert _excluded_locally(rules3, "logs/drop.log")
    assert not _excluded_locally(rules3, "logs/keep.log")


def test_discover_with_negation_on_dataframe(spark):
    rows = [
        ("r", "src/a.log"),
        ("r", "src/important.log"),
        ("r", "src/code.py"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string")
    got = {
        r["path"]
        for r in discover(
            df, "src/**", ignore_lines=["*.log", "!important.log"]
        ).collect()
    }
    assert got == {"src/important.log", "src/code.py"}


def test_discover_on_dataframe(spark):
    rows = [
        ("r", "src/module_1/file_1.py"),
        ("r", "src/module_1/notes.md"),
        ("r", ".git/config"),
        ("r", "build/gen.py"),
        ("r", "src/deep/nested/thing.py"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string")
    got = {
        r["path"]
        for r in discover(
            df, "src/**/*.{py,md}", ignore_lines=["build/"]
        ).collect()
    }
    assert got == {
        "src/module_1/file_1.py",
        "src/module_1/notes.md",
        "src/deep/nested/thing.py",
    }
