"""Corpus discovery (SURVEY.md §2.1 S1): the reference walks the filesystem
with glob patterns, brace expansion, ``~``/``$VAR`` expansion and
.gitignore/.bm25ignore filtering (reference ``core/file_discovery.py:183-374``).
Spark-first, "discovery" is predicate construction over the corpus table:
glob patterns become ``rlike`` filters the scanner can push down, ignore
files become NOT-ANY predicates — no driver-side file listing at all.
"""

from __future__ import annotations

import itertools
import os
import re

from pyspark.sql import DataFrame, functions as F


def expand_braces(pattern: str) -> list[str]:
    """``a/{md,txt}/b{1,2}`` → 4 patterns (reference ``:18-48`` semantics:
    cartesian product of brace groups; no nesting)."""
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    head, tail = pattern[: m.start()], pattern[m.end() :]
    out = []
    for alt in m.group(1).split(","):
        out.extend(expand_braces(head + alt + tail))
    return out


def expand_user_vars(pattern: str) -> str:
    """``~`` and ``$VAR`` expansion (reference ``:216-219``)."""
    return os.path.expandvars(os.path.expanduser(pattern))


def glob_to_regex(pattern: str) -> str:
    """Path-aware glob → anchored regex: ``*``/``?`` stay within a path
    segment, ``**`` crosses segments (unlike fnmatch, which the reference
    uses only for post-search path *filters* — discovery globs are
    path-aware)."""
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            if pattern[i : i + 3] == "**/":
                out.append("(?:[^/]+/)*")
                i += 3
                continue
            if pattern[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


# Default hard excludes mirroring the reference's unconditional `.git`
# exclusion (reference ``:329-334``).
HARD_EXCLUDES = [r"(^|/)\.git(/|$)"]


def _ignore_line_to_regex(line: str) -> str:
    anchored = line.startswith("/")
    line = line.lstrip("/")
    if line.endswith("/"):
        body = glob_to_regex(line.rstrip("/"))[1:-1]
        return (f"^{body}(/|$)") if anchored else (f"(^|/){body}(/|$)")
    body = glob_to_regex(line)[1:-1]
    return (f"^{body}$") if anchored else (f"(^|/){body}$")


def ignore_lines_to_rules(lines: list[str]) -> list[tuple[bool, str]]:
    """Gitignore lines → ordered (negated, regex) rules.

    Gitwildmatch semantics subset (reference uses pathspec's gitwildmatch,
    ``core/file_discovery.py:336-358``): blank/comment lines skipped;
    ``!`` prefix negates (re-includes); trailing-slash → directory prefix;
    leading-slash anchors; otherwise the pattern matches any path segment.
    Evaluation is LAST-MATCH-WINS (git's rule).  Divergence, documented:
    git refuses to re-include a file whose parent directory was excluded
    by a directory pattern; this subset re-includes it.
    """
    out: list[tuple[bool, str]] = []
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        negated = line.startswith("!")
        if negated:
            line = line[1:].strip()
            if not line:
                continue
        out.append((negated, _ignore_line_to_regex(line)))
    return out


def ignore_lines_to_regexes(lines: list[str]) -> list[str]:
    """Back-compat shim: non-negated rules only (callers that can't apply
    ordered semantics)."""
    return [rx for neg, rx in ignore_lines_to_rules(lines) if not neg]


def ignore_excluded_column(
    rules: list[tuple[bool, str]], path_col: str = "path"
) -> F.Column:
    """Column that is true iff the path is excluded under last-match-wins:
    later rules override earlier ones, ``!`` rules re-include."""
    excluded = F.lit(False)
    for negated, rx in rules:
        excluded = F.when(
            F.col(path_col).rlike(rx), F.lit(not negated)
        ).otherwise(excluded)
    return excluded


def discover(
    corpus: DataFrame,
    pattern: str,
    *,
    path_col: str = "path",
    ignore_lines: list[str] | None = None,
) -> DataFrame:
    """Filter the corpus to paths matching the (brace-expanded) glob,
    excluding `.git` and ignore-file patterns.  All predicates are JVM
    ``rlike`` filters — pushdown-friendly, no driver listing."""
    patterns = list(
        itertools.chain.from_iterable(
            expand_braces(expand_user_vars(p)) for p in [pattern]
        )
    )
    include = F.lit(False)
    for p in patterns:
        include = include | F.col(path_col).rlike(glob_to_regex(p))
    pred = include
    for hx in HARD_EXCLUDES:
        pred = pred & ~F.col(path_col).rlike(hx)
    rules = ignore_lines_to_rules(ignore_lines or [])
    if rules:
        pred = pred & ~ignore_excluded_column(rules, path_col)
    return corpus.where(pred)


def matches_locally(pattern: str, path: str) -> bool:
    """Driver-side twin for tests."""
    for p in expand_braces(expand_user_vars(pattern)):
        if re.match(glob_to_regex(p), path):
            return True
    return False


