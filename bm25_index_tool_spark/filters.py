"""Post-search path filtering (SURVEY.md §2.8 P1).

Reference semantics (reference ``core/filters.py:16-101``): include globs
are OR'd, exclude globs are NOT-ANY'd, ``fnmatch`` against the whole path,
and the filter is applied AFTER search and AFTER top-k — so filtering can
shrink results below k (replicated for rank identity; reference applies it
at ``api.py:317-322``).

Two implementations with identical semantics:
* ``matches`` / ``filter_rows`` — driver-side, for the ≤k collected rows of
  a single query (the reference's shape).
* ``filter_column`` — a Column predicate (glob → regex, JVM-side ``rlike``)
  for filtering result DataFrames at scale without collecting.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


def glob_to_rlike(pattern: str) -> str:
    """fnmatch glob → anchored Java-compatible regex (same match semantics:
    ``*`` crosses path separators, exactly like fnmatch)."""
    return fnmatch.translate(pattern)


@dataclass
class PathFilter:
    include_patterns: list[str] = field(default_factory=list)
    exclude_patterns: list[str] = field(default_factory=list)

    def matches(self, path: str) -> bool:
        if self.include_patterns and not any(
            fnmatch.fnmatch(path, p) for p in self.include_patterns
        ):
            return False
        if self.exclude_patterns and any(
            fnmatch.fnmatch(path, p) for p in self.exclude_patterns
        ):
            return False
        return True

    def filter_rows(self, results: list[dict]) -> list[dict]:
        if not self.include_patterns and not self.exclude_patterns:
            return results
        return [r for r in results if self.matches(r["path"])]

    def column_predicate(self, col: str = "path") -> F.Column:
        pred = F.lit(True)
        if self.include_patterns:
            inc = F.lit(False)
            for p in self.include_patterns:
                inc = inc | F.col(col).rlike(glob_to_rlike(p))
            pred = pred & inc
        for p in self.exclude_patterns:
            pred = pred & ~F.col(col).rlike(glob_to_rlike(p))
        return pred

    def filter_df(self, df: DataFrame, col: str = "path") -> DataFrame:
        if not self.include_patterns and not self.exclude_patterns:
            return df
        return df.where(self.column_predicate(col))

    def is_empty(self) -> bool:
        return not self.include_patterns and not self.exclude_patterns
