"""Fragment (snippet) extraction (SURVEY.md §2.8 P2).

Reference semantics (reference ``core/fragments.py:14-108``): lines
containing any query term as a case-insensitive substring, ± context_lines
of context, overlapping/adjacent ranges merged, at most ``max_fragments``
fragments, 1-indexed line numbers.

Runs driver-side on the ≤k collected result rows (the reference's shape);
the pure function is deliberately dependency-free so it is trivially
wrappable in a pandas UDF if snippets are ever needed for a full corpus
sweep rather than a top-k result page.
"""

from __future__ import annotations


def extract_fragments(
    content: str,
    query_terms: list[str],
    context_lines: int = 3,
    max_fragments: int = 3,
) -> list[dict]:
    if not content or not query_terms:
        return []
    lines = content.splitlines()
    if not lines:
        return []

    terms = [t.lower() for t in query_terms]
    matched = sorted(
        i
        for i, line in enumerate(lines)
        if any(t in line.lower() for t in terms)
    )
    if not matched:
        return []

    fragments: list[dict] = []
    current: dict | None = None
    for m in matched:
        start = max(0, m - context_lines)
        end = min(len(lines) - 1, m + context_lines)
        if current is None:
            current = {
                "line_start": start + 1,
                "line_end": end + 1,
                "lines": lines[start : end + 1],
                "matched_line_numbers": [m + 1],
            }
        else:
            cur_end = current["line_end"] - 1
            if start <= cur_end + 1:  # overlapping or adjacent → merge
                new_end = max(cur_end, end)
                current["line_end"] = new_end + 1
                current["lines"] = lines[current["line_start"] - 1 : new_end + 1]
                current["matched_line_numbers"].append(m + 1)
            else:
                fragments.append(current)
                if len(fragments) >= max_fragments:
                    current = None
                    break
                current = {
                    "line_start": start + 1,
                    "line_end": end + 1,
                    "lines": lines[start : end + 1],
                    "matched_line_numbers": [m + 1],
                }
    if current is not None and len(fragments) < max_fragments:
        fragments.append(current)
    return fragments
