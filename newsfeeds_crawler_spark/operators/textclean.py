"""C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning…", §2.2 — the C4 heuristics): keep only
lines that end in terminal punctuation AND contain at least
``min_words`` words; drop documents that retain fewer than ``min_lines``
lines. The classic first-pass web-text filter (boilerplate menus, cookie
banners and navigation fragments rarely end in a period or reach five
words).

Pure Catalyst array expressions — split → filter(lambda) → transform →
array_join — inside whole-stage codegen, mirrored 1:1 by DuckDB list
functions, so the gate hash-checks the CLEANED TEXT itself, not just
counts. 100 TB shape: map-only, zero shuffles; cost ∝ corpus characters
on the scan, the floor for any text filter.

The kept lines are emitted TRIMMED (C4 operates on line content; leading
and trailing whitespace is presentation), joined back with single
newlines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: terminal punctuation rule (C4 keeps lines ending in . ! ? or ")
TERMINAL_RE = r'[.!?"]$'
MIN_WORDS = 5
MIN_LINES = 3
_WS = r"\s+"


def _line_ok(line: Column, min_words: int) -> Column:
    t = F.trim(line)
    return t.rlike(TERMINAL_RE) & (
        F.size(F.split(t, _WS)) >= int(min_words)
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    min_lines: int = MIN_LINES,
) -> DataFrame:
    """Per-document cleaning verdict:
    (id, n_lines, n_kept_lines, keep, cleaned_text).

    ``cleaned_text`` joins the surviving trimmed lines with ``\\n`` (empty
    string when nothing survives); ``keep`` is the document-level C4
    verdict (≥ ``min_lines`` surviving lines)."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.transform(
        F.filter(lines, lambda l: _line_ok(l, min_words)),
        lambda l: F.trim(l),
    )
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        (F.size(kept) >= int(min_lines)).alias("keep"),
        F.array_join(kept, "\n").alias("cleaned_text"),
    )
