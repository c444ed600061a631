"""Crawl predicates P1–P5 (SURVEY.md §2.2) as Spark Column expressions.

All pure built-in expressions — they stay inside WholeStageCodegen and push
down into scans where possible. Each has a Python mirror used by the oracle
simulator so both sides share one spec.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_newer(parsed_ts: Column, stored_ts: Column) -> Column:
    """P1 — the recency/refetch predicate, second-truncated.

    Reference: FeedManager.scala:186-189 —
      parsed == null -> False (skip), stored == null -> True (refetch),
      else date_trunc(second, parsed) > date_trunc(second, stored).
    """
    return (
        F.when(parsed_ts.isNull(), F.lit(False))
        .when(stored_ts.isNull(), F.lit(True))
        .otherwise(
            F.date_trunc("second", parsed_ts) > F.date_trunc("second", stored_ts)
        )
    )


def should_fetch(parsed_ts: Column, stored_id: Column, stored_ts: Column) -> Column:
    """P1+P2 — fetch decision after the seen join.

    Absent from the store (stored_id null) -> always fetch
    (FeedManager.scala:116); present -> is_newer (FeedManager.scala:107-119).
    """
    return F.when(stored_id.isNull(), F.lit(True)).otherwise(
        is_newer(parsed_ts, stored_ts)
    )


def http_body(status: Column, body: Column) -> Column:
    """P5 — non-200 responses yield null body (DefaultHttpFacade.scala:69-81)."""
    return F.when(status == 200, body).otherwise(F.lit(None).cast("string"))


# ---------------------------------------------------------------- python mirror


def is_newer_py(parsed_ts: datetime | None, stored_ts: datetime | None) -> bool:
    if parsed_ts is None:
        return False
    if stored_ts is None:
        return True
    return parsed_ts.replace(microsecond=0) > stored_ts.replace(microsecond=0)


def should_fetch_py(
    parsed_ts: datetime | None, stored: tuple | None, stored_ts: datetime | None
) -> bool:
    if stored is None:
        return True
    return is_newer_py(parsed_ts, stored_ts)
