"""Machine-assert the rows-only image gates' in-plan self-checks.

The four image gates (decode/resize roundtrips, phash near-dup banded==brute,
frame sampling) have no SQL oracle — each computes an in-plan boolean ``ok``
column instead. The driver's rows-only check counts rows but never reads
``ok``, so without this test a regression in the GATE QUERIES themselves
(the kernels are pinned separately by test_codecs + the e2e pixel checks)
would pass silently. Mirrors tests/test_bpe.py's gate self-verify.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

ROWS_ONLY_IMAGE_GATES = [
    "image_decode_roundtrip",
    "image_resize_roundtrip",
    "image_phash_neardup",
    "frame_sample",
]


@pytest.mark.parametrize("gate", ROWS_ONLY_IMAGE_GATES)
def test_rows_only_image_gate_self_verifies(spark, sf_dir, gate):
    import __spark_entry__ as E

    out = E.queries()[gate](spark, sf_dir)
    assert "ok" in out.columns, f"{gate} lost its self-check column"
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("bad"),
    ).collect()[0]
    assert agg["n"] > 0, f"{gate} returned no rows"
    assert agg["bad"] == 0, f"{gate}: {agg['bad']}/{agg['n']} rows failed ok"
