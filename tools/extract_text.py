"""One-shot caption extraction from a saved page file — debug analog of the
reference's tools/ExtractText.scala:16-29 (arg: html file; result to stdout).

Runs the REAL engine extraction expression (operators.extract.extract_caption,
the Catalyst column the article branch applies) over a 1-row DataFrame.

    python tools/extract_text.py /tmp/page.html
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 2:
        print("usage: extract_text.py <page-file>", file=sys.stderr)
        sys.exit(2)
    with open(sys.argv[1], encoding="utf-8") as f:
        body = f.read()

    from pyspark.sql import functions as F

    from newsfeeds_crawler_spark.operators.extract import extract_caption
    from newsfeeds_crawler_spark.session import get_spark

    spark = get_spark("nfc-extract-text", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    row = (
        spark.createDataFrame([(body,)], ["body"])
        .select(extract_caption(F.col("body")).alias("caption"))
        .collect()[0]
    )
    if row["caption"] is None:
        print("NULL extraction (no caption found)", file=sys.stderr)
        spark.stop()
        sys.exit(1)
    print(row["caption"])
    spark.stop()


if __name__ == "__main__":
    main()
