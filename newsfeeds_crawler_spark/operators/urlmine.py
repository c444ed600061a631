"""URL template mining: generalize URL paths into templates (digit runs →
``{n}``) and profile each host's template distribution — the standard
crawler-trap / frontier-compression analysis (Heritrix's "path-ology"
checks and IRLbot's spam/trap budgeting flag hosts where ONE template
explodes into unbounded distinct URLs: calendars, session ids, faceted
search). The top templates per host also summarize what a crawl actually
collected, at 1/10^4 the cardinality of raw URLs.

All Catalyst expressions: host/path extraction and the digit-run
generalization are single regexp projections (RE2 ∩ java.util.regex ∩
DuckDB common subset — no lookaround), counting is one hash aggregate
keyed (host, template) with map-side combine, and the per-host top-k is
the partial+final WindowGroupLimit rank window (a hot host ships ≤ k rows
per partition). The trap flag is a per-template threshold on distinct
URLs — arithmetic, no second pass.

100 TB shape: work ∝ |urls| map-side, then an aggregate ∝ distinct
(host, template) — the whole point is that templates collapse the key
space; the rank window is bounded by templates per host, never URLs.
Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRAP_MIN_DISTINCT = 1000  # one template fanning into >= this many URLs


def url_templates(
    urls: DataFrame,
    url_col: str = "url",
    k: int = 3,
    trap_min_distinct: int = TRAP_MIN_DISTINCT,
) -> DataFrame:
    """Per-host top-k URL templates: (host, template, n_urls,
    n_distinct_urls, rank, trap).

    ``template`` = the URL path with every digit run replaced by ``{n}``;
    ``n_urls`` counts occurrences (a frontier may repeat a URL),
    ``n_distinct_urls`` counts distinct raw URLs under the template, and
    ``trap`` flags templates whose distinct fan-out reaches
    ``trap_min_distinct``. Rank orders by (n_urls desc, template).
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    template = F.regexp_replace(path, r"[0-9]+", "{n}")
    base = urls.select(
        host.alias("host"), template.alias("template"), u.alias("__u")
    )
    cnt = base.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.countDistinct("__u").cast("bigint").alias("n_distinct_urls"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_urls").desc(), F.col("template")
    )
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "host",
            "template",
            "n_urls",
            "n_distinct_urls",
            F.col("rank").cast("int"),
            (F.col("n_distinct_urls") >= trap_min_distinct).alias("trap"),
        )
    )
