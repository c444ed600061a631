"""Domain-blocklist URL filtering with registrable-suffix matching — the
standard curation/crawl guard (RefinedWeb §3.1 and C4 both filter
against URL blocklists like UT1; crawlers consult the same lists at
frontier time). A rule ``bad.com`` must block ``a.bad.com`` and
``bad.com`` but NOT ``notbad.com`` — i.e. matching is on DOT-BOUNDED
host suffixes, not substrings.

Spark shape: explode each host into its dot-suffix chain (a host has ≤
~8 labels, so the explode is a bounded ×labels blowup of the host
column only), equi-join the blocklist on the suffix — a broadcast join
for any real blocklist (UT1's adult list ≈ 4M rows ≈ tens of MB; above
broadcast size the same plan degrades to a shuffled-hash join on the
suffix, the hosts-dimension degrade path) — then one per-URL aggregate
keeping the LONGEST (most specific) matching rule. No regex, no
per-row Python, no cartesian.

100 TB shape: cost ∝ |urls|·labels map-side plus the broadcast probe;
the aggregate is map-side combinable. Matching semantics (dot-bounded,
most-specific-wins) mirror the Public Suffix List algorithm, so the
same operator slots in for PSL-based registrable-domain extraction
with a different rule table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.urls import url_host


def host_suffixes(host):
    """array<string> of dot-bounded suffixes of a host, most-specific
    first: a.b.c → [a.b.c, b.c, c]."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


def blocklist_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    rule_col: str = "domain",
) -> DataFrame:
    """Per-URL verdict: (*urls columns, host, blocked:bool,
    matched_rule:string|null).

    ``rules`` is one domain per row; a URL is blocked when ANY dot-suffix
    of its host equals a rule, and ``matched_rule`` reports the longest
    (most specific) such rule. URLs with no match pass through with
    blocked=false via the null-extension of the left join."""
    host = url_host(F.col(url_col), canonical=True)
    base = urls.withColumn("host", host)
    ex = base.select(
        url_col,
        "host",
        F.explode(host_suffixes(F.col("host"))).alias("__sfx"),
    )
    r = rules.select(F.col(rule_col).alias("__sfx")).distinct()
    hits = (
        ex.join(F.broadcast(r), "__sfx")
        .groupBy(url_col)
        .agg(
            F.max(
                F.struct(F.length("__sfx").alias("l"), F.col("__sfx").alias("s"))
            ).alias("__m")
        )
        .select(url_col, F.col("__m.s").alias("matched_rule"))
    )
    return base.join(hits, url_col, "left").select(
        *urls.columns,
        "host",
        F.col("matched_rule").isNotNull().alias("blocked"),
        "matched_rule",
    )
