"""Sitemap parsing (sitemaps.org protocol 0.9) — the crawl-discovery
sibling of the RSS/Atom UDTF (functions/feedparse.py).

The reference crawler discovers URLs only through its seed feeds
(Bootstrap.scala:40-48); real crawls also ingest /sitemap.xml documents —
either a ``<urlset>`` of page URLs or a ``<sitemapindex>`` pointing at
further sitemap files (the two document kinds defined by
https://www.sitemaps.org/protocol.html). This module is the pure-Python
kernel, shared by the Arrow-vectorized wrapper in
operators/sitemap.py so every caller parses identically.

``<lastmod>`` is W3C Datetime (a date or an RFC 3339 timestamp) and maps
onto the same recency predicate (P1) the feed items use: a sitemap entry
whose lastmod is not newer than the stored pub_ts is skipped.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime
from typing import Optional

from newsfeeds_crawler_spark.functions.feedparse import parse_rfc3339

SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_w3c_datetime(s: str) -> Optional[datetime]:
    """W3C Datetime: full RFC 3339 timestamps or a bare YYYY-MM-DD date
    (midnight). ``datetime.fromisoformat`` accepts both; tz-aware values
    normalize to naive UTC like every other timestamp in the engine."""
    return parse_rfc3339(s)


def parse_sitemap_py(
    body: Optional[str],
) -> Optional[tuple[str, list[tuple[str, Optional[datetime]]]]]:
    """Parse one sitemap document.

    Returns (kind, [(loc, lastmod_ts), ...]) with kind ∈ {"urlset",
    "sitemapindex"}, or None on XML error / unknown root (the same
    kill-the-document semantics as a feed parse failure,
    FeedManager.scala:80-84 → the errors quarantine sink S8). Entries
    without a non-empty ``<loc>`` are dropped; a missing ``<lastmod>``
    yields a null timestamp (= "unknown, always refetchable", the P1
    null-extension).
    """
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None
    if root.tag == f"{SITEMAP_NS}urlset":
        kind, child = "urlset", f"{SITEMAP_NS}url"
    elif root.tag == f"{SITEMAP_NS}sitemapindex":
        kind, child = "sitemapindex", f"{SITEMAP_NS}sitemap"
    else:
        return None
    entries: list[tuple[str, Optional[datetime]]] = []
    for el in root.findall(child):
        loc = el.find(f"{SITEMAP_NS}loc")
        if loc is None or not (loc.text or "").strip():
            continue
        ts = None
        lm = el.find(f"{SITEMAP_NS}lastmod")
        if lm is not None and lm.text:
            ts = parse_w3c_datetime(lm.text)
        entries.append((loc.text.strip(), ts))
    return kind, entries
