"""RSS/Atom feed parsing — the U1 "UDTF" surface (1 feed row -> N item rows).

Reference: parser/impl/RomeFeedParser.scala:20-34 (ROME SyndFeedInput; item
date = published else updated — the coalesce is P4). Here: stdlib
``xml.etree`` on the synthetic RSS 2.0 corpus. One kernel function shared by
the oracle simulator and the engine's Arrow-vectorized wrapper
(operators/fetchparse.py), so both sides parse identically.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import Optional


def _to_naive_utc(dt: datetime) -> datetime:
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_rfc822(s: str) -> Optional[datetime]:
    try:
        return _to_naive_utc(parsedate_to_datetime(s.strip()))
    except (TypeError, ValueError):
        return None


def parse_feed_py(
    body: Optional[str],
) -> Optional[tuple[Optional[datetime], list[tuple[str, Optional[datetime]]]]]:
    """Parse an RSS 2.0 document.

    Returns (feed_pub_ts, [(link, item_pub_ts), ...]) or None on a parse
    failure (the reference kills the feed on parser error,
    FeedManager.scala:80-84). Items without <link> are dropped; item date =
    <pubDate> else <dc:date>-style fallbacks (the published-else-updated
    coalesce, P4).
    """
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None
    channel = root.find("channel")
    if root.tag != "rss" or channel is None:
        return None
    feed_pub = None
    fp = channel.find("pubDate")
    if fp is not None and fp.text:
        feed_pub = parse_rfc822(fp.text)
    items: list[tuple[str, Optional[datetime]]] = []
    for item in channel.findall("item"):
        link = item.find("link")
        if link is None or not (link.text or "").strip():
            continue
        ts = None
        for tag in ("pubDate", "date", "updated"):
            el = item.find(tag)
            if el is not None and el.text:
                ts = parse_rfc822(el.text)
                break
        items.append((link.text.strip(), ts))
    return feed_pub, items
