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


def parse_rfc3339(s: str) -> Optional[datetime]:
    """Atom timestamps (RFC 3339 / ISO-8601, e.g. 2026-01-02T03:04:05Z)."""
    try:
        return _to_naive_utc(datetime.fromisoformat(s.strip()))
    except (TypeError, ValueError):
        return None


ATOM_NS = "{http://www.w3.org/2005/Atom}"
RDF_NS = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
RSS1_NS = "{http://purl.org/rss/1.0/}"
DC_NS = "{http://purl.org/dc/elements/1.1/}"


def _parse_rdf(root) -> tuple[Optional[datetime], list]:
    """RSS 1.0 (RDF-rooted — still common on legacy news sites; the
    reference's ROME SyndFeedInput parses RSS 0.9x/1.0 transparently,
    RomeFeedParser.scala:20-28). Structure differs from RSS 2.0: the root
    is <rdf:RDF>, <item> elements live OUTSIDE <channel>, and timestamps
    are W3CDTF <dc:date> (RFC 3339), not RFC 822 <pubDate>."""
    feed_pub = None
    channel = root.find(f"{RSS1_NS}channel")
    if channel is not None:
        fd = channel.find(f"{DC_NS}date")
        if fd is not None and fd.text:
            feed_pub = parse_rfc3339(fd.text)
    items: list[tuple[str, Optional[datetime]]] = []
    for item in root.findall(f"{RSS1_NS}item"):
        link = item.find(f"{RSS1_NS}link")
        if link is None or not (link.text or "").strip():
            continue
        ts = None
        el = item.find(f"{DC_NS}date")
        if el is not None and el.text:
            ts = parse_rfc3339(el.text)
        items.append((link.text.strip(), ts))
    return feed_pub, items


def _parse_atom(root) -> tuple[Optional[datetime], list]:
    """Atom 1.0: feed ts = <updated> (what ROME surfaces as the published
    date for Atom feeds); entry link = <link href> preferring
    rel="alternate"; entry ts = <published> else <updated> — the P4
    coalesce mapped 1:1 (RomeFeedParser.scala:30-34)."""
    feed_pub = None
    fu = root.find(f"{ATOM_NS}updated")
    if fu is not None and fu.text:
        feed_pub = parse_rfc3339(fu.text)
    items: list[tuple[str, Optional[datetime]]] = []
    for entry in root.findall(f"{ATOM_NS}entry"):
        href = None
        for link in entry.findall(f"{ATOM_NS}link"):
            rel = link.get("rel", "alternate")
            if rel == "alternate" and (link.get("href") or "").strip():
                href = link.get("href").strip()
                break
        if href is None:
            continue
        ts = None
        for tag in ("published", "updated"):
            el = entry.find(f"{ATOM_NS}{tag}")
            if el is not None and el.text:
                ts = parse_rfc3339(el.text)
                break
        items.append((href, ts))
    return feed_pub, items


def parse_feed_py(
    body: Optional[str],
) -> Optional[tuple[Optional[datetime], list[tuple[str, Optional[datetime]]]]]:
    """Parse an RSS 2.0, RSS 1.0 (RDF), or Atom 1.0 document (the
    reference's ROME SyndFeedInput accepts all of these transparently,
    RomeFeedParser.scala:20-28).

    Returns (feed_pub_ts, [(link, item_pub_ts), ...]) or None on a parse
    failure (the reference kills the feed on parser error,
    FeedManager.scala:80-84). Items without <link> are dropped; item date =
    <pubDate> else <dc:date>-style fallbacks for RSS, <published> else
    <updated> for Atom (the published-else-updated coalesce, P4).
    """
    if body is None:
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None
    if root.tag == f"{ATOM_NS}feed":
        return _parse_atom(root)
    if root.tag == f"{RDF_NS}RDF":
        return _parse_rdf(root)
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
