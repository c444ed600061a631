"""Deterministic synthetic crawl corpus (seed=42; no external data).

Produces the "web" the engine crawls: an Iceberg-layout corpus table of
(image, caption) pairs per BASELINE.json ``input_hint`` —
``(image_id, bytes, w, h, fmt, caption, phash)`` — wrapped in crawlable page
rows (feed pages carry RSS 2.0 XML bodies; article pages carry an HTML-ish
wrapper with an embedded caption marker and an encoded image).

Edge cases deliberately planted (mirroring the reference's test corpus,
/root/reference/src/test — see SURVEY.md §5 and FIXTURES.md §3):

- a dead feed (HTTP 404 -> null body -> feed dead, FeedManager.scala:72-78),
- an unparseable feed (parse error -> feed dead, :80-84),
- an empty feed (0 items -> finish, NO watermark, :87-89),
- items with null pubDate (coalesce path, RomeFeedParser.scala:30-34),
- dead article URLs (null body -> item skipped, :122-126),
- pages whose caption marker is missing (null extract -> skipped, :142-145),
- cross-feed duplicate URLs (seen-set dedup),
- pre-seen items: stored older (-> refetch+update), stored equal/newer
  (-> skip), stored with null pub_ts (-> refetch)  [P1/P2],
- robots-disallowed paths (new-engine robots gate; no reference analog),
- raw URLs with uppercase hosts / default ports (canonicalization work).

Everything is a pure function of (spec, seed): per-URL RNG streams are keyed
by crc32(url) so generation order is irrelevant.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from email.utils import format_datetime
from typing import Optional

import numpy as np

from newsfeeds_crawler_spark.functions import codecs
from newsfeeds_crawler_spark.functions.urls import canonicalize_url_py, url_host_py

BASE_TS = datetime(2026, 1, 1, 0, 0, 0)


@dataclass
class CorpusSpec:
    n_hosts: int = 6
    n_feeds: int = 8
    items_per_feed: int = 12
    seed: int = 42
    crawl_delay_ms: int = 1000          # per-host politeness budget
    tick_ms: int = 1000                 # virtual epoch duration
    workers: int = 3                    # global in-flight cap (reference default)
    preseen_frac: float = 0.25          # items already in the seen store
    dup_frac: float = 0.15              # items shared across feeds
    dead_item_frac: float = 0.08        # article URLs with no 200 page
    no_caption_frac: float = 0.05       # pages whose extraction yields null
    null_pubdate_frac: float = 0.10     # items without a pubDate
    robots_frac: float = 0.08           # items under a disallowed path
    host_skew: float = 0.0              # >0 => zipf-ish host assignment
    img_size_range: tuple[int, int] = (8, 24)
    # "dct" is the lossy member (codecs.LOSSY): its stored phash is computed
    # from the DECODED pixels (FIXTURES.md: "perceptual hash of decoded
    # pixels"), so dec_phash == phash stays exact for every format
    fmts: tuple[str, ...] = ("ppm", "bmp", "png", "dct")
    with_dead_feed: bool = True
    with_unparseable_feed: bool = True
    with_empty_feed: bool = True
    # fraction of feeds emitted as Atom 1.0 instead of RSS 2.0 (the
    # reference's ROME parser accepts both, RomeFeedParser.scala:20-28);
    # chosen per-feed by a crc32 of the canonical URL so existing corpora
    # (atom_frac=0) are byte-identical
    atom_frac: float = 0.0
    # fraction of feeds emitted as RSS 1.0 (RDF-rooted, items outside
    # <channel>, W3CDTF <dc:date> timestamps — the legacy-news-site shape
    # ROME also parses). Chosen by the same crc32 draw as atom_frac, on
    # the band just above it, so existing corpora are byte-identical and
    # atom+rdf fractions compose without collisions.
    rdf_frac: float = 0.0
    # fraction of article pages whose image is a lightly perturbed copy of
    # the most recent image page — planted NEAR-DUPLICATE images for the
    # cross-feed image-dedup report. Gated by crc32 of the canonical URL
    # (not the shared rng) so existing corpora (frac=0) are byte-identical.
    image_neardup_frac: float = 0.0
    # caption↔image consistency watermark: when True, every caption gains
    # 4 trailing tag tokens ("img<band>") carrying the page image's 16-bit
    # phash bands — the deterministic stand-in for an upstream tagger a
    # consistency model would agree with. caption_mismatch_frac of tagged
    # pages (crc32-gated, byte-identical corpora at 0) get tags from the
    # COMPLEMENT phash instead — planted mislabeled captions the
    # consistency score must flag. Default off: existing corpora unchanged.
    caption_tags: bool = False
    caption_mismatch_frac: float = 0.0


@dataclass
class Page:
    url: str                      # raw URL (may be non-canonical)
    url_canon: str
    host: str
    kind: str                     # feed | article
    status: int
    body: Optional[str]
    feed_pub_ts: Optional[datetime] = None       # feed pages
    items: list[tuple[str, Optional[datetime]]] = field(default_factory=list)
    pub_ts: Optional[datetime] = None            # article pages (true item date)
    caption: Optional[str] = None
    image: Optional[bytes] = None
    w: int = 0
    h: int = 0
    fmt: Optional[str] = None
    phash: int = 0


@dataclass
class SynthCorpus:
    spec: CorpusSpec
    pages: dict[str, Page]               # key: url_canon
    seeds: list[str]                      # raw feed URLs, crawl roots
    hosts: dict[str, dict]                # host -> {crawl_delay_ms, disallow}
    preseen: dict[str, dict]              # url_canon -> {article_id, pub_ts, caption}
    # planted near-dup image pairs (src_canon, dup_canon); empty unless
    # spec.image_neardup_frac > 0
    neardup_pairs: list = field(default_factory=list)
    # pages whose caption tags were planted from the WRONG image (empty
    # unless spec.caption_tags and caption_mismatch_frac > 0)
    caption_mismatches: list = field(default_factory=list)

    def page(self, url_canon: str) -> Optional[Page]:
        return self.pages.get(url_canon)


def _rng_for(url: str, seed: int) -> np.random.Generator:
    return np.random.default_rng((zlib.crc32(url.encode()) + seed) & 0xFFFFFFFF)


def _mk_image(url_c: str, spec: CorpusSpec):
    rng = _rng_for(url_c, spec.seed)
    lo, hi = spec.img_size_range
    h = int(rng.integers(lo, hi + 1))
    w = int(rng.integers(lo, hi + 1))
    # gradient + noise: stable, compressible, phash-distinguishable
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 255 // max(h - 1, 1) + xx * 131 // max(w - 1, 1)) % 256
    img = np.stack(
        [base, (base * 2) % 256, rng.integers(0, 256, size=(h, w))], axis=-1
    ).astype(np.uint8)
    fmt = spec.fmts[int(rng.integers(0, len(spec.fmts)))]
    return img, fmt, h, w


CAPTION_OPEN = "<!--caption-->"
CAPTION_CLOSE = "<!--/caption-->"


def make_article_body(url_c: str, caption: Optional[str]) -> str:
    """HTML-ish page wrapper with boilerplate around the caption marker."""
    boiler = f"<nav>home | about | {url_c}</nav><aside>ads ads ads</aside>"
    cap = f"{CAPTION_OPEN}{caption}{CAPTION_CLOSE}" if caption is not None else ""
    return f"<html><body>{boiler}<main>{cap}</main><footer>(c) synth</footer></body></html>"


def extract_caption_py(body: Optional[str]) -> Optional[str]:
    """Oracle-side caption extraction (engine mirror is vectorized)."""
    if body is None:
        return None
    i = body.find(CAPTION_OPEN)
    if i < 0:
        return None
    j = body.find(CAPTION_CLOSE, i)
    if j < 0:
        return None
    return body[i + len(CAPTION_OPEN) : j]


def make_rss(feed_pub_ts: Optional[datetime],
             items: list[tuple[str, Optional[datetime]]]) -> str:
    """RSS 2.0 document shaped like the reference's sample-feed.xml."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0"><channel><title>synth feed</title>']
    if feed_pub_ts is not None:
        parts.append(f"<pubDate>{format_datetime(feed_pub_ts)}</pubDate>")
    for link, ts in items:
        item = f"<item><link>{link}</link>"
        if ts is not None:
            item += f"<pubDate>{format_datetime(ts)}</pubDate>"
        parts.append(item + "</item>")
    parts.append("</channel></rss>")
    return "".join(parts)


def make_atom(feed_pub_ts: Optional[datetime],
              items: list[tuple[str, Optional[datetime]]]) -> str:
    """Atom 1.0 document: entry link = <link href>, date = <published>."""

    def rfc3339(ts: datetime) -> str:
        return ts.isoformat() + "Z"

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom">',
             "<title>synth feed</title>"]
    if feed_pub_ts is not None:
        parts.append(f"<updated>{rfc3339(feed_pub_ts)}</updated>")
    for link, ts in items:
        entry = f'<entry><link rel="alternate" href="{link}"/>'
        if ts is not None:
            entry += f"<published>{rfc3339(ts)}</published>"
        parts.append(entry + "</entry>")
    parts.append("</feed>")
    return "".join(parts)


def make_rdf(feed_pub_ts: Optional[datetime],
             items: list[tuple[str, Optional[datetime]]]) -> str:
    """RSS 1.0 document: RDF root, items OUTSIDE the channel, dc:date
    (W3CDTF) timestamps — the structure functions/feedparse._parse_rdf
    mirrors (and ROME parses, RomeFeedParser.scala:20-28)."""

    def w3cdtf(ts: datetime) -> str:
        return ts.isoformat() + "Z"

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns="http://purl.org/rss/1.0/"'
        ' xmlns:dc="http://purl.org/dc/elements/1.1/">',
        '<channel rdf:about="urn:synth"><title>synth feed</title>',
    ]
    if feed_pub_ts is not None:
        parts.append(f"<dc:date>{w3cdtf(feed_pub_ts)}</dc:date>")
    parts.append("</channel>")
    for link, ts in items:
        item = f'<item rdf:about="{link}"><link>{link}</link>'
        if ts is not None:
            item += f"<dc:date>{w3cdtf(ts)}</dc:date>"
        parts.append(item + "</item>")
    parts.append("</rdf:RDF>")
    return "".join(parts)


def synthesize(spec: CorpusSpec | None = None) -> SynthCorpus:
    spec = spec or CorpusSpec()
    rng = np.random.default_rng(spec.seed)
    hosts = {}
    for i in range(spec.n_hosts):
        host = f"host{i}.example.com"
        hosts[host] = {
            "crawl_delay_ms": spec.crawl_delay_ms,
            "disallow": ["/private/"],
        }
    host_names = list(hosts)

    def pick_host(k: int) -> str:
        if spec.host_skew > 0:
            # zipf-ish: host 0 soaks up most URLs (skew/salting tests)
            if rng.random() < spec.host_skew:
                return host_names[0]
        return host_names[k % len(host_names)]

    pages: dict[str, Page] = {}
    preseen: dict[str, dict] = {}
    seeds: list[str] = []
    all_article_urls: list[str] = []
    neardup_pairs: list[tuple[str, str]] = []
    caption_mismatches: list[str] = []
    last_img: tuple[str, np.ndarray] | None = None  # (url_canon, source img)

    article_id = 500  # reference BootstrapTest starts its id counter at 500
    for f in range(spec.n_feeds):
        fhost = pick_host(f)
        # raw seed URLs exercise canonicalization: uppercase + default port
        raw_feed_url = f"http://{fhost.upper()}:80/feed{f}.xml"
        feed_canon = canonicalize_url_py(raw_feed_url)
        seeds.append(raw_feed_url)

        if spec.with_dead_feed and f == spec.n_feeds - 1:
            pages[feed_canon] = Page(raw_feed_url, feed_canon, fhost, "feed", 404, None)
            continue
        if spec.with_unparseable_feed and f == spec.n_feeds - 2 and spec.n_feeds >= 2:
            pages[feed_canon] = Page(
                raw_feed_url, feed_canon, fhost, "feed", 200, "this is not XML <<<"
            )
            continue
        if spec.with_empty_feed and f == spec.n_feeds - 3 and spec.n_feeds >= 3:
            body = make_rss(BASE_TS + timedelta(days=f), [])
            pages[feed_canon] = Page(
                raw_feed_url, feed_canon, fhost, "feed", 200, body,
                feed_pub_ts=BASE_TS + timedelta(days=f),
            )
            continue

        items: list[tuple[str, Optional[datetime]]] = []
        for i in range(spec.items_per_feed):
            r = rng.random()
            if r < spec.dup_frac and all_article_urls:
                raw_item = all_article_urls[int(rng.integers(0, len(all_article_urls)))]
            else:
                ahost = pick_host(int(rng.integers(0, 10_000)))
                path = "private/" if rng.random() < spec.robots_frac else "a/"
                raw_item = f"http://{ahost}/{path}{f}/{i}"
            item_canon = canonicalize_url_py(raw_item)
            pub: Optional[datetime] = (
                None
                if rng.random() < spec.null_pubdate_frac
                else BASE_TS + timedelta(hours=int(rng.integers(0, 24 * 30)))
            )
            items.append((raw_item, pub))

            if item_canon not in pages:
                # feed 0 deterministically plants one dead item and one
                # caption-less page so every edge case exists at any spec size
                dead = (f == 0 and i == 0) or rng.random() < spec.dead_item_frac
                no_cap = (f == 0 and i == 1) or rng.random() < spec.no_caption_frac
                ahost2 = url_host_py(raw_item)
                if dead:
                    pages[item_canon] = Page(
                        raw_item, item_canon, ahost2, "article", 404, None, pub_ts=pub
                    )
                else:
                    caption = None if no_cap else f"caption::{item_canon}::synthetic"
                    img, fmt, h, w = _mk_image(item_canon, spec)
                    # planted image near-dup: this page's image becomes a
                    # lightly perturbed copy of the latest image page's.
                    # crc32-gated (not the shared rng) so frac=0 corpora
                    # are byte-identical to pre-knob ones.
                    if (
                        spec.image_neardup_frac > 0
                        and last_img is not None
                        and (zlib.crc32(b"neardup:" + item_canon.encode()) % 1000)
                        < spec.image_neardup_frac * 1000
                    ):
                        src_canon, src_img = last_img
                        img = np.clip(
                            src_img.astype(np.int16) + 2, 0, 255
                        ).astype(np.uint8)
                        h, w = img.shape[:2]
                        neardup_pairs.append((src_canon, item_canon))
                    else:
                        last_img = (item_canon, img)
                    enc = codecs.encode_image(img, fmt)
                    # phash declares the decoded pixels (FIXTURES.md), so for
                    # a lossy fmt it is computed post-roundtrip — identical to
                    # what any consumer of `image` can recompute
                    ph_src = codecs.decode_image(enc, fmt) if fmt in codecs.LOSSY else img
                    ph_val = codecs.phash64(ph_src)
                    if spec.caption_tags and caption is not None:
                        tag_ph = ph_val & 0xFFFFFFFFFFFFFFFF
                        if (
                            zlib.crc32(b"capmismatch:" + item_canon.encode())
                            % 1000
                        ) < spec.caption_mismatch_frac * 1000:
                            # mislabeled caption: tags from the complement
                            # phash — every band disagrees (score 0.0)
                            tag_ph = ~ph_val & 0xFFFFFFFFFFFFFFFF
                            caption_mismatches.append(item_canon)
                        caption += " " + " ".join(
                            f"img{(tag_ph >> (16 * k)) & 0xFFFF}"
                            for k in range(4)
                        )
                    pages[item_canon] = Page(
                        raw_item, item_canon, ahost2, "article", 200,
                        make_article_body(item_canon, caption),
                        pub_ts=pub, caption=caption,
                        image=enc,
                        w=w, h=h, fmt=fmt, phash=ph_val,
                    )
                all_article_urls.append(raw_item)

            # pre-seen store rows: stored older => refetch/update; stored
            # equal/newer => skip; stored null ts => refetch  (P1/P2)
            if item_canon not in preseen and rng.random() < spec.preseen_frac:
                mode = rng.random()
                if pub is None or mode < 0.4:
                    stored_ts = None if pub is None else pub - timedelta(days=365)
                elif mode < 0.7:
                    stored_ts = pub  # equal after second-truncation -> skip
                else:
                    stored_ts = pub + timedelta(hours=1)  # newer -> skip
                preseen[item_canon] = {
                    "article_id": article_id,
                    "pub_ts": stored_ts,
                    "caption": f"stale::{item_canon}",
                }
                article_id += 1

        feed_pub = None if f % 4 == 3 else BASE_TS + timedelta(days=f, hours=6)
        draw = zlib.crc32(feed_canon.encode()) % 1000
        is_atom = spec.atom_frac > 0 and draw < spec.atom_frac * 1000
        is_rdf = (
            not is_atom
            and spec.rdf_frac > 0
            and draw < (spec.atom_frac + spec.rdf_frac) * 1000
        )
        mk = make_atom if is_atom else (make_rdf if is_rdf else make_rss)
        body = mk(feed_pub, items)
        pages[feed_canon] = Page(
            raw_feed_url, feed_canon, fhost, "feed", 200,
            body, feed_pub_ts=feed_pub, items=items,
        )

    return SynthCorpus(
        spec=spec, pages=pages, seeds=seeds, hosts=hosts, preseen=preseen,
        neardup_pairs=neardup_pairs,
        caption_mismatches=caption_mismatches,
    )
