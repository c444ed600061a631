from __future__ import annotations

from newsfeeds_crawler_spark.functions.feedparse import parse_feed_py
from newsfeeds_crawler_spark.oracle import simulate
from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
from newsfeeds_crawler_spark.synth.corpus import extract_caption_py, make_rss
from newsfeeds_crawler_spark.synth.tables import corpus_df, hosts_df, preseen_df


def test_synth_is_deterministic():
    a, b = synthesize(CorpusSpec()), synthesize(CorpusSpec())
    assert a.seeds == b.seeds
    assert set(a.pages) == set(b.pages)
    pa, pb = a.pages, b.pages
    for u in pa:
        assert pa[u].body == pb[u].body
        assert pa[u].image == pb[u].image


def test_synth_plants_edge_cases():
    c = synthesize(CorpusSpec())
    kinds = {}
    for p in c.pages.values():
        if p.kind == "feed":
            if p.status != 200:
                kinds["dead_feed"] = True
            elif parse_feed_py(p.body) is None:
                kinds["unparseable"] = True
            elif not parse_feed_py(p.body)[1]:
                kinds["empty"] = True
    assert kinds == {"dead_feed": True, "unparseable": True, "empty": True}
    arts = [p for p in c.pages.values() if p.kind == "article"]
    assert any(p.status != 200 for p in arts)              # dead items
    assert any(p.caption is None and p.status == 200 for p in arts)  # no caption
    assert any("/private/" in p.url_canon for p in arts)   # robots
    assert c.preseen                                        # preseen rows


def test_rss_roundtrip_parse():
    from datetime import datetime

    items = [("http://h/a", datetime(2026, 2, 1, 10, 30, 5)), ("http://h/b", None)]
    body = make_rss(datetime(2026, 1, 15, 8, 0, 0), items)
    feed_ts, parsed = parse_feed_py(body)
    assert feed_ts == datetime(2026, 1, 15, 8, 0, 0)
    assert parsed == items
    assert parse_feed_py("not xml <<<") is None
    assert parse_feed_py(None) is None


def test_caption_extraction():
    from newsfeeds_crawler_spark.synth.corpus import make_article_body

    assert extract_caption_py(make_article_body("u", "hello cap")) == "hello cap"
    assert extract_caption_py(make_article_body("u", None)) is None
    assert extract_caption_py(None) is None


def test_oracle_simulation_invariants():
    c = synthesize(CorpusSpec())
    r = simulate(c)
    # every fetch admitted exactly once, politeness respected
    assert len(r.order_urls) == len(set(zip(r.order_urls, (e for _, e, _ in r.crawl_order))))
    per_host_epoch = set()
    for u, e, _ in r.crawl_order:
        host = u.split("://")[1].split("/")[0]
        assert (host, e) not in per_host_epoch  # one fetch per host per epoch
        per_host_epoch.add((host, e))
    # global workers cap
    from collections import Counter

    by_epoch = Counter(e for _, e, _ in r.crawl_order)
    assert max(by_epoch.values()) <= c.spec.workers
    # robots never fetched
    assert not any("/private/" in u for u in r.order_urls)
    # every feed reached a terminal state
    assert all(f["state"] in ("done", "done_empty", "dead") for f in r.feeds.values())
    # the empty feed carries no watermark
    assert any(f["state"] == "done_empty" and f["last_pub_ts"] is None for f in r.feeds.values())
    # preseen skip/refetch split really happened
    actions = {a["action"] for a in r.articles.values()}
    assert actions == {"insert", "update"}
    # oracle is deterministic
    r2 = simulate(synthesize(CorpusSpec()))
    assert r2.crawl_order == r.crawl_order
    assert r2.seen == r.seen


def test_corpus_tables_build(spark):
    c = synthesize(CorpusSpec(n_feeds=4, items_per_feed=5))
    df = corpus_df(spark, c)
    assert df.count() == len(c.pages)
    assert df.filter("kind='article' and status=200 and caption is not null").count() > 0
    assert hosts_df(spark, c).count() == len(c.hosts)
    assert preseen_df(spark, c).count() == len(c.preseen)


def test_atom_roundtrip_parse():
    """Atom 1.0 parse parity with ROME's transparent RSS/Atom handling
    (RomeFeedParser.scala:20-28): link@href, published-else-updated (P4)."""
    from datetime import datetime

    from newsfeeds_crawler_spark.synth.corpus import make_atom

    items = [("http://h/a", datetime(2026, 2, 1, 10, 30, 5)), ("http://h/b", None)]
    body = make_atom(datetime(2026, 1, 15, 8, 0, 0), items)
    feed_ts, parsed = parse_feed_py(body)
    assert feed_ts == datetime(2026, 1, 15, 8, 0, 0)
    assert parsed == items

    # hand-written Atom: updated-only entry (P4 fallback), rel-less link,
    # enclosure link skipped, entry without any link dropped
    doc = (
        '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        "<updated>2026-01-01T00:00:00Z</updated>"
        '<entry><link href="http://h/u1"/>'
        "<updated>2026-03-01T01:02:03Z</updated></entry>"
        '<entry><link rel="enclosure" href="http://h/skip.mp3"/>'
        '<link rel="alternate" href="http://h/u2"/>'
        "<published>2026-03-02T00:00:00+02:00</published></entry>"
        "<entry><title>no link</title></entry>"
        "</feed>"
    )
    feed_ts, parsed = parse_feed_py(doc)
    assert feed_ts == datetime(2026, 1, 1, 0, 0, 0)
    assert parsed == [
        ("http://h/u1", datetime(2026, 3, 1, 1, 2, 3)),
        ("http://h/u2", datetime(2026, 3, 1, 22, 0, 0)),  # +02:00 → UTC
    ]


def test_atom_frac_zero_is_byte_identical():
    """atom_frac=0 (the default) must leave every existing corpus unchanged."""
    a = synthesize(CorpusSpec(n_feeds=4, items_per_feed=5, n_hosts=3))
    b = synthesize(CorpusSpec(n_feeds=4, items_per_feed=5, n_hosts=3, atom_frac=0.0))
    assert {k: p.body for k, p in a.pages.items()} == {
        k: p.body for k, p in b.pages.items()
    }


def test_mixed_rss_atom_corpus_has_both():
    c = synthesize(CorpusSpec(n_feeds=8, items_per_feed=5, n_hosts=4, atom_frac=0.5))
    bodies = [
        p.body for p in c.pages.values() if p.kind == "feed" and p.body and "<" in p.body
    ]
    assert any("http://www.w3.org/2005/Atom" in b for b in bodies)
    assert any("<rss" in b for b in bodies)


def test_rdf_roundtrip_parse():
    """RSS 1.0 (RDF) parse parity with ROME's transparent handling
    (RomeFeedParser.scala:20-28): items OUTSIDE the channel, W3CDTF
    dc:date timestamps, feed ts from the channel's dc:date."""
    from datetime import datetime

    from newsfeeds_crawler_spark.synth.corpus import make_rdf

    items = [("http://h/a", datetime(2026, 2, 1, 10, 30, 5)), ("http://h/b", None)]
    body = make_rdf(datetime(2026, 1, 15, 8, 0, 0), items)
    feed_ts, parsed = parse_feed_py(body)
    assert feed_ts == datetime(2026, 1, 15, 8, 0, 0)
    assert parsed == items

    # hand-written RDF: tz-offset dc:date normalized to UTC, item without
    # a link dropped, channel without dc:date -> null feed ts
    doc = (
        '<?xml version="1.0"?>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns="http://purl.org/rss/1.0/"'
        ' xmlns:dc="http://purl.org/dc/elements/1.1/">'
        '<channel rdf:about="urn:x"><title>t</title></channel>'
        '<item rdf:about="u1"><link>http://h/u1</link>'
        "<dc:date>2026-03-02T00:00:00+02:00</dc:date></item>"
        '<item rdf:about="u2"><title>no link</title></item>'
        "</rdf:RDF>"
    )
    feed_ts, parsed = parse_feed_py(doc)
    assert feed_ts is None
    assert parsed == [("http://h/u1", datetime(2026, 3, 1, 22, 0, 0))]
