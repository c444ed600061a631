"""End-to-end equivalence: Spark engine vs the pure-Python oracle simulator.

This is the north_star gate: same seed list + politeness budget ⇒ EXACT
crawl order, EXACT final URL-seen set, byte-exact captions, decoded-pixel
equality — plus checkpoint/resume convergence after a mid-crawl kill.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions import codecs
from newsfeeds_crawler_spark.oracle import simulate
from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
from newsfeeds_crawler_spark.synth.tables import (
    corpus_df,
    hosts_df,
    preseen_df,
    seeds_df,
)

SPEC = CorpusSpec()  # default: 8 feeds, 12 items, every edge case planted


def _mk_engine(spark, corpus, wd, **cfg_kwargs):
    cfg = CrawlConfig(
        workers=corpus.spec.workers, tick_ms=corpus.spec.tick_ms, **cfg_kwargs
    )
    return CrawlEngine(
        spark,
        wd,
        corpus_df(spark, corpus).cache(),
        hosts_df(spark, corpus),
        seeds_df(spark, corpus),
        preseen_df(spark, corpus),
        cfg,
    )


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    corpus = synthesize(SPEC)
    oracle = simulate(corpus)
    eng = _mk_engine(spark, corpus, str(tmp_path_factory.mktemp("crawl")))
    eng.run()
    return corpus, oracle, eng


def test_crawl_order_exact(crawl):
    corpus, oracle, eng = crawl
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order


def test_seen_set_exact(crawl):
    corpus, oracle, eng = crawl
    got = {
        r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()
    }
    assert got == oracle.seen


def test_articles_captions_byte_exact_and_actions(crawl):
    corpus, oracle, eng = crawl
    rows = {
        r["url_canon"]: r
        for r in eng.articles_final().filter(F.col("action") != "preseen").collect()
    }
    assert set(rows) == set(oracle.articles)
    for u, o in oracle.articles.items():
        r = rows[u]
        assert r["caption"] == o["caption"], u          # byte-exact captions
        assert r["action"] == o["action"], u
        assert r["pub_ts"] == o["pub_ts"], u
        assert r["phash"] == o["phash"], u


def test_decoded_pixels_exact(crawl):
    """input_hint: decoded-pixel allclose — exact equality vs a reference
    decode of the stored bytes for every format, PSNR >= 40dB vs the
    pre-encode source image where the format is lossy (codecs.LOSSY), and
    the recomputed phash must equal the corpus-declared one."""
    from newsfeeds_crawler_spark.synth.corpus import _mk_image

    corpus, oracle, eng = crawl
    rows = eng.articles_final().filter(F.col("action") != "preseen").collect()
    assert rows
    fmts_seen = set()
    for r in rows:
        page = corpus.pages[r["url_canon"]]
        fmts_seen.add(page.fmt)
        want = codecs.decode_image(page.image, page.fmt)
        got = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(
            r["h"], r["w"], 3
        )
        np.testing.assert_array_equal(got, want)
        assert r["dec_phash"] == r["phash"]
        src = _mk_image(r["url_canon"], corpus.spec)[0]
        if page.fmt in codecs.LOSSY:
            assert codecs.psnr(got, src) >= 40.0  # input_hint lossy gate
        else:
            assert codecs.psnr(got, src) == float("inf")
    # the corpus default mixes lossless + lossy, so the 40dB branch binds
    assert fmts_seen & codecs.LOSSY and fmts_seen - codecs.LOSSY


def test_feeds_terminal_states_and_watermarks(crawl):
    corpus, oracle, eng = crawl
    got = {r["feed_canon"]: r for r in eng.feeds_final().collect()}
    assert set(got) == set(oracle.feeds)
    for fc, o in oracle.feeds.items():
        r = got[fc]
        assert r["state"] == o["state"], fc
        assert r["last_pub_ts"] == o["last_pub_ts"], fc
    # the empty feed really skipped its watermark (FeedManager.scala:87-89)
    assert any(
        r["state"] == "done_empty" and r["last_pub_ts"] is None
        for r in got.values()
    )


def test_robots_denied_set(crawl):
    corpus, oracle, eng = crawl
    got = {
        r["url_canon"]
        for r in eng.frontier_all()
        .filter(F.col("state") == "robots_denied")
        .collect()
    }
    want = {t.url_canon for t in oracle.tasks if t.state == "robots_denied"}
    assert got == want and got  # non-empty: the corpus plants robots paths


def test_metric_totals_match_oracle(crawl):
    corpus, oracle, eng = crawl
    m = (
        eng.metrics_df()
        .agg(
            F.sum("urls_fetched").alias("f"),
            F.sum("dedup_hits").alias("d"),
            F.sum("enqueued").alias("e"),
            F.sum("politeness_stalls").alias("s"),
        )
        .first()
    )
    assert m["f"] == len(oracle.crawl_order)
    assert m["d"] == sum(x["dedup_hits"] for x in oracle.metrics)
    assert m["e"] == sum(x["enqueued"] for x in oracle.metrics)
    assert m["s"] == sum(x["stalls"] for x in oracle.metrics)


def test_kill_and_resume_converges_identically(spark, tmp_path):
    """north_star: mid-crawl kill + orphan snapshot ⇒ resume converges to the
    identical frontier/seen state."""
    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=6, n_hosts=5))
    oracle = simulate(corpus)

    eng = _mk_engine(spark, corpus, str(tmp_path / "killed"), max_epochs=3)
    eng.run()  # stops mid-crawl after 3 epochs
    # simulate a crash mid-epoch-4: a table snapshot written but the epoch
    # manifest never committed (must be invisible after resume)
    orphan = eng.cat.read("frontier").withColumn("state", F.lit("CORRUPT"))
    eng.cat.write("frontier", orphan.localCheckpoint(eager=True))

    resumed = _mk_engine(spark, corpus, str(tmp_path / "killed"))
    resumed.run()

    got_order = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got_order == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()}
    assert got_seen == oracle.seen
    assert not resumed.cat.read("frontier").filter("state = 'CORRUPT'").count()


def test_kill_after_append_before_commit_no_duplicates(spark, tmp_path):
    """A crash BETWEEN an append-table write and commit_epoch leaves an
    orphan snapshot already containing the tick's rows. Resume re-runs the
    tick; its appends must chain from the epoch-pinned base (not LATEST),
    else the rows land twice in crawl_order() forever."""
    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=6, n_hosts=5))
    oracle = simulate(corpus)

    eng = _mk_engine(spark, corpus, str(tmp_path / "k2"), max_epochs=3)
    eng.run()
    # simulate the torn tick: epoch 3's log rows appended + table-committed,
    # but the epoch manifest never written (same rows the re-run will write)
    pinned = eng.cat.epoch_tables(eng.cat.last_epoch())
    committed_log = eng.cat.read("frontier_log", pinned["frontier_log"])
    replayed_rows = committed_log.limit(2).localCheckpoint(eager=True)
    eng.cat.write("frontier_log", replayed_rows, mode="append")
    assert eng.cat.current_version("frontier_log") > pinned["frontier_log"]

    resumed = _mk_engine(spark, corpus, str(tmp_path / "k2"))
    resumed.run()

    got_order = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got_order == oracle.crawl_order  # exact => no duplicated rows
    # the golden view must also be duplicate-free row-wise
    n = resumed.crawl_order().count()
    nd = resumed.crawl_order().dropDuplicates().count()
    assert n == nd


def test_hot_host_skew_with_salting_same_semantics(spark, tmp_path):
    """90%-skewed host + salted pre-rank: admission semantics unchanged."""
    corpus = synthesize(
        CorpusSpec(n_feeds=5, items_per_feed=8, n_hosts=4, host_skew=0.9)
    )
    oracle = simulate(corpus)
    eng = _mk_engine(
        spark, corpus, str(tmp_path / "skew"), salt_partitions=4
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order


def test_vacuum_during_run_preserves_results(spark, tmp_path):
    """Snapshot pruning every 2 epochs must not disturb results or resume."""
    import os

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    # frontier_buckets=0 pins the COW layout this test's dir-count bound
    # assumes (a bucketed frontier legitimately keeps carried-over commit
    # dirs alive across snapshots)
    eng = _mk_engine(spark, corpus, str(tmp_path / "vac"), frontier_buckets=0)
    eng.cfg.vacuum_every = 2
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    # pruning actually happened: ≤ keep_last(2) survivors at the last
    # vacuum plus ≤ vacuum_every(2) snapshots committed after it
    ddir = str(tmp_path / "vac" / "frontier" / "data")
    assert len(os.listdir(ddir)) <= 4


def test_bucketed_corpus_fetch_same_semantics(spark, tmp_path):
    """J5 storage-partitioned shape: bucketed corpus + per-epoch partition
    pruning must not change crawl order or the seen set."""
    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    eng = _mk_engine(
        spark, corpus, str(tmp_path / "buck"), corpus_buckets=8
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen


def test_bucketed_seen_store_same_semantics(spark, tmp_path):
    """seen_urls as a bucketed catalog table (touched-bucket merges) must
    not change crawl order, seen set, or resume behavior."""
    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    eng = _mk_engine(
        spark, corpus, str(tmp_path / "sb"), seen_buckets=8, max_epochs=3
    )
    eng.run()
    resumed = _mk_engine(spark, corpus, str(tmp_path / "sb"), seen_buckets=8)
    resumed.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()
    }
    assert got_seen == oracle.seen


def test_priority_frontier_exact_vs_oracle(spark, tmp_path):
    """north_star priority frontier at NON-trivial weights: admission order
    = (priority, FIFO key); engine must equal the oracle's priority-queue
    replay exactly, and the order must genuinely differ from pure FIFO."""
    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=8, n_hosts=5))
    w = dict(depth_weight=2000.0, recency_weight=1e-6)
    oracle = simulate(corpus, **w)
    fifo = simulate(corpus)
    assert oracle.crawl_order != fifo.crawl_order  # weights actually bite

    eng = _mk_engine(spark, corpus, str(tmp_path / "prio"), **w)
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen


def test_stall_timeout_quarantines_stuck_rows(spark, tmp_path):
    """Liveness guard (ref FeedManager.scala:31-33,67-69): a host whose
    crawl delay never elapses would stall the loop forever; after
    stall_timeout_epochs consecutive zero-admission ticks the engine must
    quarantine the stuck rows into ``errors``, log them as 'stalled', kill
    their feeds, and terminate."""
    corpus = synthesize(CorpusSpec(n_feeds=4, items_per_feed=5, n_hosts=3))
    # one host becomes effectively permanently blocked after its 1st fetch
    blocked = sorted(corpus.hosts)[0]
    corpus.hosts[blocked]["crawl_delay_ms"] = 10**9
    eng = _mk_engine(
        spark, corpus, str(tmp_path / "stall"), stall_timeout_epochs=4
    )
    res = eng.run()
    assert res["epochs"] < 100  # terminated, did not spin to max_epochs

    errs = eng.cat.read("errors").filter(F.col("stage") == "stall_timeout")
    n_err = errs.count()
    assert n_err > 0
    stalled = eng.frontier_all().filter(F.col("state") == "stalled")
    assert stalled.count() == n_err
    assert {r["host"] for r in stalled.collect()} == {blocked}
    # no pending work remains; stalled feeds are dead
    assert eng.cat.read("frontier").filter("state = 'pending'").count() == 0
    dead = {
        r["feed_canon"]
        for r in eng.feeds_final().filter("state = 'dead'").collect()
    }
    assert dead  # at least the feeds owning stalled items


def test_compressed_corpus_identical_results(spark, tmp_path):
    """Gzip/deflate + charset body decode (DefaultHttpFacade.scala:44-57,
    116): a corpus storing compressed bodies must produce the EXACT same
    crawl order, seen set, and captions as the plain-text corpus."""
    from newsfeeds_crawler_spark.synth.tables import corpus_df_compressed

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    cfg = CrawlConfig(workers=corpus.spec.workers, tick_ms=corpus.spec.tick_ms)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "gz"),
        corpus_df_compressed(spark, corpus).cache(),
        hosts_df(spark, corpus),
        seeds_df(spark, corpus),
        preseen_df(spark, corpus),
        cfg,
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    rows = {
        r["url_canon"]: r
        for r in eng.articles_final().filter(F.col("action") != "preseen").collect()
    }
    assert set(rows) == set(oracle.articles)
    for u, o in oracle.articles.items():
        assert rows[u]["caption"] == o["caption"], u  # byte-exact through gzip


def test_log_compaction_preserves_results_and_bounds_dirs(spark, tmp_path):
    """compact_log_every rewrites the append logs as one snapshot so a long
    run's log reads stay O(1) dirs, with identical crawl results."""
    import os

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    eng = _mk_engine(spark, corpus, str(tmp_path / "clog"))
    eng.cfg.compact_log_every = 3
    eng.cfg.vacuum_every = 3
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    m = eng.metrics_df().agg(F.sum("urls_fetched").alias("f")).first()
    assert m["f"] == len(oracle.crawl_order)
    # dirs bounded: ≤ compact interval + a couple of snapshots, not #epochs
    man = eng.cat._manifest("frontier_log", eng.cat.current_version("frontier_log"))
    assert len(man["data_dirs"]) <= eng.cfg.compact_log_every + 2


def test_all_knobs_combined_exact(spark, tmp_path):
    """Feature-interaction gate: bucketed seen store + cuckoo prefilter +
    bucketed corpus + compressed bodies + priority weights + salting +
    log compaction + vacuum + host pending quota + mid-run kill/resume —
    ALL at once, still exactly equal to the oracle replay."""
    from newsfeeds_crawler_spark.synth.tables import corpus_df_compressed

    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=6, n_hosts=5))
    w = dict(depth_weight=2000.0, recency_weight=1e-6, host_pending_cap=3)
    oracle = simulate(corpus, **w)
    # the quota knob must actually bind in this spec, or adding it to the
    # matrix proves nothing
    assert sum(1 for t in oracle.tasks if t.state == "quota_denied") > 0

    def mk(max_epochs=10_000):
        cfg = CrawlConfig(
            workers=corpus.spec.workers,
            tick_ms=corpus.spec.tick_ms,
            seen_buckets=8,
            corpus_buckets=8,
            seen_filter="cuckoo",
            bloom_expected_per_bucket=1000,
            salt_partitions=2,
            compact_log_every=3,
            vacuum_every=4,
            max_epochs=max_epochs,
            **w,
        )
        return CrawlEngine(
            spark,
            str(tmp_path / "kitchen"),
            corpus_df_compressed(spark, corpus).cache(),
            hosts_df(spark, corpus),
            seeds_df(spark, corpus),
            preseen_df(spark, corpus),
            cfg,
        )

    mk(max_epochs=3).run()   # killed mid-crawl
    eng = mk()
    eng.run()                # resumes from the epoch manifest
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen
    rows = {
        r["url_canon"]: r["caption"]
        for r in eng.articles_final().filter(F.col("action") != "preseen").collect()
    }
    for u, o in oracle.articles.items():
        assert rows[u] == o["caption"], u


def test_bucketed_frontier_same_semantics_and_touched_buckets(spark, tmp_path):
    """frontier as a host-bucketed catalog table: the per-epoch state
    transition is a touched-bucket merge (write I/O ∝ active hosts, never
    O(|pending|)) and must not change crawl order, seen set, or resume."""
    import json
    import os

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    wd = str(tmp_path / "fb")
    eng = _mk_engine(spark, corpus, wd, frontier_buckets=16, max_epochs=3)
    eng.run()
    resumed = _mk_engine(spark, corpus, wd, frontier_buckets=16)
    resumed.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()
    }
    assert got_seen == oracle.seen

    # write I/O ∝ touched buckets: at least one post-init frontier snapshot
    # carries over bucket dirs from its predecessor instead of rewriting all
    snapdir = os.path.join(wd, "frontier", "_snapshots")
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(snapdir) if f.startswith("v")
    )
    assert len(versions) >= 3
    carried_any = False
    for v1, v2 in zip(versions, versions[1:]):
        with open(os.path.join(snapdir, f"v{v1}.json")) as f:
            d1 = set(json.load(f)["data_dirs"])
        with open(os.path.join(snapdir, f"v{v2}.json")) as f:
            d2 = set(json.load(f)["data_dirs"])
        if d1 & d2:
            carried_any = True
            assert len(d1 & d2) >= 1
    assert carried_any, "no frontier snapshot carried over any bucket dir"


def test_bucketed_hosts_feeds_same_semantics_and_touched_buckets(
    spark, tmp_path
):
    """hosts/feeds as hash-bucketed catalog tables: the per-epoch politeness
    update (≤ workers hosts) and feed outcome/countdown update (feeds the
    tick touched) are touched-bucket merges — write I/O ∝ tick activity,
    never O(|hosts|)/O(|feeds|) — and must not change crawl order, seen set,
    feed watermarks, or resume."""
    import json
    import os

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    wd = str(tmp_path / "hf")
    eng = _mk_engine(
        spark, corpus, wd, hosts_buckets=8, feeds_buckets=8, max_epochs=3
    )
    eng.run()
    resumed = _mk_engine(spark, corpus, wd, hosts_buckets=8, feeds_buckets=8)
    resumed.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()
    }
    assert got_seen == oracle.seen
    got_feeds = {
        r["feed_canon"]: (r["state"], r["last_pub_ts"])
        for r in resumed.feeds_final().collect()
    }
    want_feeds = {
        fc: (f["state"], f["last_pub_ts"]) for fc, f in oracle.feeds.items()
    }
    assert got_feeds == want_feeds

    # write I/O ∝ touched buckets: post-init snapshots carry over bucket
    # dirs from their predecessor instead of rewriting every bucket
    for table in ("hosts", "feeds"):
        snapdir = os.path.join(wd, table, "_snapshots")
        versions = sorted(
            int(f[1:-5]) for f in os.listdir(snapdir) if f.startswith("v")
        )
        assert len(versions) >= 3, table
        carried_any = False
        for v1, v2 in zip(versions, versions[1:]):
            with open(os.path.join(snapdir, f"v{v1}.json")) as f:
                d1 = set(json.load(f)["data_dirs"])
            with open(os.path.join(snapdir, f"v{v2}.json")) as f:
                d2 = set(json.load(f)["data_dirs"])
            if d1 & d2:
                carried_any = True
        assert carried_any, f"no {table} snapshot carried over any bucket dir"


def test_mixed_rss_atom_corpus_exact(spark, tmp_path):
    """Atom and RSS 1.0 (RDF) feeds flow through the same Arrow parse UDF,
    probe, and watermark path — crawl order, seen set, and feed watermarks
    must be exactly the oracle's on a corpus that mixes all three formats
    ROME parses transparently (RomeFeedParser.scala:20-28)."""
    corpus = synthesize(
        CorpusSpec(
            n_feeds=9, items_per_feed=6, n_hosts=5,
            atom_frac=0.34, rdf_frac=0.33,
        )
    )
    # the mix is genuinely three-way
    feed_bodies = [
        p.body for p in corpus.pages.values() if p.kind == "feed" and p.body
    ]
    assert any("2005/Atom" in b for b in feed_bodies)
    assert any("<rss" in b for b in feed_bodies)
    assert any("rdf-syntax-ns" in b for b in feed_bodies)

    oracle = simulate(corpus)
    eng = _mk_engine(spark, corpus, str(tmp_path / "atom"))
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen
    got_feeds = {r["feed_canon"]: r["last_pub_ts"] for r in eng.feeds_final().collect()}
    want_feeds = {fc: f["last_pub_ts"] for fc, f in oracle.feeds.items()}
    assert got_feeds == want_feeds


def test_socket_timeout_exact_vs_oracle(spark, tmp_path):
    """clientHttpParams consumption (ref DefaultHttpFacade.scala:96-103):
    with http.socket.timeout set, fetches whose deterministic simulated
    latency reaches it yield null bodies (the reference's exception→null
    routing, HttpManager.scala:112-121) — and the engine must still match
    the oracle's crawl order / seen set / feed states exactly."""
    from newsfeeds_crawler_spark.functions.httpsim import (
        SOCKET_TIMEOUT_PARAM,
        sim_latency_ms_py,
    )

    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=8, n_hosts=5))
    timeout = 15_000  # latencies are uniform-ish over [0, 30s)

    # the timeout is non-trivial on this corpus: some 200 pages survive,
    # some time out (else the test would pass vacuously)
    live = [p.url_canon for p in corpus.pages.values() if p.status == 200]
    lat = [sim_latency_ms_py(u) for u in live]
    assert any(l >= timeout for l in lat) and any(l < timeout for l in lat)

    oracle = simulate(corpus, socket_timeout_ms=timeout)
    baseline = simulate(corpus)
    assert oracle.crawl_order != baseline.crawl_order  # timeouts changed the run

    eng = _mk_engine(
        spark, corpus, str(tmp_path / "sockto"),
        client_http_params={SOCKET_TIMEOUT_PARAM: timeout},
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen
    got_feeds = {r["feed_canon"]: r["state"] for r in eng.feeds_final().collect()}
    want_feeds = {fc: f["state"] for fc, f in oracle.feeds.items()}
    assert got_feeds == want_feeds


def test_articles_partitioned_by_host_bucket(crawl):
    """north_star: decoded pixels + captions are written back with explicit
    partitioning on host-bucket — every committed articles dir is a
    bucket-level ``__bucket=N`` dir (manifest-tracked, so the read is ONE
    multi-path scan however many epochs append), the host_bucket column
    matches a recompute from the row's host, the dir each row lives in
    matches its host_bucket, and a bucket-pruned read lists only that
    bucket's files."""
    from newsfeeds_crawler_spark.functions.urls import (
        host_bucket as hb_col,
        url_host,
    )

    corpus, oracle, eng = crawl
    man = eng.cat._manifest("articles", eng.cat.current_version("articles"))
    assert man["meta"].get("bucketed_key") == "host_bucket"
    assert man["meta"].get("num_buckets") == eng.cfg.num_host_buckets
    assert man["data_dirs"]  # empty-tick appends add no dirs
    assert all("__bucket=" in d for d in man["data_dirs"])

    arts = eng.cat.read_committed("articles")
    assert "host_bucket" in arts.columns
    B = eng.cfg.num_host_buckets
    mismatch = arts.filter(
        F.col("host_bucket")
        != hb_col(url_host(F.col("url_canon"), canonical=True), B)
    ).count()
    assert mismatch == 0
    # bucket pruning: a pruned read lists ONLY that bucket's files and
    # returns exactly the rows whose host_bucket equals it
    some_bucket = int(arts.select("host_bucket").first()["host_bucket"])
    pruned = eng.cat.read(
        "articles", eng.cat.current_version("articles"), buckets={some_bucket}
    )
    assert pruned.inputFiles() and all(
        f"__bucket={some_bucket}/" in f for f in pruned.inputFiles()
    )
    assert (
        pruned.count()
        == arts.filter(F.col("host_bucket") == some_bucket).count()
    )
    # rows physically live in their own bucket's dir
    assert pruned.filter(F.col("host_bucket") != some_bucket).count() == 0


def test_image_neardup_report_matches_bruteforce(spark, tmp_path):
    """Cross-feed image dedup over crawl output: the engine's banded phash
    hamming report must equal a python brute-force over the crawled pages'
    declared phashes (dec_phash == phash is pinned elsewhere), and it must
    recover the corpus's PLANTED near-dup image pairs that were actually
    crawled."""
    corpus = synthesize(
        CorpusSpec(n_feeds=8, items_per_feed=10, n_hosts=6,
                   image_neardup_frac=0.35)
    )
    assert corpus.neardup_pairs  # the knob planted some
    oracle = simulate(corpus)

    eng = _mk_engine(spark, corpus, str(tmp_path / "neardup"))
    eng.run()

    MAX_DIST = 3
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in eng.image_neardup_pairs(max_dist=MAX_DIST).collect()
    }

    # brute force over the phashes of the articles the crawl actually
    # stored (caption-less / dead pages never reach the table, and a URL
    # appears once however many feeds list it)
    crawled = sorted(
        u for u, o in oracle.articles.items() if o["phash"] is not None
    )
    ph = {u: corpus.pages[u].phash for u in crawled}
    want = set()
    for i, a in enumerate(crawled):
        for b in crawled[i + 1:]:
            lo, hi = (a, b) if a < b else (b, a)
            d = bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1")
            if d <= MAX_DIST:
                want.add((lo, hi, d))
    assert got == want

    # at least one PLANTED pair was crawled on both sides and recovered
    crawled_set = set(crawled)
    planted_crawled = {
        (min(a, b), max(a, b))
        for a, b in corpus.neardup_pairs
        if a in crawled_set and b in crawled_set
    }
    found_pairs = {(a, b) for a, b, _ in got}
    assert planted_crawled and planted_crawled & found_pairs

    # clusters: components over the same pairs vs a python union-find
    comp = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in eng.image_neardup_components(max_dist=MAX_DIST).collect()
    }
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in want:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_comp = {v: (find(v), find(v) == v) for v in parent}
    assert comp == want_comp


def test_articles_bucket_compaction_preserves_results(spark, tmp_path):
    """compact_articles_every folds long-appended article buckets to
    latest-per-url mid-crawl; final articles/crawl order must equal the
    oracle exactly and per-bucket dir counts stay bounded."""
    from collections import Counter

    corpus = synthesize(CorpusSpec(n_feeds=8, items_per_feed=10, n_hosts=3))
    oracle = simulate(corpus)
    eng = _mk_engine(
        spark, corpus, str(tmp_path / "ac"),
        compact_articles_every=2, articles_max_dirs_per_bucket=2,
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen

    man = eng.cat._manifest("articles", eng.cat.current_version("articles"))
    per_bucket = Counter(eng.cat._bucket_of(d) for d in man["data_dirs"])
    # bounded: threshold dirs + at most compact_articles_every-1 appends
    # since the last compaction tick
    bound = 2 + eng.cfg.compact_articles_every
    assert per_bucket and max(per_bucket.values()) <= bound, per_bucket


def test_starvation_guard_exact_vs_oracle(spark, tmp_path):
    """Starvation guard over the priority frontier: rows pending >=
    starvation_epochs ticks escalate ahead of every fresh row (FIFO within
    the escalated class). The engine must match the oracle's replay
    exactly, the guard must actually re-order the crawl vs the unguarded
    priority run, and the final seen set is unchanged (the guard changes
    WHEN, never WHETHER)."""
    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=8, n_hosts=2))
    w = dict(depth_weight=2000.0, recency_weight=1e-6)
    N = 3
    oracle = simulate(corpus, **w, starvation_epochs=N)
    unguarded = simulate(corpus, **w)
    assert oracle.crawl_order != unguarded.crawl_order  # the guard bites
    assert oracle.seen == unguarded.seen

    eng = _mk_engine(
        spark, corpus, str(tmp_path / "starve"), starvation_epochs=N, **w
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen


def test_parse_extract_error_payloads_quarantined(spark, tmp_path):
    """S8 parity: the reference dumps the offending payload on parse and
    extraction failures (util/ErrorDumping.scala:17-27 via
    ParsingManager.scala:40-45 / ExtractionManager.scala:37-42) — the
    engine must land a stage='parse' row with the feed body for the
    unparseable feed, and a stage='extract' row with the page body for
    every fetched article whose caption extraction yields null."""
    corpus = synthesize(
        CorpusSpec(n_feeds=6, items_per_feed=8, n_hosts=5, no_caption_frac=0.3)
    )
    oracle = simulate(corpus)
    eng = _mk_engine(spark, corpus, str(tmp_path / "errs"))
    eng.run()

    errs = [
        (r["stage"], r["url_canon"], r["payload"])
        for r in eng.cat.read_committed("errors").collect()
    ]
    fetched = {u for u, _, _ in oracle.crawl_order}

    from newsfeeds_crawler_spark.functions.feedparse import parse_feed_py

    want_parse = {
        u
        for u, p in corpus.pages.items()
        if p.kind == "feed" and p.status == 200 and p.body is not None
        and parse_feed_py(p.body) is None and u in fetched
    }
    assert want_parse  # with_unparseable_feed plants one
    got_parse = {u for s, u, _ in errs if s == "parse"}
    assert got_parse == want_parse
    for s, u, payload in errs:
        if s == "parse":
            assert payload == corpus.pages[u].body  # byte-exact dump

    want_extract = {
        t.url_canon
        for t in oracle.tasks
        if t.kind == "article" and t.state == "skipped"
        and corpus.pages.get(t.url_canon) is not None
        and corpus.pages[t.url_canon].status == 200
        and corpus.pages[t.url_canon].body is not None
    }
    assert want_extract  # no_caption_frac=0.3 plants several
    got_extract = {u for s, u, _ in errs if s == "extract"}
    assert got_extract == want_extract
    for s, u, payload in errs:
        if s == "extract":
            assert payload == corpus.pages[u].body


def test_per_feed_stall_timeout_exact_vs_oracle(spark, tmp_path):
    """Per-feed liveness guard (ref FeedManager.scala:31-33,67-69: ONE
    stuck feed dies after maxWaitingTimeBeforeStop while the crawl
    proceeds): with one host permanently blocked after its first access,
    the feeds owning its pending items must die at the sweep while every
    other feed completes — engine exactly equal to the oracle replay,
    WITHOUT the global zero-admission guard."""
    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    blocked = sorted(corpus.hosts)[1]
    corpus.hosts[blocked]["crawl_delay_ms"] = 10**9
    N = 4
    oracle = simulate(corpus, feed_stall_epochs=N)
    want_stalled = {t.url_canon for t in oracle.tasks if t.state == "stalled"}
    assert want_stalled  # the guard actually bites
    assert any(f["state"] == "done" for f in oracle.feeds.values())
    assert any(f["state"] == "dead" for f in oracle.feeds.values())

    eng = _mk_engine(
        spark, corpus, str(tmp_path / "fstall"),
        feed_stall_epochs=N, stall_timeout_epochs=0, max_epochs=300,
    )
    res = eng.run()
    assert res["epochs"] < 300  # the per-feed guard alone converged the run

    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen
    got_feeds = {
        r["feed_canon"]: (r["state"], r["last_pub_ts"])
        for r in eng.feeds_final().collect()
    }
    want_feeds = {
        fc: (f["state"], f["last_pub_ts"]) for fc, f in oracle.feeds.items()
    }
    assert got_feeds == want_feeds

    got_stalled = {
        r["url_canon"]
        for r in eng.frontier_all().filter(F.col("state") == "stalled").collect()
    }
    assert got_stalled == want_stalled
    errs = eng.cat.read_committed("errors").filter(
        F.col("stage") == "feed_timeout"
    )
    assert {r["url_canon"] for r in errs.collect()} == want_stalled
    # no pending work remains
    assert eng.cat.read_committed("frontier").filter("state='pending'").count() == 0


def test_frontier_heads_incremental_admission(spark, tmp_path):
    """Incremental admission (the round-3 verdict's top scale item): the
    heads table must hold EXACTLY the top-1 pending row per host under the
    admission order (recompute check mid-run), its maintenance must be a
    touched-bucket merge (snapshot dirs carry over), and a kill/resume run
    must still be oracle-exact."""
    import itertools
    import json
    import os

    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=8, n_hosts=5))
    oracle = simulate(corpus)
    wd = str(tmp_path / "heads")
    eng = _mk_engine(spark, corpus, wd, max_epochs=3)
    eng.run()
    assert eng.cat.exists("frontier_heads")

    # heads invariant: top-1 per host of the pending frontier under the
    # admission order (priority, FIFO key) — priority is constant 0 here
    pend = [
        (r["host"], r["priority"], r["e_epoch"], r["e_rank"], r["e_sub"],
         r["url_canon"])
        for r in eng.cat.read_committed("frontier")
        .filter("state='pending'").collect()
    ]
    want_heads = {
        host: min(g, key=lambda x: x[1:5])[5]
        for host, g in itertools.groupby(
            sorted(pend), key=lambda x: x[0]
        )
    }
    got_heads = {
        r["host"]: r["url_canon"]
        for r in eng.cat.read_committed("frontier_heads").collect()
    }
    assert got_heads == want_heads and got_heads

    resumed = _mk_engine(spark, corpus, wd)
    resumed.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()
    }
    assert got_seen == oracle.seen

    # maintenance I/O ∝ touched buckets: post-init heads snapshots carry
    # over bucket dirs instead of rewriting every bucket
    snapdir = os.path.join(wd, "frontier_heads", "_snapshots")
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(snapdir) if f.startswith("v")
    )
    assert len(versions) >= 3
    carried_any = False
    for v1, v2 in zip(versions, versions[1:]):
        with open(os.path.join(snapdir, f"v{v1}.json")) as f:
            d1 = set(json.load(f)["data_dirs"])
        with open(os.path.join(snapdir, f"v{v2}.json")) as f:
            d2 = set(json.load(f)["data_dirs"])
        if d1 & d2:
            carried_any = True
    assert carried_any, "no heads snapshot carried over any bucket dir"


def test_caption_consistency_report_flags_planted_mismatches(spark, tmp_path):
    """Caption↔image consistency over crawl output: pages whose caption
    tags were planted from the WRONG image must score < 1.0 (complement
    phash ⇒ exactly 0.0); every other tagged page scores exactly 1.0 —
    and the tagged corpus still crawls oracle-exact (tags ride inside the
    caption through the byte-exact extract path)."""
    corpus = synthesize(
        CorpusSpec(
            n_feeds=6, items_per_feed=8, n_hosts=5,
            caption_tags=True, caption_mismatch_frac=0.3,
        )
    )
    assert corpus.caption_mismatches
    oracle = simulate(corpus)
    eng = _mk_engine(spark, corpus, str(tmp_path / "capcons"))
    eng.run()

    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    rows = {
        r["url_canon"]: r["consistency"]
        for r in eng.caption_consistency_report().collect()
    }
    assert rows
    crawled_mismatch = set(corpus.caption_mismatches) & set(rows)
    assert crawled_mismatch  # some planted mislabels were actually crawled
    for u, score in rows.items():
        if u in crawled_mismatch:
            assert score == 0.0, u      # complement phash: every band wrong
        elif corpus.pages[u].caption and " img" in corpus.pages[u].caption:
            assert score == 1.0, u      # consistent tags: every band right


def test_big_hosts_mode_exact_and_no_dim_broadcast(spark, tmp_path):
    """Big-hosts mode (hosts_broadcast_max exceeded): every hosts-dimension
    join leaves the broadcast path — admission goes shuffled-hash on host,
    the per-tick robots gate semi-prunes the dim to the tick's hosts — and
    the crawl must stay EXACTLY oracle-equal through a mid-run kill/resume.
    The one structure SURVEY §2.3 J4 flags as breaking at 10^8 hosts."""
    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=6, n_hosts=5))
    oracle = simulate(corpus)
    wd = str(tmp_path / "bigh")
    eng = _mk_engine(spark, corpus, wd, hosts_broadcast_max=0, max_epochs=3)
    eng.run()
    assert eng._big_hosts is True
    resumed = _mk_engine(spark, corpus, wd, hosts_broadcast_max=0)
    resumed.run()
    assert resumed._big_hosts is True  # resume read the persisted count
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()
    }
    assert got_seen == oracle.seen
    rows = {
        r["url_canon"]: r["caption"]
        for r in resumed.articles_final().filter(
            F.col("action") != "preseen"
        ).collect()
    }
    for u, o in oracle.articles.items():
        assert rows[u] == o["caption"], u


@pytest.mark.parametrize("spec_gate", [True, False])
def test_speculative_gate_on_off_equivalence(spark, tmp_path, spec_gate):
    """speculative_gate is purely an execution-order optimization: a full
    crawl WITH a mid-run per-feed stall sweep (which bumps the heads/hosts
    versions between ticks ⇒ speculation key MISSES and the gate recomputes)
    must be bit-identical with the flag on and off — crawl order, seen set,
    articles, feed states, and metric totals all oracle-exact either way."""
    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    blocked = sorted(corpus.hosts)[1]
    corpus.hosts[blocked]["crawl_delay_ms"] = 10**9
    N = 4
    oracle = simulate(corpus, feed_stall_epochs=N)
    assert any(t.state == "stalled" for t in oracle.tasks)  # sweep fires

    eng = _mk_engine(
        spark, corpus, str(tmp_path / f"spec{int(spec_gate)}"),
        speculative_gate=spec_gate, feed_stall_epochs=N,
        stall_timeout_epochs=0, max_epochs=300,
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen
    got_feeds = {
        r["feed_canon"]: (r["state"], r["last_pub_ts"])
        for r in eng.feeds_final().collect()
    }
    want_feeds = {
        fc: (f["state"], f["last_pub_ts"]) for fc, f in oracle.feeds.items()
    }
    assert got_feeds == want_feeds
    fetched = eng.metrics_df().agg(F.sum("urls_fetched")).collect()[0][0]
    assert fetched == len(oracle.crawl_order)


def test_hosts_pending_count_backfilled_for_old_layout(spark, tmp_path):
    """A workdir written before HOSTS_SCHEMA gained pending_count must
    still resume: the read boundary backfills the column instead of
    failing with a missing-column error."""
    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    wd = str(tmp_path / "oldlay")
    eng = _mk_engine(spark, corpus, wd, max_epochs=2)
    eng.run()
    # simulate the pre-quota layout: rewrite the hosts snapshot WITHOUT the
    # pending_count column and pin it in the epoch manifest
    cat = eng.cat
    last = cat.last_epoch()
    versions = dict(cat.epoch_tables(last))
    hosts_old = cat.read("hosts", versions["hosts"]).drop("pending_count")
    hman = cat.meta("hosts", versions["hosts"])
    versions["hosts"] = cat.write_bucketed(
        "hosts", hosts_old.localCheckpoint(eager=True),
        key=hman["bucketed_key"], num_buckets=hman["num_buckets"],
    )
    cat.commit_epoch(last, versions, meta=cat.epoch_meta(last))

    resumed = _mk_engine(spark, corpus, wd)
    resumed.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()
    }
    assert got_seen == oracle.seen


def test_quota_enabled_on_resume_recounts_exactly(spark, tmp_path):
    """Flipping host_pending_cap ON over a workdir whose earlier run had it
    OFF must not use stale counts: the resume recounts pending rows per
    host ONCE from the frontier. Flipping at the init boundary makes the
    whole crawl quota-gated from tick 0, so the recounted run must equal
    the quota oracle EXACTLY."""
    corpus = synthesize(CorpusSpec(n_feeds=6, items_per_feed=6, n_hosts=5))
    cap = 3
    oracle = simulate(corpus, host_pending_cap=cap)
    assert sum(1 for t in oracle.tasks if t.state == "quota_denied") > 0

    wd = str(tmp_path / "qflip")
    # first run: quota OFF, init only (max_epochs=0 commits epoch 0 and
    # stops before any tick)
    eng = _mk_engine(spark, corpus, wd, host_pending_cap=0, max_epochs=0)
    eng.run()
    assert eng.cat.last_epoch() == 0

    resumed = _mk_engine(spark, corpus, wd, host_pending_cap=cap)
    resumed.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in resumed.articles_final().collect()
    }
    assert got_seen == oracle.seen
    denied = {
        r["url_canon"]
        for r in resumed.frontier_all()
        .filter(F.col("state") == "quota_denied")
        .collect()
    }
    assert denied == {
        t.url_canon for t in oracle.tasks if t.state == "quota_denied"
    }


def test_host_seed_cap_depth0_budget_exact_vs_oracle(spark, tmp_path):
    """Depth-class budgets: the depth-0 class (host_seed_cap) caps feeds
    per host at init — a planted seed-list link farm (skewed host
    assignment piles feeds onto host0) must overflow into terminal
    quota_denied seeds with dead feeds, while the depth-1 class
    (host_pending_cap) independently caps that host's article queue. The
    whole crawl stays oracle-exact with BOTH classes binding."""
    corpus = synthesize(
        CorpusSpec(n_feeds=8, items_per_feed=6, n_hosts=3, host_skew=1.0)
    )
    caps = dict(host_seed_cap=2, host_pending_cap=4)
    oracle = simulate(corpus, **caps)
    want_qdenied = {t.url_canon for t in oracle.tasks if t.state == "quota_denied"}
    seed_qdenied = {
        t.url_canon
        for t in oracle.tasks
        if t.state == "quota_denied" and t.kind == "feed"
    }
    assert seed_qdenied, "the depth-0 cap never bound — weaken the spec"
    assert want_qdenied - seed_qdenied, "the depth-1 cap never bound"

    eng = _mk_engine(spark, corpus, str(tmp_path / "farm"), **caps)
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert got_seen == oracle.seen
    got_qdenied = {
        r["url_canon"]
        for r in eng.frontier_all()
        .filter(F.col("state") == "quota_denied")
        .collect()
    }
    assert got_qdenied == want_qdenied
    got_feeds = {
        r["feed_canon"]: r["state"] for r in eng.feeds_final().collect()
    }
    want_feeds = {fc: f["state"] for fc, f in oracle.feeds.items()}
    assert got_feeds == want_feeds


def test_host_seed_cap_requires_heads_mode(spark, tmp_path):
    corpus = synthesize(CorpusSpec(n_feeds=4, items_per_feed=3, n_hosts=3))
    eng = _mk_engine(
        spark, corpus, str(tmp_path / "scap"),
        host_seed_cap=1, frontier_buckets=0,
    )
    with pytest.raises(ValueError, match="heads mode"):
        eng.run()
