"""Single-URL debug tools (S9) — smoke the real fetch/extract paths
through the CLI mains (ref tools/DownloadPage.scala, tools/ExtractText.scala)."""

from __future__ import annotations

import subprocess
import sys


def _corpus_article_url(spark):
    from newsfeeds_crawler_spark.synth.corpus import CorpusSpec, synthesize

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=3))
    for p in corpus.pages.values():
        if p.kind == "article" and p.status == 200 and p.caption:
            return p.url, p.caption
    raise AssertionError("no article page in synth corpus")


def test_download_then_extract_roundtrip(spark, tmp_path):
    url, caption = _corpus_article_url(spark)
    out = str(tmp_path / "page.html")
    r = subprocess.run(
        [sys.executable, "tools/download_page.py", "--url", url,
         "--out", out, "--synth", "--feeds", "5", "--items", "6",
         "--hosts", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "tools/extract_text.py", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r2.stdout.strip() == caption  # byte-exact through file roundtrip
