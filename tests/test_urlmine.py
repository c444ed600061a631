"""URL template mining (operators/urlmine.py): generalization, counts,
trap flag, top-k rank, and partition invariance."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.urlmine import url_templates


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_templates_counts_and_trap(spark):
    urls = (
        # calendar trap: 6 distinct URLs, one template
        [f"https://a.com/cal/2024/d{i}" for i in range(6)]
        # content family: 4 occurrences, 2 distinct
        + ["https://a.com/item7/v1", "https://a.com/item7/v1",
           "https://a.com/item9/v2", "https://a.com/item9/v2"]
        # another host entirely
        + ["https://b.com/about"]
    )
    out = {
        (r.host, r.template): r
        for r in url_templates(
            _urls(spark, urls), k=3, trap_min_distinct=5
        ).collect()
    }
    cal = out[("a.com", "/cal/{n}/d{n}")]
    assert cal.n_urls == 6 and cal.n_distinct_urls == 6 and cal.trap
    item = out[("a.com", "/item{n}/v{n}")]
    assert item.n_urls == 4 and item.n_distinct_urls == 2 and not item.trap
    assert cal.rank == 1 and item.rank == 2  # 6 > 4
    ab = out[("b.com", "/about")]
    assert ab.n_urls == 1 and not ab.trap and ab.rank == 1


def test_top_k_bounds_and_tie_break(spark):
    # 5 templates on one host, each 1 URL: k=3 keeps the 3 lexicographically
    # smallest templates (count tie -> template string order)
    urls = [f"https://t.com/{p}" for p in ["e", "d", "c", "b", "a"]]
    out = url_templates(_urls(spark, urls), k=3, trap_min_distinct=99).collect()
    assert sorted(r.template for r in out) == ["/a", "/b", "/c"]
    assert {r.rank for r in out} == {1, 2, 3}


def test_query_strings_generalize_too(spark):
    urls = [
        "https://q.com/search?page=1&sid=12345",
        "https://q.com/search?page=2&sid=99999",
    ]
    out = url_templates(_urls(spark, urls), k=1, trap_min_distinct=99).collect()
    assert len(out) == 1
    assert out[0].template == "/search?page={n}&sid={n}"
    assert out[0].n_urls == 2 and out[0].n_distinct_urls == 2


def test_partition_invariance(spark):
    urls = [f"https://h{i % 4}.com/p{i % 9}/x{i}" for i in range(200)]
    df = _urls(spark, urls)
    a = sorted(map(tuple, url_templates(df, k=2).collect()))
    b = sorted(map(tuple, url_templates(df.repartition(7), k=2).collect()))
    assert a == b
