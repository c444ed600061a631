"""Typed .properties configuration (S1/P7) — mirrors the reference's own
ConfigurationTest (golden file with every suffix-typed literal)."""

from __future__ import annotations

import textwrap

from newsfeeds_crawler_spark.config import (
    CrawlerConfiguration,
    parse_properties,
    typed_value,
)

GOLDEN = textwrap.dedent("""\
    # comment line
    ! also a comment
    feed.1=http://example.com/rss
    feed.2=http://example2.com/rss/
    feedManager.maxWaitingTimeBeforeStop=55000
    db.username=foouser
    db.password=bar
    db.url=jdbc:someengine:some
    http.hostAccessInterval=1000
    http.workersNum=3
    httpClient.someCoolIntParamName=100i
    httpClient.someCoolLongParamName=200l
    httpClient.someCoolBooleanParamName=true
    httpClient.someCoolDoubleParamName=2.7d
    httpClient.someCoolStringParamName=someString
""")


def test_golden_configuration_roundtrip(tmp_path):
    p = tmp_path / "c.properties"
    p.write_text(GOLDEN)
    cfg = CrawlerConfiguration.from_properties_file(str(p))
    assert cfg.feeds == {"http://example.com/rss", "http://example2.com/rss/"}
    assert cfg.max_waiting_time_before_stop == 55000
    assert cfg.db_username == "foouser"
    assert cfg.db_password == "bar"
    assert cfg.db_url == "jdbc:someengine:some"
    assert cfg.http_workers_number == 3
    assert cfg.host_access_interval == 1000
    assert cfg.client_http_params == {
        "someCoolIntParamName": 100,
        "someCoolLongParamName": 200,
        "someCoolBooleanParamName": True,
        "someCoolDoubleParamName": 2.7,
        "someCoolStringParamName": "someString",
    }


def test_typed_literals_are_full_match():
    assert typed_value("100i") == 100 and isinstance(typed_value("100i"), int)
    assert typed_value("200l") == 200
    assert typed_value("2.7d") == 2.7
    assert typed_value("TRUE") is True and typed_value("false") is False
    # partial matches stay strings (anchored semantics)
    for s in ("100ix", "x100i", "2.7dd", "truely", "100", "2.7"):
        assert typed_value(s) == s


def test_value_as_key_quirk_replicated(tmp_path):
    """Configuration.scala:81 looks the driver-class NAME up as a KEY:
    db_driver_class is None unless a literal property with that key exists."""
    p = tmp_path / "c.properties"
    p.write_text(GOLDEN)
    assert CrawlerConfiguration.from_properties_file(str(p)).db_driver_class is None
    p.write_text(GOLDEN + "com.mysql.jdbc.Driver=weird\n")
    got = CrawlerConfiguration.from_properties_file(str(p))
    assert got.db_driver_class == "weird"


def test_properties_grammar_subset():
    props = parse_properties(
        "a=1\nb: 2\nc 3\nd=line1\\\n  line2\ne\\:x=v\n  # not=this\n"
    )
    assert props == {"a": "1", "b": "2", "c": "3", "d": "line1line2", "e:x": "v"}


def test_to_crawl_config_mapping(tmp_path):
    p = tmp_path / "c.properties"
    p.write_text(GOLDEN)
    cfg = CrawlerConfiguration.from_properties_file(str(p)).to_crawl_config()
    assert cfg.workers == 3
    assert cfg.tick_ms == 1000
    assert cfg.stall_timeout_epochs == 55  # 55000 ms / 1000 ms ticks
