"""robots.txt parsing — Disallow prefixes + Crawl-delay for a user agent.

The reference crawler has no robots support at all (DefaultHttpFacade
fetches unconditionally); the north_star requires it. Parsing happens once
per host at discovery time (the parsed prefixes live in the ``hosts`` state
table, consumed by operators.politeness.robots_split), so the parser is a
Spark Column expression over the robots.txt body — no Python in the path —
with a pure-Python mirror for the oracle side.

Grammar subset (the de-facto standard): ``User-agent:`` opens a group;
``Disallow:`` / ``Crawl-delay:`` lines bind to every agent of the current
group; group matching is exact-agent-or-``*``; an empty Disallow value
means "allow all" and contributes no prefix. Comments (#) stripped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def robots_sections(body: Column) -> Column:
    """Split a robots.txt body into per-line structs (line_no, key, value),
    keys lower-cased, comments and blanks dropped. Building block kept
    separate so tests can pin the line grammar."""
    lines = F.split(body, r"\r?\n")
    idx = F.sequence(F.lit(0), F.greatest(F.size(lines) - 1, F.lit(0)))
    structs = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("line_no"),
            F.lower(
                F.trim(
                    F.substring_index(
                        F.substring_index(F.element_at(lines, i + 1), "#", 1),
                        ":",
                        1,
                    )
                )
            ).alias("key"),
            F.trim(
                F.when(
                    F.locate(":", F.substring_index(F.element_at(lines, i + 1), "#", 1))
                    > 0,
                    F.substring(
                        F.substring_index(F.element_at(lines, i + 1), "#", 1),
                        F.locate(
                            ":",
                            F.substring_index(F.element_at(lines, i + 1), "#", 1),
                        )
                        + 1,
                        F.lit(1 << 30),
                    ),
                ).otherwise(F.lit(""))
            ).alias("value"),
        ),
    )
    return F.filter(structs, lambda s: s.getField("value") != "")


_RULE_KEYS = ("disallow", "allow", "crawl-delay")


def _bound_rules(secs: Column, agent: str) -> Column:
    """Rule lines (Disallow / Allow / Crawl-delay) whose governing
    User-agent group names ``agent`` exactly or ``*`` —
    ``array<struct<key,value>>`` in file order.

    Single O(lines) ``F.aggregate`` fold carrying (current agent group,
    in-rules flag, bound rules) — the exact Column transcription of the
    python mirror's ``_iter_rules_py`` state machine: a rule line closes
    the agent block, the next user-agent line opens a new one, orphan
    rules (no user-agent above) never bind. The previous formulation
    re-scanned the agent/rule arrays per rule line (O(rules²·agents) per
    body); this one is one pass.
    """
    state0 = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(False).alias("in_rules"),
        F.array()
        .cast("array<struct<key:string,value:string>>")
        .alias("out"),
    )

    def step(st, s):
        key, value = s.getField("key"), s.getField("value")
        is_agent = key == F.lit("user-agent")
        is_rule = key.isin(*_RULE_KEYS)
        new_agents = (
            F.when(is_agent & st.getField("in_rules"), F.array(value))
            .when(is_agent, F.array_append(st.getField("agents"), value))
            .otherwise(st.getField("agents"))
        )
        binds = F.exists(
            st.getField("agents"),
            lambda a: (a == F.lit(agent)) | (a == F.lit("*")),
        )
        new_out = F.when(
            is_rule & binds,
            F.array_append(
                st.getField("out"),
                F.struct(key.alias("key"), value.alias("value")),
            ),
        ).otherwise(st.getField("out"))
        new_in = (
            F.when(is_agent & st.getField("in_rules"), F.lit(False))
            .when(is_rule, F.lit(True))
            .otherwise(st.getField("in_rules"))
        )
        return F.struct(
            new_agents.alias("agents"),
            new_in.alias("in_rules"),
            new_out.alias("out"),
        )

    return F.aggregate(secs, state0, step).getField("out")


def disallow_prefixes(body: Column, agent: str = "*") -> Column:
    """array<string> of Disallow path prefixes binding to ``agent``."""
    bound = _bound_rules(robots_sections(body), agent)
    return F.transform(
        F.filter(bound, lambda s: s.getField("key") == "disallow"),
        lambda d: d.getField("value"),
    )


def crawl_delay_ms(body: Column, agent: str = "*", default_ms: int = 1000) -> Column:
    """Crawl-delay (seconds in the file) → milliseconds. The first line
    whose governing User-agent group binds to ``agent`` wins (a
    googlebot-only Crawl-delay never applies to ``*``);
    ``default_ms`` when absent/non-numeric."""
    bound = _bound_rules(robots_sections(body), agent)
    delays = F.filter(bound, lambda s: s.getField("key") == "crawl-delay")
    ms = (F.element_at(delays, 1).getField("value").cast("double") * 1000).cast(
        "int"
    )
    return F.when(F.size(delays) > 0, F.coalesce(ms, F.lit(default_ms))).otherwise(
        F.lit(default_ms)
    )


#: one regex, three engines (java.util.regex ∩ RE2 ∩ python re — inline
#: (?im) flags, no lookaround): a Sitemap line's URL, comments stripped
SITEMAP_RE = r"(?im)^sitemap:[ \t]*([^ \t\r\n#]+)"


def sitemap_urls(body: Column) -> Column:
    """array<string> of Sitemap URLs declared in a robots.txt body.

    Per the sitemaps.org robots extension, ``Sitemap:`` lines are
    GROUP-INDEPENDENT — they bind regardless of any User-agent section —
    so extraction is one ``regexp_extract_all`` over the whole body (a
    codegen projection, unlike the stateful group fold the Disallow rules
    need). The URLs feed :func:`~newsfeeds_crawler_spark.operators.\
sitemap.expand_sitemaps` as its seed frame: robots fetch → sitemap
    discovery → index expansion → frontier, the standard crawl bootstrap
    the reference lacks entirely."""
    return F.regexp_extract_all(body, F.lit(SITEMAP_RE), 1)


# ---------------------------------------------------------------- python mirror


def _iter_rules_py(body: str):
    """(key, value, group_agents) for each rule line, group-accurate:
    any rule line (Disallow/Allow/Crawl-delay) closes the agent block."""
    group_agents: list[str] = []
    in_rules = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = line.split(":", 1)
        key, value = key.strip().lower(), value.strip()
        if not value:
            continue
        if key == "user-agent":
            if in_rules:
                group_agents = []
                in_rules = False
            group_agents.append(value)
        elif key in ("disallow", "allow", "crawl-delay"):
            in_rules = True
            yield key, value, list(group_agents)


def disallow_prefixes_py(body: str, agent: str = "*") -> list[str]:
    """Reference-grammar mirror (group-accurate) used by the oracle."""
    return [
        v
        for k, v, grp in _iter_rules_py(body)
        if k == "disallow" and any(a == agent or a == "*" for a in grp)
    ]


def crawl_delay_ms_py(body: str, agent: str = "*", default_ms: int = 1000) -> int:
    """First Crawl-delay whose group binds to ``agent``; group-accurate
    mirror of :func:`crawl_delay_ms`."""
    for k, v, grp in _iter_rules_py(body):
        if k == "crawl-delay" and any(a == agent or a == "*" for a in grp):
            try:
                return int(float(v) * 1000)
            except ValueError:
                return default_ms
    return default_ms


def sitemap_urls_py(body: str) -> list[str]:
    """Python mirror of :func:`sitemap_urls` (same regex, same order)."""
    import re

    return re.findall(SITEMAP_RE, body)
