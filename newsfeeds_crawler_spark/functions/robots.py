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


def disallow_prefixes(body: Column, agent: str = "*") -> Column:
    """array<string> of Disallow path prefixes binding to ``agent``.

    A Disallow line binds iff the nearest preceding User-agent group names
    ``agent`` exactly or ``*``. Expressed as: for each disallow line, the
    last user-agent line above it with a smaller line_no decides.
    """
    secs = robots_sections(body)
    agents = F.filter(secs, lambda s: s.getField("key") == "user-agent")
    disallows = F.filter(secs, lambda s: s.getField("key") == "disallow")

    def binds(d):
        # the governing group = user-agent lines in the contiguous agent
        # block right above this disallow (standard grammar: a group's
        # agent lines all precede its rules); we approximate with "any
        # agent line above d whose group extends to d" — i.e. the nearest
        # agent line above, plus its adjacent agent lines.
        above = F.filter(
            agents, lambda a: a.getField("line_no") < d.getField("line_no")
        )
        nearest = F.element_at(above, -1)
        # orphan rules (no user-agent line above) are ignored, per the
        # de-facto grammar — same as the python mirror
        return F.when(F.size(above) == 0, F.lit(False)).otherwise(
            F.exists(
                above,
                lambda a: (
                    (a.getField("value") == agent) | (a.getField("value") == "*")
                )
                # a belongs to d's group iff no Disallow line separates a
                # from the group's last agent line (else a closed an
                # earlier group)
                & ~F.exists(
                    disallows,
                    lambda d2: (d2.getField("line_no") > a.getField("line_no"))
                    & (d2.getField("line_no") < nearest.getField("line_no")),
                ),
            )
        )

    return F.transform(
        F.filter(disallows, binds), lambda d: d.getField("value")
    )


def crawl_delay_ms(body: Column, agent: str = "*", default_ms: int = 1000) -> Column:
    """Crawl-delay (seconds in the file) → milliseconds; first binding line
    wins; ``default_ms`` when absent/non-numeric."""
    secs = robots_sections(body)
    delays = F.filter(secs, lambda s: s.getField("key") == "crawl-delay")
    ms = (F.element_at(delays, 1).getField("value").cast("double") * 1000).cast(
        "int"
    )
    return F.when(F.size(delays) > 0, F.coalesce(ms, F.lit(default_ms))).otherwise(
        F.lit(default_ms)
    )


# ---------------------------------------------------------------- python mirror


def disallow_prefixes_py(body: str, agent: str = "*") -> list[str]:
    """Reference-grammar mirror (group-accurate) used by the oracle."""
    group_agents: list[str] = []
    in_rules = False
    out: list[str] = []
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
        elif key == "disallow":
            in_rules = True
            if any(a == agent or a == "*" for a in group_agents):
                out.append(value)
    return out


def crawl_delay_ms_py(body: str, agent: str = "*", default_ms: int = 1000) -> int:
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, value = line.split(":", 1)
        if key.strip().lower() == "crawl-delay" and value.strip():
            try:
                return int(float(value.strip()) * 1000)
            except ValueError:
                return default_ms
    return default_ms
