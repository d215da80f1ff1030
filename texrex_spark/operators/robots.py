"""robots.txt parsing and gating.

Parser parity with TTrHostAccessInfo.Update
(/root/reference/src/units/trpoliteness.pas:164-285):

- directive regex ``^ *(User-agent|Allow|Disallow|Crawl-delay|Sitemap) *: *(...) *$``
  case-insensitive (:144)
- '#' comments stripped first (:217-222)
- user-agent section selection: exact match wins immediately; otherwise the
  LAST prefix match; '*' only if nothing better was seen before it (:224-250)
- within the chosen section, only Disallow and Crawl-delay are read, up to
  the next User-agent line (:259-284); unparsable crawl-delay -> -1
- no relevant section -> behave as if there were no robots.txt (:253-257)

Gate parity with SecondsUntilRetrieval (:333-349): a URL is forbidden iff
any recorded disallow prefix is a string prefix of its path.  An *empty*
Disallow line is an empty-string prefix, which matches every path — the
reference really does lock out the whole host in that case, and so do we.

Spark side: parsed rules live in a ``robots(host, has_robots,
disallow_prefixes array<string>, crawl_delay int)`` DataFrame, broadcast-
joined onto the frontier; the prefix test is a JVM-side ``exists()`` lambda,
no Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DIRECTIVE = re.compile(
    r"^ *(User-agent|Allow|Disallow|Crawl-delay|Sitemap) *: *(|[^ ]|[^ ].*[^ ]) *$",
    re.IGNORECASE,
)


@dataclass
class RobotsRules:
    host: str
    has_robots: bool = False
    disallow_prefixes: list[str] = field(default_factory=list)
    crawl_delay: int = -1


def parse_robots(host: str, body: str | None, user_agent_prefix: str) -> RobotsRules:
    """Parse one robots.txt body into effective rules for our UA."""
    rules = RobotsRules(host=host)
    if body is None:
        return rules
    rules.has_robots = True
    lines = [ln for ln in re.split(r"[\n\r]+", body)]
    lines = [ln.split("#", 1)[0] if "#" in ln else ln for ln in lines]

    section = -1
    for i, ln in enumerate(lines):
        if not ln:
            continue
        m = _DIRECTIVE.match(ln)
        if not m or m.group(1).lower() != "user-agent":
            continue
        content = m.group(2)
        if content == user_agent_prefix:
            section = i
            break
        elif content.lower().startswith(user_agent_prefix.lower()):
            section = i
        elif content == "*" and section == -1:
            section = i

    if section == -1:
        rules.has_robots = False
        return rules

    for ln in lines[section + 1 :]:
        m = _DIRECTIVE.match(ln)
        if not m:
            continue
        name = m.group(1).lower()
        if name == "user-agent":
            break
        if name == "disallow":
            rules.disallow_prefixes.append(m.group(2))
        elif name == "crawl-delay":
            try:
                rules.crawl_delay = int(m.group(2))
            except ValueError:
                rules.crawl_delay = -1
    return rules


def path_allowed(rules: RobotsRules, path: str) -> bool:
    """trpoliteness.pas:338-344 — plain string-prefix disallow test."""
    if not rules.has_robots:
        return True
    return not any(path.startswith(p) for p in rules.disallow_prefixes)


def allowed_col(path: Column, disallow_prefixes: Column, has_robots: Column) -> Column:
    """JVM-side gate: NOT exists(prefixes, p -> startswith(path, p))."""
    blocked = F.exists(disallow_prefixes, lambda p: path.startswith(p))
    return F.when(has_robots.isNull() | ~has_robots, F.lit(True)).otherwise(~blocked)


def gate_frontier(
    frontier: DataFrame, robots: DataFrame, broadcast_hint: bool = True
) -> DataFrame:
    """Broadcast-join robots rules onto a frontier and filter forbidden URLs.

    frontier must carry ``host`` and ``path`` columns; robots is the small
    per-host rule table (hosts numbering ~10^7 at 10^10-URL scale still fit
    a broadcast at ~a few GB; beyond that pass ``broadcast_hint=False`` to
    drop the hint and let AQE pick a shuffled hash join — the frontier
    scheduler wires it from ``FrontierConfig.robots_broadcast``).
    """
    rules = robots.select("host", "has_robots", "disallow_prefixes")
    if broadcast_hint:
        rules = F.broadcast(rules)
    joined = frontier.join(rules, "host", "left")
    return joined.where(
        allowed_col(F.col("path"), F.col("disallow_prefixes"), F.col("has_robots"))
    ).drop("has_robots", "disallow_prefixes")
