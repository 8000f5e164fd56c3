"""robots.txt parsing + matching (SURVEY.md A5), RFC 9309 semantics.

The reference delegates to Google's robotstxt matcher with allow-on-failure
(/root/reference/crates/ares-client/src/robots.rs:36-89). This module
implements the same decision procedure from the public spec:

- groups keyed by user-agent; most-specific agent match wins, ``*`` as
  fallback; multiple consecutive UA lines share one group
- rule match: longest-match wins between Allow and Disallow; tie → Allow
- ``*`` wildcard and ``$`` end-anchor in paths
- no robots.txt / unparseable → allow everything

Dataflow shape (Spark-side): robots texts live in a per-host dimension
table; the engine parses each host's text ONCE on the driver (hosts per
batch ≪ rows), broadcasts compiled matchers, and filters candidate links
with a vectorized pandas UDF — the Spark analog of the reference's
per-origin cache. Crawl-delay is parsed too and feeds the per-host
politeness budget (our scheduler consumes it; the reference's matcher
ignores it).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit


@dataclass
class RuleGroup:
    agents: list[str] = field(default_factory=list)
    # (is_allow, pattern) in file order
    rules: list[tuple[bool, str]] = field(default_factory=list)
    crawl_delay: float | None = None


class RobotsMatcher:
    def __init__(self, groups: list[RuleGroup]):
        self.groups = groups

    @classmethod
    def parse(cls, content: str | None) -> "RobotsMatcher":
        groups: list[RuleGroup] = []
        cur: RuleGroup | None = None
        last_was_agent = False
        for raw in (content or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not last_was_agent or cur is None:
                    cur = RuleGroup()
                    groups.append(cur)
                cur.agents.append(value.lower())
                last_was_agent = True
                continue
            last_was_agent = False
            if cur is None:
                continue  # rules before any user-agent line: ignored
            if key == "disallow":
                cur.rules.append((False, value))
            elif key == "allow":
                cur.rules.append((True, value))
            elif key == "crawl-delay":
                try:
                    cur.crawl_delay = float(value)
                except ValueError:
                    pass
        return cls(groups)

    def _group_for(self, user_agent: str) -> RuleGroup | None:
        ua = user_agent.lower()
        best: RuleGroup | None = None
        best_len = -1
        star: RuleGroup | None = None
        for g in self.groups:
            for agent in g.agents:
                if agent == "*":
                    if star is None:
                        star = g
                elif agent and agent in ua and len(agent) > best_len:
                    best, best_len = g, len(agent)
        return best if best is not None else star

    def crawl_delay(self, user_agent: str = "ares") -> float | None:
        g = self._group_for(user_agent)
        return g.crawl_delay if g else None

    def is_allowed(self, url: str, user_agent: str = "ares") -> bool:
        g = self._group_for(user_agent)
        if g is None:
            return True
        try:
            parts = urlsplit(url)
        except ValueError:
            return True
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        verdict = True  # no matching rule → allow
        best_len = -1
        for is_allow, pattern in g.rules:
            if not pattern:
                # "Disallow:" (empty) matches nothing
                continue
            if _pattern_matches(pattern, path):
                plen = len(pattern)
                if plen > best_len or (plen == best_len and is_allow and not verdict):
                    verdict = is_allow
                    best_len = plen
        return verdict


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 path match: prefix with '*' wildcards and '$' end anchor."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    regex = "".join(".*" if c == "*" else re.escape(c) for c in pattern)
    regex = "^" + regex + ("$" if anchored else "")
    try:
        return re.match(regex, path) is not None
    except re.error:
        return False


def compile_robots(rows: list[tuple[str, str | None]]) -> dict[str, RobotsMatcher]:
    """(host, robots_txt) rows → host → matcher. Hosts with None/missing
    content get no entry (callers treat missing as allow-all)."""
    out = {}
    for host, content in rows:
        if content is not None:
            out[host] = RobotsMatcher.parse(content)
    return out
