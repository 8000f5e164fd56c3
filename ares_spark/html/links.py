"""Link discovery — semantics of the reference's HtmlLinkDiscoverer
(/root/reference/crates/ares-client/src/link_discovery.rs:18-63):

- select every ``a[href]`` in document order
- resolve relative hrefs against the base URL (RFC 3986 join)
- keep only http/https
- strip fragments
- drop links equal to the (fragment-stripped) base URL
- sort lexicographically + dedup  — this ordering defines crawl order
  parity downstream (SURVEY.md §7 risk 2)
"""

from __future__ import annotations

from ares_spark.functions.urls import canonicalize_url, resolve_url
from ares_spark.html.dom import Node, parse_html


def discover_links(html: str | Node, base_url: str) -> list[str]:
    root = parse_html(html) if isinstance(html, str) else html
    base_norm = canonicalize_url(base_url, keep_fragment=False)
    if base_norm is None:
        return []
    links: list[str] = []
    for node in root.iter():
        if node.tag != "a":
            continue
        href = node.attr("href")
        if href is None:
            continue
        resolved = resolve_url(base_url, href)
        if resolved is None:
            continue  # non-http(s) scheme or unparseable
        normalized = canonicalize_url(resolved, keep_fragment=False)
        if normalized is None or normalized == base_norm:
            continue
        links.append(normalized)
    # link_discovery.rs:59-60 — sort + dedup (ordering is load-bearing)
    return sorted(set(links))
