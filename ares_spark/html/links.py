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

from urllib.parse import urljoin

from ares_spark.functions.urls import canonicalize_url
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
        # join + canonicalize in ONE pass (canonicalize is idempotent on
        # scheme/host/port/path/query, and the fragment is parsed off the
        # joined URL either way, so this equals the old
        # resolve_url → canonicalize(keep_fragment=False) two-pass —
        # equality property-checked in test_links_single_pass_canon — at
        # half the per-link URL-normalization cost, ~10% of process_html)
        try:
            joined = urljoin(base_url, href.strip())
        except ValueError:
            continue
        normalized = canonicalize_url(joined, keep_fragment=False)
        if normalized is None or normalized == base_norm:
            continue  # non-http(s) scheme, unparseable, or self-link
        links.append(normalized)
    # link_discovery.rs:59-60 — sort + dedup (ordering is load-bearing)
    return sorted(set(links))
