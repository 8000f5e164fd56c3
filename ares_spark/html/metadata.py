"""``<head>`` metadata harvest — exact semantics of the reference.

Replicates ``extract_metadata``/``first_value``
(/root/reference/crates/ares-client/src/cleaner.rs:75-154): fixed field
order (URL, Title, Author, Published, Image, Description); per field an
ordered list of (selector, attribute) sources; for each source, the FIRST
matching element in document order is inspected — if its attribute is
missing/empty (after whitespace collapse) the NEXT source is tried, not the
next element. ``__text__`` takes the element's concatenated text.
"""

from __future__ import annotations

import re

from ares_spark.html.dom import Node, parse_html

# label -> ordered (tag, attr-match-dict, value-attr) sources;
# value-attr "__text__" = element text. Mirrors cleaner.rs:81-125.
METADATA_FIELDS = [
    (
        "URL",
        [
            ("link", {"rel": "canonical"}, "href"),
            ("meta", {"property": "og:url"}, "content"),
        ],
    ),
    (
        "Title",
        [
            ("meta", {"property": "og:title"}, "content"),
            ("title", {}, "__text__"),
        ],
    ),
    (
        "Author",
        [
            ("meta", {"name": "author"}, "content"),
            ("meta", {"property": "article:author"}, "content"),
        ],
    ),
    (
        "Published",
        [
            ("meta", {"property": "article:published_time"}, "content"),
            ("meta", {"name": "date"}, "content"),
            ("meta", {"name": "publish_date"}, "content"),
        ],
    ),
    (
        "Image",
        [
            ("meta", {"property": "og:image"}, "content"),
            ("meta", {"name": "twitter:image"}, "content"),
        ],
    ),
    (
        "Description",
        [
            ("meta", {"name": "description"}, "content"),
            ("meta", {"property": "og:description"}, "content"),
        ],
    ),
]

_WS = re.compile(r"\s+")


def _collapse(value: str) -> str:
    # cleaner.rs:147 — split_whitespace().join(" ")
    return " ".join(value.split())


def _first_match(root: Node, tag: str, attr_filter: dict) -> Node | None:
    for node in root.iter():
        if node.tag != tag:
            continue
        ok = True
        for k, v in attr_filter.items():
            if node.attr(k) != v:
                ok = False
                break
        if ok:
            return node
    return None


def _first_value(root: Node, sources) -> str | None:
    # cleaner.rs:136-154: first element per source; empty value → next source
    for tag, attr_filter, value_attr in sources:
        el = _first_match(root, tag, attr_filter)
        if el is None:
            continue
        raw = el.text_content() if value_attr == "__text__" else (el.attr(value_attr) or "")
        trimmed = _collapse(raw)
        if trimmed:
            return trimmed
    return None


def extract_metadata(html: str | Node) -> list[tuple[str, str]]:
    """Return present (label, value) pairs in the fixed reference order."""
    root = parse_html(html) if isinstance(html, str) else html
    out = []
    for label, sources in METADATA_FIELDS:
        value = _first_value(root, sources)
        if value is not None:
            out.append((label, value))
    return out
