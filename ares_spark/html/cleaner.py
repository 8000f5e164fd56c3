"""Full cleaner: Markdown body + prepended "Page metadata" block.

Replicates ``HtmdCleaner::clean``
(/root/reference/crates/ares-client/src/cleaner.rs:51-70):

    ## Page metadata
    - {label}: {value}        # one line per present field, fixed order
    ...

    ---

    {markdown body}

If no metadata fields are present the body is returned unchanged. The
optional character cap replicates the post-clean truncation at
/root/reference/crates/ares-core/src/scrape.rs:95-105,166-177 — applied to
the WHOLE cleaned string (metadata block survives because it's prepended),
counted in characters (Rust ``chars().take(max)``), not bytes.
"""

from __future__ import annotations

from ares_spark.html.dom import parse_html
from ares_spark.html.links import discover_links
from ares_spark.html.markdown import _DEFAULT_RENDERER
from ares_spark.html.metadata import extract_metadata


def clean_html(html: str, max_content_chars: int | None = None) -> str:
    root = parse_html(html)
    metadata = extract_metadata(root)
    body = _DEFAULT_RENDERER.render_tree(root)  # mutates root; metadata first
    return _assemble(metadata, body, max_content_chars)


def process_html(
    html: str, base_url: str, max_content_chars: int | None = None
) -> tuple[str, list[str]]:
    """Parse ONCE, produce (cleaned_text, discovered_links).

    The columnar analog of the reference's zero-copy ``Arc<str>`` HTML
    hand-off between scrape and link discovery
    (/root/reference/crates/ares-core/src/models.rs:162-163): a single DOM
    parse feeds metadata harvest, link discovery, and Markdown rendering,
    so the fetch-extract-spider micro-batch reads each ``html`` cell once.
    """
    root = parse_html(html)
    metadata = extract_metadata(root)
    links = discover_links(root, base_url)
    body = _DEFAULT_RENDERER.render_tree(root)  # mutates root; must be last
    return _assemble(metadata, body, max_content_chars), links


def _assemble(metadata, body: str, max_content_chars: int | None) -> str:
    if metadata:
        lines = ["## Page metadata\n"]
        for label, value in metadata:
            lines.append(f"- {label}: {value}\n")
        lines.append("\n---\n\n")
        lines.append(body)
        out = "".join(lines)
    else:
        out = body
    if max_content_chars is not None and len(out) > max_content_chars:
        out = out[:max_content_chars]
    return out
