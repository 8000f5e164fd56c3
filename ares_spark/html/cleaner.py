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

from ares_spark.html.markdown import html_to_markdown
from ares_spark.html.metadata import extract_metadata


def clean_html(html: str, max_content_chars: int | None = None) -> str:
    body = html_to_markdown(html)
    metadata = extract_metadata(html)
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
