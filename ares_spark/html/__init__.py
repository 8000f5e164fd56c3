"""Pure-Python HTML processing: DOM parse, Markdown conversion, metadata
harvest, link discovery.

These are deliberately dependency-free (stdlib ``html.parser``) so they can
ship inside pandas UDFs via ``spark-submit --py-files`` with no cluster-side
installs. They replicate the *behavior* of the reference's cleaner/link
stack (htmd + scraper + url crates) on the fixture corpus — see
/root/reference/crates/ares-client/src/{cleaner.rs,link_discovery.rs}.
"""

from ares_spark.html.markdown import html_to_markdown
from ares_spark.html.metadata import extract_metadata
from ares_spark.html.cleaner import clean_html, process_html
from ares_spark.html.links import discover_links

__all__ = [
    "html_to_markdown",
    "extract_metadata",
    "clean_html",
    "process_html",
    "discover_links",
]
