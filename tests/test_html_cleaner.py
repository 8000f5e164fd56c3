"""M0 cleaner parity tests.

Ports the *semantics* of the reference's unit tests
(/root/reference/crates/ares-client/src/cleaner.rs:156-278,
link_discovery.rs:66-120) and pins the fixture corpus byte-for-byte via
tests/golden/*.md (the goldens are this rebuild's recorded dialect spec —
SURVEY.md §7 risk 1).
"""

from pathlib import Path

import pytest

from ares_spark.functions.urls import (
    canonicalize_url,
    domain_allowed,
    resolve_url,
    url_host,
    url_origin,
)
from ares_spark.html import clean_html, discover_links, extract_metadata, html_to_markdown

FIXTURES = Path("/root/reference/bench/fixtures")
GOLDEN = Path(__file__).parent / "golden"


# ---- cleaner.rs unit-test semantics -----------------------------------------


def test_basic_html_to_markdown():
    md = clean_html("<h1>Hello</h1><p>World</p>")
    assert "Hello" in md and "World" in md
    assert md == "# Hello\n\nWorld"


def test_strips_script_tags():
    md = clean_html("<p>Content</p><script>alert('xss')</script>")
    assert "Content" in md and "alert" not in md


def test_strips_style_tags():
    md = clean_html("<p>Visible</p><style>body { color: red; }</style>")
    assert "Visible" in md and "color" not in md


def test_strips_nav_and_footer():
    md = clean_html(
        "<nav><a href='/'>Home</a></nav><main><p>Article</p></main>"
        "<footer>Copyright 2025</footer>"
    )
    assert "Article" in md and "Copyright" not in md and "Home" not in md


def test_strips_noscript_iframe_svg():
    md = clean_html(
        "<p>Main</p><noscript>Enable JS</noscript>"
        "<iframe src='ad.html'>Ad</iframe><svg><circle r='10'/></svg>"
    )
    assert "Main" in md
    for bad in ("Enable JS", "Ad", "circle"):
        assert bad not in md


def test_preserves_content_elements():
    md = clean_html(
        "<article><h2>Title</h2></article><section><p>Section text</p></section>"
        "<div>Div content</div><table><tr><td>Cell</td></tr></table>"
    )
    for good in ("Title", "Section text", "Div content", "Cell"):
        assert good in md


def test_no_metadata_block_without_head():
    md = clean_html("<p>Body only</p>")
    assert "Page metadata" not in md
    assert md.startswith("Body only")


def test_prepends_head_metadata():
    html = (
        "<html><head>"
        "<title>My Post — Site</title>"
        '<link rel="canonical" href="https://ex.com/posts/my-post">'
        '<meta property="og:image" content="https://ex.com/img/hero.png">'
        '<meta name="author" content="Jane Doe">'
        '<meta property="article:published_time" content="2026-05-14">'
        '<meta name="description" content="A short summary.">'
        "</head><body><p>The article body.</p></body></html>"
    )
    md = clean_html(html)
    assert md == (
        "## Page metadata\n"
        "- URL: https://ex.com/posts/my-post\n"
        "- Title: My Post — Site\n"
        "- Author: Jane Doe\n"
        "- Published: 2026-05-14\n"
        "- Image: https://ex.com/img/hero.png\n"
        "- Description: A short summary.\n"
        "\n---\n\n"
        "The article body."
    )


def test_og_fallbacks_when_no_canonical():
    md = clean_html(
        "<html><head>"
        '<meta property="og:url" content="https://ex.com/p">'
        '<meta property="og:title" content="OG Title">'
        "</head><body><p>x</p></body></html>"
    )
    assert "URL: https://ex.com/p" in md
    assert "Title: OG Title" in md


def test_metadata_first_element_empty_attr_falls_to_next_source():
    # first_value (cleaner.rs:136-154): first *element* per source; if its
    # attr is empty, the next SOURCE is tried (not the next element)
    html = (
        "<head>"
        '<meta property="og:title" content="">'
        '<meta property="og:title" content="second og">'
        "<title>Doc Title</title></head><p>x</p>"
    )
    meta = dict(extract_metadata(html))
    assert meta["Title"] == "Doc Title"


def test_metadata_whitespace_collapse():
    html = "<head><title>  Multi \n  space\ttitle </title></head><p>x</p>"
    assert dict(extract_metadata(html))["Title"] == "Multi space title"


def test_content_cap_chars_not_bytes():
    # scrape.rs:166-177 truncates by chars().take(max)
    md = clean_html("<p>" + "é" * 100 + "</p>", max_content_chars=10)
    assert md == "é" * 10


# ---- markdown dialect --------------------------------------------------------


def test_ordered_list():
    md = html_to_markdown("<ol><li>one</li><li>two</li></ol>")
    assert md == "1. one\n2. two"


def test_ordered_list_start():
    md = html_to_markdown('<ol start="3"><li>a</li><li>b</li></ol>')
    assert md == "3. a\n4. b"


def test_inline_code_and_escape():
    md = html_to_markdown("<p>call <code>poll_ready</code> or poll_ready</p>")
    assert md == "call `poll_ready` or poll\\_ready"


def test_links_and_images():
    md = html_to_markdown('<p><a href="/x">go</a> <img src="/i.png" alt="pic"></p>')
    assert md == "[go](/x) ![pic](/i.png)"


def test_pre_fenced():
    md = html_to_markdown("<pre><code>let x = 1;\nx += 1;</code></pre>")
    assert md == "```\nlet x = 1;\nx += 1;\n```"


def test_blockquote():
    md = html_to_markdown("<blockquote><p>quoted</p></blockquote>")
    assert md == "> quoted"


def test_whitespace_collapse_across_inline():
    md = html_to_markdown("<p>a\n   <strong>b</strong>\n c</p>")
    assert md == "a **b** c"


def test_nested_list():
    md = html_to_markdown("<ul><li>a<ul><li>b</li></ul></li></ul>")
    assert md == "* a\n  * b"


# ---- fixture goldens (byte-identical invariant surface) ----------------------


@pytest.mark.parametrize(
    "name",
    [
        "blog",
        "github_repo",
        "news_article",
        "product",
        "public_tender",
        "recipe",
        "crawl/index",
        "crawl/post-backpressure",
        "crawl/post-ownership",
    ],
)
def test_fixture_golden(name):
    html = (FIXTURES / f"{name}.html").read_text()
    expected = (GOLDEN / f"{name}.md").read_text()
    assert clean_html(html) == expected


# ---- link_discovery.rs unit-test semantics -----------------------------------


def test_discover_links_basic():
    html = """
        <html><body>
        <a href="/page1">Page 1</a>
        <a href="https://example.com/page2">Page 2</a>
        <a href="mailto:test@example.com">Email</a>
        <a href="#fragment">Fragment</a>
        <a href="/page1?q=1">Page 1 with query</a>
        </body></html>
    """
    links = discover_links(html, "https://example.com")
    assert links == [
        "https://example.com/page1",
        "https://example.com/page1?q=1",
        "https://example.com/page2",
    ]


def test_discover_links_relative_base():
    assert discover_links('<a href="sub">Link</a>', "https://example.com/blog/") == [
        "https://example.com/blog/sub"
    ]


def test_discover_links_normalization():
    links = discover_links('<a href="/page#1">1</a><a href="/page#2">2</a>', "https://example.com")
    assert links == ["https://example.com/page"]


def test_discover_links_crawl_fixture():
    html = (FIXTURES / "crawl/index.html").read_text()
    assert discover_links(html, "https://blog.example.com/") == [
        "https://blog.example.com/post-backpressure.html",
        "https://blog.example.com/post-ownership.html",
    ]


def test_discover_links_sorted_dedup():
    html = '<a href="/b">1</a><a href="/a">2</a><a href="/b">3</a>'
    assert discover_links(html, "https://x.com") == ["https://x.com/a", "https://x.com/b"]


# ---- URL canonicalization ------------------------------------------------------


def test_canonicalize_basic():
    assert canonicalize_url("HTTPS://Example.COM:443/a/../b?q=1#frag") == "https://example.com/b?q=1"
    assert canonicalize_url("http://example.com") == "http://example.com/"
    assert canonicalize_url("http://example.com:8080/x") == "http://example.com:8080/x"


def test_canonicalize_rejects_non_http():
    assert canonicalize_url("mailto:a@b.c") is None
    assert canonicalize_url("ftp://example.com/f") is None
    assert canonicalize_url("javascript:alert(1)") is None
    assert canonicalize_url("") is None


def test_resolve_url():
    assert resolve_url("https://example.com/blog/", "sub") == "https://example.com/blog/sub"
    assert resolve_url("https://example.com/a/b", "../c") == "https://example.com/c"
    assert resolve_url("https://example.com", "#x") == "https://example.com/#x"


def test_url_host_origin():
    assert url_host("https://Sub.Example.com/x") == "sub.example.com"
    assert url_origin("https://example.com/x") == "https://example.com:443"
    assert url_origin("http://example.com:81/x") == "http://example.com:81"


def test_domain_allowed():
    # worker.rs:326-344 — exact or dot-suffix subdomain
    assert domain_allowed("example.com", ["example.com"])
    assert domain_allowed("sub.example.com", ["example.com"])
    assert not domain_allowed("notexample.com", ["example.com"])
    assert not domain_allowed("example.com.evil.com", ["example.com"])
    assert not domain_allowed("example.com", [])
    assert not domain_allowed(None, ["example.com"])


def test_links_single_pass_canon():
    """discover_links' one-pass join+canonicalize equals the two-pass
    resolve_url → canonicalize(keep_fragment=False) it replaced
    (canonicalize is idempotent on scheme/host/port/path/query and the
    fragment is parsed off the joined URL either way)."""
    from urllib.parse import urljoin

    from ares_spark.functions.urls import canonicalize_url, resolve_url

    cases = [
        ("https://example.com/a/b", "../c#frag"),
        ("https://example.com/a/b/", "./.././x.html?q=1#top"),
        ("https://Example.COM:443/a", "//other.org:80/p q/#f"),
        ("https://example.com/", "HTTP://UPPER.example.net:8080/Path/../X"),
        ("https://example.com/", "mailto:x@y.z"),
        ("https://example.com/", "javascript:void(0)"),
        ("https://example.com/", "ftp://files.example.com/a"),
        ("https://example.com/base/", "a%20b/c%2Fd.html"),
        ("https://example.com/base/", "?only=query"),
        ("https://example.com/base/", "#only-frag"),
        ("https://example.com/", "https://bücher.example/päth?ü=1#frág"),
        ("https://example.com/", "  /leading-space  "),
        ("https://example.com/", "http://example.com:80/x"),
        ("https://example.com/", "https://user:pw@h.example:9/x/./y"),
        ("https://example.com/", "/%7Euser/~user/"),
        ("https://example.com/", "../../../../up"),
        ("https://example.com/x", ""),
        ("https://example.com/x", "//[::1]:99999/bad-port"),
    ]
    for base, href in cases:
        try:
            joined = urljoin(base, href.strip())
        except ValueError:
            joined = None
        one = canonicalize_url(joined, keep_fragment=False) if joined else None
        resolved = resolve_url(base, href)
        two = (
            canonicalize_url(resolved, keep_fragment=False)
            if resolved is not None else None
        )
        assert one == two, (base, href, one, two)
