"""HTML → Markdown converter replicating the reference cleaner's dialect.

The reference converts with the ``htmd`` crate configured to skip
``script style nav footer header aside noscript iframe svg``
(/root/reference/crates/ares-client/src/cleaner.rs:33-37). htmd is a
turndown-family converter: ATX headings, ``*`` bullets, inlined links,
whitespace-collapsed text, escaped Markdown metacharacters, and the whole
output trimmed. This module is a from-scratch Python implementation of that
dialect (NOT a port of htmd's Rust — public turndown/htmd semantics only).

Dialect notes (the golden files under tests/golden/ are the spec):
- headings: ``# `` .. ``###### `` (ATX)
- unordered lists: ``* item`` (single space); ordered: ``1. item``
- links inlined ``[text](href)``, images ``![alt](src)``
- inline code backtick-fenced, ``pre`` → fenced code block
- text nodes whitespace-collapsed (HTML rendering rules), markdown
  metacharacters escaped (turndown escape table)
- blocks joined by exactly one blank line; final output trimmed
"""

from __future__ import annotations

import re

from ares_spark.html.dom import Node, parse_html

DEFAULT_SKIP_TAGS = frozenset(
    # cleaner.rs:33-37
    ["script", "style", "nav", "footer", "header", "aside", "noscript", "iframe", "svg"]
)

# turndown's isBlock element list (public turndown source, utilities.js)
BLOCK_ELEMENTS = frozenset(
    """address article aside audio blockquote body canvas center dd dir div dl
    dt fieldset figcaption figure footer form frameset h1 h2 h3 h4 h5 h6 head
    header hgroup hr html isindex li main menu nav noframes noscript ol output
    p pre section table tbody td tfoot th thead tr ul""".split()
)

_HEADING = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# turndown escapes (commonmark-dialect metachar escaping); ^ anchors the
# (already whitespace-collapsed) text-node start
_ESCAPES = [
    (re.compile(r"\\"), r"\\\\"),
    (re.compile(r"\*"), r"\\*"),
    (re.compile(r"^-"), r"\\-"),
    (re.compile(r"^\+ "), r"\\+ "),
    (re.compile(r"^(=+)"), r"\\\1"),
    (re.compile(r"^(#{1,6}) "), r"\\\1 "),
    (re.compile(r"`"), r"\\`"),
    (re.compile(r"^~~~"), r"\\~~~"),
    (re.compile(r"\["), r"\\["),
    (re.compile(r"\]"), r"\\]"),
    (re.compile(r"^>"), r"\\>"),
    (re.compile(r"_"), r"\\_"),
    (re.compile(r"^(\d+)\. "), r"\1\\. "),
]

_WS_RUN = re.compile(r"[ \t\r\n]+")

# one-scan gate for _escape_text: a sub can fire only if the text contains
# one of the unanchored metachars anywhere, or starts with an anchored one —
# most text nodes contain neither and skip all 13 regex passes
_ESCAPE_TRIGGER = re.compile(r"[\\*`\[\]_]|^[-+=#>~0-9]")

# non-block void elements: whitespace after them is significant (collapse
# keeps the following text node's leading space)
_VOID_INLINE = frozenset(["img", "input", "wbr", "embed", "area", "col", "source", "track"])


def _escape_text(text: str) -> str:
    if not _ESCAPE_TRIGGER.search(text):
        return text
    for pat, repl in _ESCAPES:
        text = pat.sub(repl, text)
    return text


def _is_block(node: Node) -> bool:
    return node.tag in BLOCK_ELEMENTS


def _collapse_whitespace(root: Node) -> None:
    """In-place HTML whitespace collapse (collapse-whitespace algorithm as
    used by turndown/htmd): runs of whitespace → single space; spaces
    swallowed at block boundaries; ``pre`` subtrees untouched."""
    prev_text: Node | None = None
    keep_leading = False

    def walk(node: Node):
        nonlocal prev_text, keep_leading
        for child in list(node.children):
            if child.is_text:
                text = _WS_RUN.sub(" ", child.text)
                if (
                    (prev_text is None or prev_text.text.endswith(" "))
                    and not keep_leading
                    and text.startswith(" ")
                ):
                    text = text[1:]
                if not text:
                    node.children.remove(child)
                    continue
                child.text = text
                prev_text = child
            else:
                if _is_block(child) or child.tag == "br":
                    if prev_text is not None:
                        prev_text.text = re.sub(r" $", "", prev_text.text)
                    prev_text = None
                    keep_leading = False
                elif child.tag == "pre" or child.tag in _VOID_INLINE:
                    prev_text = None
                    keep_leading = True
                elif prev_text is not None:
                    keep_leading = False
                if child.tag != "pre":
                    walk(child)

        return

    walk(root)
    if prev_text is not None:
        prev_text.text = re.sub(r" $", "", prev_text.text)


class MarkdownRenderer:
    def __init__(self, skip_tags=DEFAULT_SKIP_TAGS):
        self.skip_tags = frozenset(skip_tags) | {"head", "title", "meta", "link", "base"}

    # -- entry ---------------------------------------------------------------

    def render(self, html: str) -> str:
        return self.render_tree(parse_html(html))

    def render_tree(self, root: Node) -> str:
        """Render a pre-parsed tree. NOTE: collapses whitespace in-place —
        harvest attributes (metadata, links) BEFORE calling this."""
        _collapse_whitespace(root)
        out = self._render_children(root)
        out = re.sub(r"\n{3,}", "\n\n", out)
        return out.strip("\n ").strip()

    # -- tree walk -----------------------------------------------------------

    def _render_children(self, node: Node) -> str:
        parts = []
        for child in node.children:
            parts.append(self._render_node(child))
        return self._join(parts)

    @staticmethod
    def _join(parts) -> str:
        """Concatenate already-newline-decorated fragments, merging the
        newline seams (max wins) the way turndown's join does."""
        out = ""
        for p in parts:
            if not p:
                continue
            if out:
                trail = len(out) - len(out.rstrip("\n"))
                lead = len(p) - len(p.lstrip("\n"))
                sep = "\n" * min(max(trail, lead), 2)
                out = out.rstrip("\n") + sep + p.lstrip("\n")
            else:
                out = p
        return out

    def _render_node(self, node: Node) -> str:
        if node.is_text:
            return _escape_text(node.text)
        tag = node.tag
        if tag in self.skip_tags:
            return ""
        if tag in _HEADING:
            content = self._render_children(node).strip("\n")
            if not content:
                return ""
            return "\n\n" + "#" * _HEADING[tag] + " " + content + "\n\n"
        if tag == "p":
            content = self._render_children(node).strip("\n")
            return f"\n\n{content}\n\n" if content else ""
        if tag == "br":
            return "  \n"
        if tag == "hr":
            return "\n\n* * *\n\n"
        if tag in ("ul", "ol"):
            return self._render_list(node)
        if tag == "li":  # li outside a list: render as block
            content = self._render_children(node).strip("\n")
            return f"\n\n{content}\n\n" if content else ""
        if tag == "a":
            return self._render_link(node)
        if tag == "img":
            alt = (node.attr("alt") or "").strip()
            src = (node.attr("src") or "").strip()
            title = node.attr("title")
            t = f' "{title}"' if title else ""
            return f"![{alt}]({src}{t})" if src else ""
        if tag in ("strong", "b"):
            content = self._render_children(node)
            return f"**{content}**" if content.strip() else content
        if tag in ("em", "i"):
            content = self._render_children(node)
            return f"*{content}*" if content.strip() else content
        if tag in ("del", "s", "strike"):
            content = self._render_children(node)
            return f"~~{content}~~" if content.strip() else content
        if tag == "code":
            return self._render_inline_code(node)
        if tag == "pre":
            return self._render_pre(node)
        if tag == "blockquote":
            content = self._render_children(node).strip("\n")
            quoted = "\n".join("> " + line for line in content.split("\n"))
            return f"\n\n{quoted}\n\n"
        if tag == "table":
            return self._render_table(node)
        if tag in BLOCK_ELEMENTS or tag == "#document":
            content = self._render_children(node)
            return f"\n\n{content.strip(chr(10))}\n\n" if content.strip() else ""
        # unknown inline element (span, time, custom elements): pass through
        return self._render_children(node)

    # -- specific rules --------------------------------------------------------

    def _render_link(self, node: Node) -> str:
        content = self._render_children(node)
        href = (node.attr("href") or "").strip()
        title = node.attr("title")
        t = f' "{title}"' if title else ""
        if not content.strip():
            return ""
        return f"[{content}]({href}{t})"

    def _render_inline_code(self, node: Node) -> str:
        content = node.text_content()
        if not content:
            return ""
        # extend the backtick fence past any run of backticks in the content
        longest = max((len(m.group(0)) for m in re.finditer(r"`+", content)), default=0)
        fence = "`" * (longest + 1)
        pad = " " if longest else ""
        return f"{fence}{pad}{content}{pad}{fence}"

    def _render_pre(self, node: Node) -> str:
        code = node.text_content()
        lang = ""
        code_children = [c for c in node.children if c.tag == "code"]
        if code_children:
            cls = code_children[0].attr("class") or ""
            m = re.search(r"language-(\S+)", cls)
            if m:
                lang = m.group(1)
        code = code.strip("\n")
        return f"\n\n```{lang}\n{code}\n```\n\n"

    def _render_list(self, node: Node) -> str:
        items = []
        index = 0
        start = 1
        if node.tag == "ol":
            try:
                start = int(node.attr("start") or 1)
            except (TypeError, ValueError):
                start = 1
        for child in node.children:
            if child.tag != "li":
                continue
            content = self._render_children(child)
            content = re.sub(r"^\n+", "", content)
            content = re.sub(r"\n+$", "", content)
            marker = f"{start + index}." if node.tag == "ol" else "*"
            indent = " " * (len(marker) + 1)
            content = content.replace("\n", "\n" + indent)
            items.append(f"{marker} {content}")
            index += 1
        if not items:
            return ""
        body = "\n".join(items)
        # nested list: tuck under the parent item without a blank line; the
        # parent li's continuation-indent handles the visual nesting
        if node.parent is not None and node.parent.tag == "li":
            return "\n" + body
        return f"\n\n{body}\n\n"

    def _render_table(self, node: Node) -> str:
        rows = []
        for tr in (n for n in node.iter() if n.tag == "tr"):
            cells = [
                self._render_children(c).strip().replace("\n", " ")
                for c in tr.children
                if c.tag in ("td", "th")
            ]
            if cells:
                rows.append(cells)
        if not rows:
            return ""
        width = max(len(r) for r in rows)
        lines = []
        for i, row in enumerate(rows):
            row = row + [""] * (width - len(row))
            lines.append("| " + " | ".join(row) + " |")
            if i == 0:
                lines.append("| " + " | ".join("---" for _ in range(width)) + " |")
        return "\n\n" + "\n".join(lines) + "\n\n"


_DEFAULT_RENDERER = MarkdownRenderer()


def html_to_markdown(html: str, skip_tags=None) -> str:
    """Convert HTML to Markdown in the reference cleaner's dialect.

    Mirrors ``HtmdCleaner::clean``'s conversion step
    (/root/reference/crates/ares-client/src/cleaner.rs:51-56) without the
    metadata preamble — see :func:`ares_spark.html.cleaner.clean_html` for
    the full cleaner.
    """
    renderer = _DEFAULT_RENDERER if skip_tags is None else MarkdownRenderer(skip_tags)
    return renderer.render(html)
