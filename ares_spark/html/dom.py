"""Minimal DOM built on stdlib ``html.parser``.

Serves the same role the ``scraper`` crate serves in the reference
(/root/reference/crates/ares-client/src/cleaner.rs:75-133,
link_discovery.rs:19-33): parse once, walk/select elements. Tolerant of
real-web malformed HTML: void elements, implicit auto-closing (``<li>``,
``<p>``, table cells), stray end tags.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tag -> set of open tags it implicitly closes (HTML5 optional end tags)
_AUTO_CLOSE = {
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "p": {"p"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "thead": {"tr", "td", "th"},
    "tbody": {"thead", "tr", "td", "th"},
}

# raw-text elements: children are opaque text (never parsed as markup)
_RAWTEXT = {"script", "style"}


class Node:
    """Element or text node. Text nodes have tag == '#text'."""

    __slots__ = ("tag", "attrs", "children", "text", "parent")

    def __init__(self, tag, attrs=None, text=""):
        self.tag = tag
        self.attrs = attrs or {}
        self.children = []
        self.text = text
        self.parent = None

    def append(self, node: "Node") -> None:
        node.parent = self
        self.children.append(node)

    @property
    def is_text(self) -> bool:
        return self.tag == "#text"

    def attr(self, name: str):
        return self.attrs.get(name)

    def iter(self):
        """Depth-first pre-order walk (document order). Explicit stack of
        LIVE children-list iterators — one next() per node instead of one
        suspended generator frame per ancestor per node (the nested
        ``yield from`` version was ~10% of process_html on real pages),
        while keeping the recursive version's exact semantics under
        mid-walk tree mutation (consumers prune subtrees while walking)."""
        yield self
        stack = [iter(self.children)]
        while stack:
            for node in stack[-1]:
                yield node
                stack.append(iter(node.children))
                break
            else:
                stack.pop()

    def find_all(self, tag: str):
        return [n for n in self.iter() if n.tag == tag]

    def text_content(self) -> str:
        """Concatenated descendant text (scraper's ``el.text().collect()``)."""
        return "".join(n.text for n in self.iter() if n.is_text)


# beyond this element depth the tree is flattened (children attach at the
# cap) so recursive walks stay bounded on adversarial real-web nesting;
# browsers apply similar caps (~512)
MAX_TREE_DEPTH = 256


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def _top(self) -> Node:
        return self.stack[-1]

    def handle_starttag(self, tag, attrs):
        closes = _AUTO_CLOSE.get(tag)
        if closes:
            while len(self.stack) > 1 and self._top().tag in closes:
                self.stack.pop()
        node = Node(tag, dict(attrs))
        self._top().append(node)
        if tag not in VOID_ELEMENTS and len(self.stack) < MAX_TREE_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._top().append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        # pop to the matching open tag if present; else ignore the stray end
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._top().append(Node("#text", text=data))

    def handle_entityref(self, name):  # pragma: no cover (convert_charrefs)
        self._top().append(Node("#text", text=f"&{name};"))


def parse_html(html: str) -> Node:
    """Parse an HTML document/fragment into a Node tree rooted at #document."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # real-web HTML can break the stdlib parser mid-stream; keep the
        # partial tree rather than failing the whole Arrow batch
        pass
    return builder.root
