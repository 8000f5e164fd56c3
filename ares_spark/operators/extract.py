"""Schema-driven structured extraction (SURVEY.md A8), deterministic.

The reference's extraction stage is a pluggable LLM call
(/root/reference/crates/ares-client/src/llm.rs:137-243, anthropic.rs,
candle.rs). In this rebuild the stage is an *interface*: any callable
``(cleaned_text, schema) -> dict`` slots into the pipeline. The default
implementation below is deterministic and network-free — it harvests
values from the cleaned Markdown (the "Page metadata" preamble, headings,
labeled key-value lines, link lists, number-near-keyword patterns), so the
whole engine is reproducible and testable at scale. Fields it cannot
ground are omitted; schema validation then gates persistence exactly like
the reference (scrape.rs:222-232, 576-594).

Canonical JSON for hashing: compact separators, sorted keys, UTF-8 —
``data_hash = sha256(canonical_json)`` mirrors scrape.rs:235.
"""

from __future__ import annotations

import json
import re

_META_LINE = re.compile(r"^- (URL|Title|Author|Published|Image|Description): (.*)$")
_KV_LINE = re.compile(r"^(?:\* )?([A-Za-z][A-Za-z0-9 _/-]{0,40}?):\s+(.+)$")
# link text may contain escaped metachars (the cleaner escapes [ ] * etc.)
_LINK = re.compile(r"\[((?:\\.|[^\]\\])*)\]\(([^)]*)\)")
_MD_ESCAPE = re.compile(r"\\([\\`*_\[\]#>~+.-])")


def _unescape_md(s: str) -> str:
    return _MD_ESCAPE.sub(r"\1", s)
_H1 = re.compile(r"^# (.+)$", re.M)
_NUM_RE = r"([0-9][0-9,]*)"


class MarkdownContext:
    """One parse of the cleaned markdown reused across all schema fields."""

    def __init__(self, text: str):
        self.text = text
        self.meta: dict[str, str] = {}
        self.kv: dict[str, str] = {}
        # lists segmented into runs: (preceding_heading_lower, items, all_links)
        self.lists: list[tuple[str, list[str], bool]] = []
        self.paragraphs: list[str] = []
        self.h1: str | None = None

        # lists with per-item link targets preserved: (heading, [(text, href|None)])
        self.linked_lists: list[tuple[str, list[tuple[str, str | None]]]] = []

        in_meta = False
        heading = ""
        cur_items: list[str] | None = None
        cur_linked: list[tuple[str, str | None]] = []
        cur_all_links = True

        def flush():
            nonlocal cur_items, cur_all_links, cur_linked
            if cur_items:
                self.lists.append((heading, cur_items, cur_all_links))
                self.linked_lists.append((heading, cur_linked))
            cur_items, cur_all_links, cur_linked = None, True, []

        for rawline in text.split("\n"):
            line = rawline.rstrip()
            if line == "## Page metadata":
                in_meta = True
                continue
            if in_meta:
                m = _META_LINE.match(line)
                if m:
                    self.meta[m.group(1)] = m.group(2)
                    continue
                in_meta = False
            if re.match(r"^(\* |\d+\. )", line):
                item = re.sub(r"^(\* |\d+\. )", "", line).strip()
                if cur_items is None:
                    cur_items = []
                cur_items.append(_LINK.sub(r"\1", item))
                lm = _LINK.search(item)
                cur_linked.append(
                    (_LINK.sub(r"\1", item), lm.group(2) if lm else None)
                )
                if not _LINK.fullmatch(item):
                    cur_all_links = False
                kv = _KV_LINE.match(line[2:].strip() if line.startswith("* ") else item)
                if kv:
                    self.kv.setdefault(kv.group(1).strip().lower(), _LINK.sub(r"\1", kv.group(2)))
                continue
            flush()
            if line.startswith("#"):
                heading = line.lstrip("# ").strip().lower()
                continue
            if line and not line.startswith(("-", "|", ">", "`")):
                self.paragraphs.append(_LINK.sub(r"\1", line))
                kv = _KV_LINE.match(line)
                if kv and len(kv.group(2).split()) <= 12:
                    self.kv.setdefault(kv.group(1).strip().lower(), _LINK.sub(r"\1", kv.group(2)))
        flush()
        m = _H1.search(text)
        self.h1 = m.group(1) if m else None

        # definition pairs: dl/dt/dd render as alternating short
        # label/value paragraphs (see the public_tender fixture) —
        # harvest them into kv without clobbering explicit "Label: value"
        i = 0
        while i + 1 < len(self.paragraphs):
            label = self.paragraphs[i]
            if 1 <= len(label.split()) <= 5 and not label.endswith((".", "!", "?", ":")):
                self.kv.setdefault(label.strip().lower(), self.paragraphs[i + 1])
                i += 2
            else:
                i += 1

    def list_for(self, prop: str, prefer_links: bool) -> list[str] | None:
        """Best list for an array property: section-heading match first,
        then the first all-links run (tags/topics shape), then nothing."""
        want = prop.replace("_", " ").lower()
        for heading, items, _ in self.lists:
            if heading and (want in heading or heading in want):
                return items
        if prefer_links:
            for _, items, all_links in self.lists:
                if all_links:
                    return items
        return None

    def number_near(self, keyword: str) -> int | None:
        kw = re.escape(keyword)
        m = re.search(_NUM_RE + r"\**\s+" + kw, self.text, re.I) or re.search(
            kw + r"\S*\s*:?\s+\**" + _NUM_RE, self.text, re.I
        )
        if m:
            return int(m.group(1).replace(",", ""))
        return None


# property-name aliases → MarkdownContext sources, tried in order
_STRING_SOURCES: dict[str, tuple[str, ...]] = {
    "url": ("meta:URL",),
    "canonical_url": ("meta:URL",),
    "title": ("meta:Title", "h1"),
    "name": ("h1", "meta:Title"),
    "headline": ("meta:Title", "h1"),
    "author": ("meta:Author", "kv:by"),
    "byline": ("meta:Author",),
    "publish_date": ("meta:Published", "kv:published", "kv:publication date"),
    "published": ("meta:Published",),
    "date": ("meta:Published", "kv:date"),
    "last_updated": ("kv:last commit", "kv:last updated", "meta:Published"),
    "hero_image": ("meta:Image",),
    "image": ("meta:Image",),
    "image_url": ("meta:Image",),
    "summary": ("first_paragraph", "meta:Description"),
    "description": ("meta:Description", "first_paragraph"),
    "readme_summary": ("last_paragraph", "meta:Description"),
    "abstract": ("meta:Description", "first_paragraph"),
    "language": ("kv:primary language", "kv:language"),
    "license": ("kv:license",),
    "buyer": ("kv:buyer", "kv:contracting authority"),
    "value": ("kv:estimated value", "kv:value"),
    "deadline": ("kv:deadline", "kv:submission deadline"),
}

_CPV_CODE = re.compile(r"\b\d{8}-\d\b")

_ARRAY_LINKS = {"tags", "topics", "categories", "links"}

_INT_KEYWORDS = {
    "stars": "stars",
    "forks": "forks",
    "open_issues": "open issues",
    "watchers": "watchers",
}


def _string_value(ctx: MarkdownContext, prop: str) -> str | None:
    for source in _STRING_SOURCES.get(prop, (f"kv:{prop.replace('_', ' ')}",)):
        kind, _, arg = source.partition(":")
        if kind == "meta":
            v = ctx.meta.get(arg)
        elif kind == "kv":
            v = ctx.kv.get(arg)
        elif kind == "h1":
            v = ctx.h1
        elif kind == "first_paragraph":
            v = ctx.paragraphs[0] if ctx.paragraphs else None
        elif kind == "last_paragraph":
            v = ctx.paragraphs[-1] if ctx.paragraphs else None
        else:
            v = None
        if v:
            return v
    return None


def extract_structured(text: str, schema: dict) -> dict:
    """Deterministic (cleaned_markdown, json_schema) -> extracted dict.

    Omits fields it cannot find — downstream validation decides whether
    the row survives (required-field gating)."""
    ctx = MarkdownContext(text)
    out: dict = {}
    for prop, spec in schema.get("properties", {}).items():
        typ = spec.get("type")
        if typ == "string":
            v = _string_value(ctx, prop)
            if v is not None:
                out[prop] = v
        elif typ in ("integer", "number"):
            keyword = _INT_KEYWORDS.get(prop, prop.replace("_", " "))
            n = ctx.number_near(keyword)
            if n is not None:
                out[prop] = n if typ == "integer" else float(n)
        elif typ == "array":
            # arrays always present (strict json_schema output shape):
            # an LLM in strict mode emits [] when nothing is found
            item_spec = spec.get("items", {})
            if prop == "cpv_codes":
                src = ctx.kv.get("cpv", "")
                out[prop] = _CPV_CODE.findall(src)
            elif item_spec.get("type") == "object":
                # listing-page shape (job_board.jobs / tender_list.tenders):
                # one object per list item, link text → title-ish field,
                # href → url-ish field, "Label: value" tails → other fields
                out[prop] = _object_items(ctx, prop, item_spec)
            else:
                items = ctx.list_for(prop, prefer_links=prop in _ARRAY_LINKS)
                out[prop] = list(items) if items else []
        elif typ == "boolean":
            kw = prop.replace("_", " ")
            if re.search(rf"\b{re.escape(kw)}\b", text, re.I):
                out[prop] = True
    return out


def _object_items(ctx: MarkdownContext, prop: str, item_spec: dict) -> list[dict]:
    """array<object> extraction for listing pages: pick the best list
    (heading match, else the first link-bearing run) and map each item to
    an object — first string property gets the link text, a url-typed
    property gets the href, remaining 'key: value' fragments fill the rest."""
    props = item_spec.get("properties", {})
    str_props = [p for p, s in props.items() if s.get("type") == "string"]
    title_prop = next((p for p in ("title", "name", "headline") if p in props),
                      str_props[0] if str_props else None)
    url_prop = next((p for p in str_props if "url" in p or "link" in p), None)

    want = prop.replace("_", " ").lower()
    chosen = None
    for heading, items in ctx.linked_lists:
        if heading and (want in heading or heading in want):
            chosen = items
            break
    if chosen is None:
        for _, items in ctx.linked_lists:
            if any(href for _, href in items):
                chosen = items
                break
    if not chosen:
        return []
    out = []
    for text, href in chosen:
        obj: dict = {}
        # split "Title — dept · location" style tails conservatively:
        # the link text is the title; 'k: v' fragments map to fields
        if title_prop:
            head = text.split(" — ")[0].split(" | ")[0]
            obj[title_prop] = _unescape_md(head)
        for frag in re.split(r" [—|·] ", text)[1:]:
            kv = _KV_LINE.match(frag.strip())
            if kv:
                key = kv.group(1).strip().lower().replace(" ", "_")
                if key in props:
                    obj[key] = kv.group(2)
        if url_prop and href:
            obj[url_prop] = href
        if obj:
            out.append(obj)
    return out


def canonical_json(value) -> str:
    """Stable serialization for data_hash (scrape.rs:235 analog)."""
    return json.dumps(value, separators=(",", ":"), sort_keys=True, ensure_ascii=False)
