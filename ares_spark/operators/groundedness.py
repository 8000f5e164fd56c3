"""Groundedness check (SURVEY.md A10) — semantics of
/root/reference/crates/ares-core/src/groundedness.rs:30-98.

Flags short atomic extracted string values (and all URL-ish values) that
are neither a substring of the source nor fully token-covered by it.
Advisory only: produces a warning column, never gates persistence.
"""

from __future__ import annotations

import re

MAX_ATOMIC_WORDS = 8  # groundedness.rs:23
MIN_TOKEN_LEN = 4  # groundedness.rs:25

_NON_ALNUM = re.compile(r"[^0-9a-zA-Z]+")


def _looks_like_url(s: str) -> bool:
    return "://" in s or "www." in s


def _is_checkable(s: str) -> bool:
    s = s.strip()
    return bool(s) and (_looks_like_url(s) or len(s.split()) <= MAX_ATOMIC_WORDS)


def _significant_tokens(s: str) -> list[str]:
    return [t for t in _NON_ALNUM.split(s.lower()) if len(t) >= MIN_TOKEN_LEN]


def _is_grounded(value: str, norm_source: str) -> bool:
    norm_value = value.lower()
    if norm_value.strip() in norm_source:
        return True
    tokens = _significant_tokens(value)
    return bool(tokens) and all(t in norm_source for t in tokens)


def ungrounded_fields(source: str, value) -> list[str]:
    """Paths of extracted string values not supported by ``source``."""
    norm_source = source.lower()
    out: list[str] = []

    def walk(v, path: str):
        if isinstance(v, str):
            if _is_checkable(v) and not _is_grounded(v, norm_source):
                out.append(path or "<root>")
        elif isinstance(v, list):
            for i, item in enumerate(v):
                walk(item, f"{path}[{i}]")
        elif isinstance(v, dict):
            for k, sub in v.items():
                walk(sub, f"{path}.{k}" if path else k)

    walk(value, "")
    return out
