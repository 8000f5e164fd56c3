"""URL canonicalization & resolution (RFC 3986), pure Python.

Mirrors the behavior of the Rust ``url`` crate as used by the reference
(/root/reference/crates/ares-client/src/link_discovery.rs:24-47,
/root/reference/crates/ares-core/src/throttle.rs:112-120): lowercase
scheme/host, default-port removal, dot-segment resolution, empty path →
"/", optional fragment strip. The canonical form feeds the URL-seen set's
``xxhash64`` key per BASELINE.json north_rule.

All functions are plain Python so they vectorize inside pandas UDFs
(applied via ``pandas.Series.map`` over Arrow batches — no JVM round-trip).
"""

from __future__ import annotations

from urllib.parse import quote, urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}

# chars left untouched in paths: unreserved + sub-delims + ":@/" + "%"
# (leaving "%" alone preserves pre-encoded sequences)
_PATH_SAFE = "/:@!$&'()*+,;=%~-._"
_QUERY_SAFE = _PATH_SAFE + "?"


def _norm_host(host: str) -> str:
    host = host.lower().rstrip(".") if host else host
    if host and not host.isascii():
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass
    return host


def canonicalize_url(url: str, keep_fragment: bool = False) -> str | None:
    """RFC-3986-normalize a URL; returns None if it isn't parseable http(s).

    Normalizations (matching rust-url serialization): lowercase scheme and
    host, strip default port, resolve dot segments, empty path → "/",
    percent-encode raw spaces/non-ASCII in path and query, strip fragment
    (unless ``keep_fragment``).
    """
    if not url:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = _norm_host(parts.hostname or "")
    if not host:
        return None
    netloc = host
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _remove_dot_segments(parts.path) or "/"
    path = quote(path, safe=_PATH_SAFE)
    query = quote(parts.query, safe=_QUERY_SAFE)
    fragment = parts.fragment if keep_fragment else ""
    return urlunsplit((scheme, netloc, path, query, fragment))


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal."""
    if not path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash produced by "." / ".." final segments
    if path.endswith(("/.", "/..", "/")) and (not out or out[-1] != ""):
        out.append("")
    resolved = "/".join(out)
    if path.startswith("/") and not resolved.startswith("/"):
        resolved = "/" + resolved
    return resolved


def resolve_url(base: str, href: str) -> str | None:
    """Resolve ``href`` against ``base`` and canonicalize (fragment kept).

    Matches ``Url::parse(base).join(href)`` in link_discovery.rs:36.
    """
    try:
        joined = urljoin(base, href.strip())
    except ValueError:
        return None
    return canonicalize_url(joined, keep_fragment=True)


def url_host(url: str) -> str | None:
    """Lowercased host, e.g. for politeness keys and domain filters
    (throttle.rs:112-120 uses scheme://host:port; we key on host alone for
    partitioning and keep the full origin where the reference needs it)."""
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return None
    return _norm_host(h) if h else None


def url_origin(url: str) -> str | None:
    """``scheme://host:port`` politeness key — throttle.rs:112-120."""
    c = canonicalize_url(url)
    if c is None:
        return None
    parts = urlsplit(c)
    port = parts.port or _DEFAULT_PORTS.get(parts.scheme, "")
    return f"{parts.scheme}://{parts.hostname}:{port}"


def domain_allowed(host: str | None, allowed: list[str] | None) -> bool:
    """Exact-or-dot-suffix-subdomain match —
    /root/reference/crates/ares-core/src/worker.rs:326-344."""
    if not host:
        return False
    if not allowed:
        return False
    for d in allowed:
        d = (d or "").lower()
        if not d:
            continue
        if host == d or host.endswith("." + d):
            return True
    return False


def canonical_url_col(col):
    """Vectorized column form of canonicalize_url (Arrow-batched pandas
    UDF; nulls for unparseable inputs). For ingesting EXTERNAL url
    tables — WAT link graphs, seed lists — whose urls are not already
    canonical; the crawl loop's own links are canonicalized at
    discovery time and never pay this."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def canon(urls):
        return urls.map(lambda u: canonicalize_url(u) if u is not None else None)

    # real annotation objects: this module's `from __future__ import
    # annotations` would stringify inline hints, which PySpark's
    # type-hint inference cannot resolve here
    canon.__annotations__ = {"urls": pd.Series, "return": pd.Series}
    return pandas_udf(canon, "string")(col)
