"""SSRF guard (SURVEY.md A2) — semantics of ``validate_url``/``is_private_ip``
(/root/reference/crates/ares-client/src/fetcher.rs:197-280):

- scheme must be http/https
- a host that parses as an IP literal is rejected if private/reserved:
  loopback, RFC1918, link-local 169.254/16 (cloud metadata!), unspecified,
  broadcast, documentation nets, CGN 100.64/10; v6 loopback/unspecified/
  link-local/unique-local and IPv4-mapped addresses checked recursively
- hostnames would be DNS-resolved and every address checked; in the
  batch engine DNS happens at fetch time, so the vectorized pre-filter
  rejects literal-IP and obviously-local hostnames, and the fetch layer
  re-validates post-resolution (``resolver`` hook for real deployments)

Exposed both as a pure predicate (for tests/the fetch layer) and a
vectorized pandas-UDF column for frontier pre-filtering.
"""

from __future__ import annotations

import ipaddress
import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_LOCAL_HOSTNAMES = {"localhost", "localhost.localdomain", "ip6-localhost"}


def is_private_ip(ip_str: str) -> bool:
    """fetcher.rs:255-280 range set."""
    try:
        ip = ipaddress.ip_address(ip_str)
    except ValueError:
        return False
    if isinstance(ip, ipaddress.IPv6Address) and ip.ipv4_mapped is not None:
        ip = ip.ipv4_mapped
    if isinstance(ip, ipaddress.IPv4Address):
        o = ip.packed
        return (
            ip.is_loopback
            or ip.is_private  # covers 10/8, 172.16/12, 192.168/16, plus more
            or ip.is_link_local
            or ip.is_unspecified
            or o == b"\xff\xff\xff\xff"
            or ip in ipaddress.ip_network("192.0.2.0/24")
            or ip in ipaddress.ip_network("198.51.100.0/24")
            or ip in ipaddress.ip_network("203.0.113.0/24")
            or ip in ipaddress.ip_network("100.64.0.0/10")
        )
    return (
        ip.is_loopback
        or ip.is_unspecified
        or ip.is_link_local  # fe80::/10
        or ip.is_private  # fc00::/7 unique local (and more)
    )


_HEX_RE = re.compile(r"0[xX][0-9a-fA-F]*$")
_OCT_RE = re.compile(r"0[0-7]*$")
# a label inet_aton/WHATWG could read as a NUMBER (decimal/hex/octal) — a
# host made only of such labels (or empties, as in '0..') can never be a
# registered domain (no all-numeric TLD exists), so if it is numeric-shaped
# but fails to normalize to an IPv4 address we must fail CLOSED: lenient
# resolvers map spellings we reject ('0.' + getaddrinfo quirks) to real
# addresses like 0.0.0.0. Purely-alphabetic hex-ish labels ('cafe.de')
# stay named hosts — inet_aton only reads hex with an 0x prefix.
_NUMERICISH_HOST_RE = re.compile(r"(?:(?:\d+|0[xX][0-9a-fA-F]*)?\.)*(?:\d+|0[xX][0-9a-fA-F]*)?$")


def normalize_obscure_ipv4(host: str) -> str | None:
    """Dotted-decimal is not the only IPv4 spelling a URL parser accepts:
    per WHATWG/inet_aton, '2130706433', '0x7f000001', '017700000001' and
    '127.1' all mean 127.0.0.1 — the reference's Rust ``url`` crate
    normalizes these before ``is_private_ip`` ever sees them
    (fetcher.rs:197-254). Returns the canonical dotted form, or None if
    ``host`` is not an all-numeric IPv4 spelling."""
    h = host[:-1] if host.endswith(".") else host  # WHATWG: one trailing dot
    parts = h.split(".")
    if not parts or len(parts) > 4 or any(p == "" for p in parts):
        return None
    vals = []
    for p in parts:
        if _HEX_RE.fullmatch(p):
            vals.append(int(p, 16) if len(p) > 2 else 0)  # bare "0x" == 0
        elif _OCT_RE.fullmatch(p):
            vals.append(int(p, 8))
        elif p.isascii() and p.isdigit():
            vals.append(int(p, 10))
        else:
            return None
    prefix, last = vals[:-1], vals[-1]
    if any(v > 255 for v in prefix) or last >= 1 << (8 * (4 - len(prefix))):
        return None
    n = 0
    for v in prefix:
        n = (n << 8) | v
    n = (n << (8 * (4 - len(prefix)))) | last
    return str(ipaddress.IPv4Address(n))


def url_fetchable(url: str, resolver=None) -> tuple[bool, str | None]:
    """(allowed, reason_if_blocked). ``resolver(host) -> [ip_str]`` enables
    the reference's resolve-and-check-all behavior where DNS exists."""
    if not url:
        return False, "empty url"
    try:
        parts = urlsplit(url)
    except ValueError as e:
        return False, f"invalid url: {e}"
    if parts.scheme not in ("http", "https"):
        return False, f"scheme '{parts.scheme}' is not allowed (only http/https)"
    host = parts.hostname
    if not host:
        return False, "URL has no host"
    host = host.strip("[]")
    if host.lower() in _LOCAL_HOSTNAMES or host.lower().endswith(".localhost"):
        return False, f"SSRF blocked: {host} is a local hostname"
    try:
        ipaddress.ip_address(host)
        is_literal = True
    except ValueError:
        # decimal/hex/octal/short-dotted IPv4 spellings parse as
        # "hostnames" for ipaddress but as IPs for every URL fetcher —
        # normalize so '2130706433' can't smuggle 127.0.0.1 past the guard
        norm = normalize_obscure_ipv4(host)
        if norm is not None:
            host = norm
            is_literal = True
        elif _NUMERICISH_HOST_RE.fullmatch(host):
            # numeric-shaped ('0..', '1.2..3', '999.1') but NOT normalizable:
            # fail CLOSED — no legitimate domain is all-numeric labels, and
            # lenient resolvers may still map such spellings to an address
            # (fetcher.rs:197-254 reject-by-default posture)
            return False, f"SSRF blocked: unparseable numeric host {host}"
        else:
            is_literal = False
    if is_literal:
        if is_private_ip(host):
            return False, f"SSRF blocked: {host} resolves to private/reserved IP"
        return True, None
    if resolver is not None:
        try:
            addrs = resolver(host)
        except OSError as e:
            return False, f"DNS resolution failed for {host}: {e}"
        if not addrs:
            return False, f"DNS resolution returned no addresses for {host}"
        for a in addrs:
            if is_private_ip(a):
                return False, f"SSRF blocked: {host} resolves to private/reserved IP {a}"
    return True, None


def fetchable_series(urls: pd.Series) -> pd.Series:
    """Vectorized url_fetchable over a pandas Series.

    Fast path (C-speed regex, no per-row Python): a URL whose host
    contains a letter outside the hex/0x alphabet ([g-w y z]) cannot be
    any IPv4 spelling (dotted, decimal, hex, octal) — it is a named host,
    allowed unless it smells like localhost. Everything else (IP-ish
    hosts, bracketed IPv6, odd schemes, empty hosts) takes the exact
    per-row ``url_fetchable`` — rare on real link corpora, so the
    row-at-a-time cost never dominates. Equivalence with url_fetchable
    is pinned in tests/test_ssrf.py::test_fetchable_series_parity."""
    s = urls.fillna("")
    # urlsplit (WHATWG/bpo-43882) strips \r\n\t anywhere — mirror it so the
    # fast path sees the same host the slow path would
    dirty = s.str.contains(r"[\r\n\t]", regex=True)
    if dirty.any():
        s = s.where(~dirty, s.str.replace(r"[\r\n\t]", "", regex=True))
    host = s.str.extract(r"(?i)^https?://(?:[^@/?#]*@)?([^/:?#\[\]]+)", expand=False)
    fast = host.str.contains(r"[g-wyzG-WYZ]", regex=True, na=False) & ~host.str.contains(
        "localhost", case=False, na=False
    )
    out = pd.Series(True, index=s.index)
    slow = ~fast
    if slow.any():
        out.loc[slow] = [url_fetchable(u)[0] for u in s.loc[slow]]
    return out


def fetchable_col(url_col="url"):
    """Vectorized pre-fetch filter column (no DNS — literal/obvious cases)."""

    @pandas_udf("boolean")
    def check(urls: pd.Series) -> pd.Series:
        return fetchable_series(urls)

    return check(F.col(url_col) if isinstance(url_col, str) else url_col)
