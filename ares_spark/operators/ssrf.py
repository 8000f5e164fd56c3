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


def fetchable_col(url_col="url"):
    """Vectorized pre-fetch filter column (no DNS — literal/obvious cases)."""

    @pandas_udf("boolean")
    def check(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: url_fetchable(u)[0])

    return check(F.col(url_col) if isinstance(url_col, str) else url_col)
