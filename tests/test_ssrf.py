"""SSRF guard parity — ports the reference's unit tests
(/root/reference/crates/ares-client/src/fetcher.rs:282-379)."""

import pytest

from ares_spark.operators.ssrf import is_private_ip, url_fetchable


@pytest.mark.parametrize(
    "ip",
    ["127.0.0.1", "10.0.0.1", "172.16.0.1", "192.168.1.1",
     "169.254.169.254", "0.0.0.0", "100.64.0.1", "255.255.255.255",
     "192.0.2.5", "198.51.100.1", "203.0.113.9"],
)
def test_private_ipv4(ip):
    assert is_private_ip(ip)


@pytest.mark.parametrize("ip", ["8.8.8.8", "1.1.1.1", "93.184.216.34"])
def test_public_ipv4(ip):
    assert not is_private_ip(ip)


@pytest.mark.parametrize(
    "ip", ["::1", "::", "fe80::1", "fc00::1", "::ffff:127.0.0.1", "::ffff:169.254.169.254"]
)
def test_private_ipv6(ip):
    assert is_private_ip(ip)


def test_public_ipv6():
    assert not is_private_ip("2001:4860:4860::8888")


def test_validate_rejects_private_ip():
    ok, reason = url_fetchable("http://127.0.0.1/admin")
    assert not ok and "SSRF blocked" in reason


def test_validate_rejects_metadata_ip():
    ok, reason = url_fetchable("http://169.254.169.254/latest/meta-data/")
    assert not ok and "SSRF blocked" in reason


def test_validate_rejects_bad_scheme():
    ok, reason = url_fetchable("file:///etc/passwd")
    assert not ok and "not allowed" in reason


def test_validate_accepts_public():
    assert url_fetchable("https://example.com") == (True, None)


def test_validate_rejects_localhost_names():
    assert not url_fetchable("http://localhost:8080/x")[0]
    assert not url_fetchable("http://foo.localhost/x")[0]


def test_resolver_hook_checks_all_addresses():
    assert not url_fetchable("https://evil.test/", resolver=lambda h: ["8.8.8.8", "10.0.0.1"])[0]
    assert url_fetchable("https://ok.test/", resolver=lambda h: ["8.8.8.8"])[0]
    assert not url_fetchable("https://none.test/", resolver=lambda h: [])[0]


def test_fetchable_col_vectorized(spark):
    from pyspark.sql import functions as F

    from ares_spark.operators.ssrf import fetchable_col

    urls = ["https://example.com/a", "http://127.0.0.1/x", "ftp://x/y",
            "http://169.254.169.254/", "https://8.8.8.8/ok"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: r.ok for r in df.withColumn("ok", fetchable_col("url")).collect()}
    assert got == {
        "https://example.com/a": True,
        "http://127.0.0.1/x": False,
        "ftp://x/y": False,
        "http://169.254.169.254/": False,
        "https://8.8.8.8/ok": True,
    }


@pytest.mark.parametrize(
    "host",
    ["2130706433", "0x7f000001", "017700000001", "127.1", "127.0.1",
     "0xA9.0xFE.0xA9.0xFE", "0251.0376.0251.0376", "2852039166"],
)
def test_obscure_ipv4_spellings_blocked(host):
    """Decimal/hex/octal/short-dotted spellings of 127.0.0.1 and
    169.254.169.254 must not smuggle past the literal-IP check."""
    ok, reason = url_fetchable(f"http://{host}/latest/meta-data/")
    assert not ok and "SSRF blocked" in reason


def test_obscure_public_ipv4_allowed():
    # 134744072 == 8.8.8.8 — obscure but public, the reference allows it
    assert url_fetchable("http://134744072/")[0]
    assert url_fetchable("http://0x08080808/")[0]


def test_obscure_normalizer_leaves_hostnames_alone():
    from ares_spark.operators.ssrf import normalize_obscure_ipv4

    assert normalize_obscure_ipv4("example.com") is None
    assert normalize_obscure_ipv4("123abc") is None
    assert normalize_obscure_ipv4("1.2.3.4.5") is None
    assert normalize_obscure_ipv4("2130706433") == "127.0.0.1"
    assert normalize_obscure_ipv4("127.1") == "127.0.0.1"


@pytest.mark.parametrize(
    "host", ["0..", "1.2..3", "0.", "1.2.3.4.5", "999.1", ".",
             "123456789012345", "0x7f000001.0x"],
)
def test_unparseable_numeric_host_fails_closed(host):
    """A host made only of numeric-shaped/empty labels that does NOT
    normalize to an IPv4 address is blocked, never treated as a named host:
    lenient resolvers map spellings like '0.' to 0.0.0.0 (fetcher.rs:197-254
    reject-by-default). Hypothesis counterexample '0..' pinned."""
    ok, reason = url_fetchable(f"http://{host}/")
    assert not ok and "SSRF blocked" in reason, (host, ok, reason)


@pytest.mark.parametrize("host", ["cafe.de", "deadbeef.ca", "0x.example", "a.b"])
def test_hexish_named_hosts_stay_open(host):
    """Alphabetic labels that happen to sit in the hex alphabet are real
    domain shapes — inet_aton only reads hex with an 0x prefix, so these
    are named hosts, not failed IP spellings."""
    assert url_fetchable(f"http://{host}/")[0], host


def test_fetchable_series_parity():
    """The vectorized fast path must agree with url_fetchable row-by-row."""
    import pandas as pd

    from ares_spark.operators.ssrf import fetchable_series

    urls = [
        "https://example.com", "http://evil.com:8080/x?a=1#f",
        "http://user:pw@example.org/p", "HTTP://UPPER.example.COM/",
        "http://localhost/x", "http://foo.localhost/x", "http://LOCALHOST:99/",
        "http://127.0.0.1/", "http://2130706433/", "http://0x7f000001/",
        "http://017700000001/", "http://127.1/", "http://134744072/",
        "http://169.254.169.254/meta", "http://[::1]/", "http://[fe80::1]/x",
        "http://[2001:4860:4860::8888]/", "ftp://example.com/", "file:///etc/passwd",
        "http:///nohost", "http://@/", "", None, "not a url",
        "http://deadbeef.ca/", "http://face.cafe/", "http://0xg.com/",
        "http://my_host.example/", "http://local\nhost/", "http://evil.com\n/x",
        "http://xn--bcher-kva.example/", "javascript:alert(1)",
        "http://10.0.0.1/", "http://192.168.1.1:8080/", "http://8.8.8.8/",
        "http://0251.0376.0251.0376/", "http://1.2.3.4.5/", "http://123abc.com/",
    ]
    got = fetchable_series(pd.Series(urls, dtype=object)).tolist()
    want = [url_fetchable(u if u is not None else "")[0] for u in urls]
    assert got == want, [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ]
