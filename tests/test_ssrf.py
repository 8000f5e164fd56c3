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
