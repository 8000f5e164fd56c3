"""End-to-end spark-submit --py-files smoke (north_rule ship shape).

Runs the REAL spark-submit launcher as a subprocess with the package
shipped ONLY as a --py-files zip (cwd is a temp dir so the repo checkout
is not importable), crawls a small corpus from WARC input, and checks
the printed manifest + on-disk checkpoint."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_spark_submit_pyfiles_crawl(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    from ares_spark.io.warc import write_warc
    from ares_spark.session import _package_zip

    # corpus as WARC (the Common-Crawl-shaped input path)
    def page(url, links):
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        return {"url": url, "date": "2026-03-01T00:00:00Z",
                "body": f"<html><body><h1>t</h1>{body}</body></html>".encode()}

    base = "https://s.example.org"
    write_warc(str(tmp_path / "site.warc.gz"), [
        page(f"{base}/", [f"{base}/a", f"{base}/b"]),
        page(f"{base}/a", [f"{base}/b"]),
        page(f"{base}/b", []),
    ])

    ck = tmp_path / "ck"
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _package_zip(),
        str(REPO / "tools" / "submit_crawl.py"),
        "--warc", str(tmp_path / "site.warc.gz"),
        "--seeds", f"{base}/",
        "--checkpoint", str(ck),
        "--max-depth", "3", "--max-pages", "10",
        "--allowed-domains", "example.org",
    ]
    run_dir = tmp_path / "cwd"
    run_dir.mkdir()
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                         cwd=run_dir)
    assert out.returncode == 0, out.stderr[-4000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    # /a and /b discovered as children; the seed itself is never marked
    # seen (reference quirk) and nothing links back to it
    assert summary["seen_total"] == 2
    manifests = sorted(ck.glob("manifest-g*.json"))
    assert manifests, "no lineage manifests written"
    assert (ck / "extractions").exists()
