"""Compatibility with the reference's REAL cached manifest artifact: the
engine's cache-read path must consume /root/reference/data/out/
year_url_mapping.json (read-only) byte-for-byte as the reference wrote it,
and the URL dialect must reproduce the real source_urls recorded there."""

from __future__ import annotations

import os

import pytest

from aspep_etl_spark.sources.manifest import build_year_url_mapping, census_url_for_year

REAL_MANIFEST = "/root/reference/data/out/year_url_mapping.json"


@pytest.mark.skipif(not os.path.exists(REAL_MANIFEST), reason="reference data absent")
def test_cached_read_of_real_reference_manifest():
    def must_not_fetch(url):  # cache hit → zero network
        raise AssertionError("fetch called despite cache")

    mapping = build_year_url_mapping(REAL_MANIFEST, fetch=must_not_fetch)
    assert len(mapping) >= 20
    assert mapping["2003"]["data_url"].endswith("03stall.xls")
    # URL-dialect builder reproduces every real source_url in the manifest
    for year_str, row in mapping.items():
        assert census_url_for_year(int(year_str)) == row["source_url"], year_str
    # extension dispatch facts the download stage relies on
    assert all(
        row["data_url"].endswith((".xls", ".xlsx")) for row in mapping.values()
    )
