"""Extractor contract tests: byte-identical text, exact link sets
(FIXTURES.md F4: reference pure-Python extractor over html bytes)."""

from __future__ import annotations

import re

from pasgal_spark.sources.extract import extract_links, extract_text, links_to_edges
from pasgal_spark.sources.pages import pages_from_documents, synthesize_pages

HREF_RE = re.compile(r'href="([^"]*)"')
TAG_RE = re.compile(r"<[^>]*>")


def _reference_extract(html_bytes: bytes) -> tuple[str, list[str]]:
    """The independent pure-Python reference extractor (golden)."""
    html = html_bytes.decode("utf-8")
    return TAG_RE.sub("", html), HREF_RE.findall(html)


def test_text_byte_identical(spark):
    pages = synthesize_pages(spark, 64).cache()
    got = {r["url"]: r["text"] for r in extract_text(pages).collect()}
    for row in pages.select("url", "html").collect():
        exp_text, _ = _reference_extract(bytes(row["html"]))
        assert got[row["url"]].encode() == exp_text.encode()


def test_links_exact(spark):
    pages = synthesize_pages(spark, 64).cache()
    got = {}
    for r in extract_links(pages).collect():
        got.setdefault(r["src_url"], []).append(r["dst_url"])
    for row in pages.select("url", "html").collect():
        _, exp_links = _reference_extract(bytes(row["html"]))
        assert sorted(got.get(row["url"], [])) == sorted(exp_links)


def test_hub_page_receives_links(spark):
    pages = synthesize_pages(spark, 64, hub_every=17)
    edges = links_to_edges(extract_links(pages))
    hub_in = edges.filter("dst = 0").count()
    # pages 17, 34, 51 link to the hub
    assert hub_in >= 3


def test_links_to_edges_dedup_and_no_self_loops(spark):
    pages = synthesize_pages(spark, 64)
    edges = links_to_edges(extract_links(pages))
    assert edges.filter("src = dst").count() == 0
    assert edges.count() == edges.distinct().count()


def test_pages_from_documents_deterministic(spark, sf_dir):
    a = sorted(
        (r["url"], bytes(r["html"])) for r in pages_from_documents(spark, sf_dir).collect()
    )
    b = sorted(
        (r["url"], bytes(r["html"])) for r in pages_from_documents(spark, sf_dir).collect()
    )
    assert a == b
    assert len(a) == 500
