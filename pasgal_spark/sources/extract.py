"""Vectorized html → links / text extraction (Arrow-batched, no per-row Python).

The Spark analog of the reference's graph readers (reference
/root/reference/src/graph.h:226-247 dispatches file formats; the hyperlink2012
reader at src/graph.h:196-224 is the web-graph precedent): our "format" is
html bytes in an Iceberg/parquet pages table, and "reading the graph" is
regex link extraction inside ``mapInPandas`` batches.

Contract (input_hint): extracted ``text`` is a pure function of the html
bytes — utf-8 decode, strip ``<[^>]*>`` tags, nothing else — so it is
byte-identical across engines and runs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_RE = re.compile(r'href="([^"]*)"')
TAG_RE = re.compile(r"<[^>]*>")
_URL_ID_RE = re.compile(r"/p/(\d+)$")


def _decode(html: pd.Series) -> pd.Series:
    # html arrives as bytes (binary column) or str depending on source.
    if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
        return html.str.decode("utf-8")
    return html.astype(str)


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, html) → (src_url, dst_url), one row per extracted href.

    ``mapInPandas``: each Arrow batch is decoded and regex-scanned with
    pandas vectorized string ops; the explode happens inside the batch so
    no per-row Python function is ever called.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            html = _decode(pdf["html"])
            links = html.str.findall(HREF_RE)
            out = pd.DataFrame(
                {"src_url": pdf["url"], "dst_url": links}
            ).explode("dst_url")
            out = out[out["dst_url"].notna()]
            yield out.astype({"src_url": str, "dst_url": str})

    return pages.select("url", "html").mapInPandas(
        batches, "src_url string, dst_url string"
    )


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, html) → (url, text): utf-8 decode + tag strip, byte-identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            html = _decode(pdf["html"])
            yield pd.DataFrame(
                {"url": pdf["url"], "text": html.str.replace(TAG_RE, "", regex=True)}
            )

    return pages.select("url", "html").mapInPandas(batches, "url string, text string")


def links_to_edges(links: DataFrame) -> DataFrame:
    """(src_url, dst_url) → deduped (src, dst) long ids.

    Our url scheme carries the page id (…/p/<id>), so the url→id dictionary
    is a pure column expression; for arbitrary urls swap in a
    ``xxhash64(url)`` id or a dictionary join against the pages table —
    both stay JVM-side.
    """
    src = F.regexp_extract("src_url", r"/p/(\d+)$", 1).cast("long")
    dst = F.regexp_extract("dst_url", r"/p/(\d+)$", 1).cast("long")
    return (
        links.select(src.alias("src"), dst.alias("dst"))
        .filter("src IS NOT NULL AND dst IS NOT NULL AND src <> dst")
        .distinct()
    )
