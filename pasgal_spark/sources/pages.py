"""Common-Crawl-style page sources.

Two deterministic generators for the canonical ``pages(url, warc_ts, html,
text, lang)`` table (input_hint, /root/repo/BASELINE.json):

- ``pages_from_documents`` — derives pages from the driver's ``documents``
  table with **portable SQL** (``PAGES_CTE`` runs identically under Spark SQL
  and DuckDB), so the html→links extractor is oracle-checkable end-to-end.
- ``synthesize_pages`` — standalone hash-based generator
  (``spark.range`` + ``xxhash64`` column expressions, no RNG state), the
  Spark translation of the reference's deterministic random-graph generator
  (reference /root/reference/src/graph.h:397-433: edges from ``hash32(i)``).
  Used by pytest fixtures and the scaling benchmark.

Both embed real ``<a href>`` out-links in the html so the extractor is
actually exercised; out-degree is variable and page 0 is a guaranteed hub
(FIXTURES.md F2 skew fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KNUTH = 2654435761  # Knuth multiplicative hash constant (fits int64 math)
_N_SITES = 97


def _link_case(k: int) -> str:
    """One optional <a href> per page, portable SQL (see PAGES_CTE)."""
    tgt = f"(doc_id * {_KNUTH} + {k}) % (SELECT np FROM pages_params)"
    return (
        f"CASE WHEN (doc_id + {k}) % 4 <> 0 AND {tgt} <> doc_id THEN "
        f"'<a href=\"https://site' || CAST(({tgt}) % {_N_SITES} AS STRING) "
        f"|| '.example/p/' || CAST({tgt} AS STRING) || '\">l{k}</a>' "
        f"ELSE '' END"
    )


PAGES_CTE = f"""
pages_params AS (SELECT CAST(count(*) AS BIGINT) AS np FROM documents),
pages AS (
  SELECT
    'https://site' || CAST(doc_id % {_N_SITES} AS STRING) || '.example/p/'
      || CAST(doc_id AS STRING) AS url,
    doc_id AS page_id,
    '<html><head><title>p' || CAST(doc_id AS STRING) || '</title></head><body>'
      || {_link_case(1)}
      || {_link_case(2)}
      || {_link_case(3)}
      || '<p>' || text || '</p></body></html>' AS html,
    lang
  FROM documents
)
"""


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages derived from the ``documents`` parquet (html as binary)."""
    from pasgal_spark.graph.builder import load_views

    load_views(spark, sf_dir, ["documents"])
    df = spark.sql(f"WITH {PAGES_CTE} SELECT url, page_id, html, lang FROM pages")
    return df.withColumn("html", F.col("html").cast("binary"))


def synthesize_pages(
    spark: SparkSession,
    n_pages: int,
    *,
    seed: int = 42,
    max_links: int = 8,
    hub_every: int = 17,
) -> DataFrame:
    """Deterministic synthetic pages table at arbitrary scale.

    Pure column expressions over ``spark.range(n_pages)`` — fully distributed,
    no driver-side data, bit-reproducible (hash-derived, seed folded into
    xxhash64 — the reference's determinism idiom). Out-degree is
    power-law-ish: ``1 + h % 2^(h' % log2(max_links)+1)``; every
    ``hub_every``-th page also links to page 0.
    """
    ids = spark.range(n_pages).withColumnRenamed("id", "page_id")
    h = lambda salt: F.abs(F.xxhash64(F.col("page_id"), F.lit(seed + salt)))  # noqa: E731

    url = F.concat(
        F.lit("https://site"),
        (F.col("page_id") % _N_SITES).cast("string"),
        F.lit(".example/p/"),
        F.col("page_id").cast("string"),
    )
    warc_ts = F.timestamp_seconds(F.lit(1325376000) + h(1) % (365 * 24 * 3600))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ["en", "de", "fr", "es", "zh"]]),
        (h(4) % 5 + 1).cast("int"),
    )
    out_deg = (
        F.lit(1) + h(2) % F.pow(F.lit(2.0), (h(3) % 4).cast("double")).cast("long")
    ).cast("int")

    # Build the <a href> list as an array expression, then concat — all
    # JVM-side, no UDF.
    def link_k(k: int):
        tgt = F.abs(F.xxhash64(F.col("page_id"), F.lit(k), F.lit(seed + 5))) % n_pages
        anchor = F.concat(
            F.lit('<a href="https://site'),
            (tgt % _N_SITES).cast("string"),
            F.lit(".example/p/"),
            tgt.cast("string"),
            F.lit('">l'),
            F.lit(str(k)),
            F.lit("</a>"),
        )
        return F.when((F.lit(k) <= F.col("out_deg")) & (tgt != F.col("page_id")), anchor).otherwise(F.lit(""))

    hub_link = F.when(
        (F.col("page_id") % hub_every == 0) & (F.col("page_id") != 0),
        F.lit('<a href="https://site0.example/p/0">hub</a>'),
    ).otherwise(F.lit(""))

    body_tokens = F.concat(F.lit("filler t"), (h(6) % 100000).cast("string"))
    df = ids.withColumn("out_deg", out_deg)
    html = F.concat(
        F.lit("<html><head><title>p"),
        F.col("page_id").cast("string"),
        F.lit("</title></head><body>"),
        *[link_k(k) for k in range(1, max_links + 1)],
        hub_link,
        F.lit("<p>"),
        body_tokens,
        F.lit("</p></body></html>"),
    )
    df = df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.cast("binary").alias("html"),
        lang.alias("lang"),
        F.col("page_id"),
    )
    return df
