"""Parse-operator queries: parse(render(part)) must equal part.

Each query renders a source's fixture pages from ``part`` (JVM-side
concat), runs the real parse + normalize pipeline, and explodes the
resulting specs map. The oracle recomputes the expected rows DIRECTLY
from ``part`` — so a hash match proves the parser inverts the page
format exactly (keys through to_key, values trimmed, continuation and
tooltip-fallback rules included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.pipeline import normalize_records
from ..registry import register
from ..session import load_table
from ..sources.fixtures import spec_pages
from ..sources.parse import PARSERS
from ..sources.warc import WARC_BUCKETS, WARC_FIXED_OVERHEAD

_URL = "'https://example.com/devices/{src}/p_' || CAST(p_partkey AS VARCHAR)"
_PRICE = "CAST(CAST(p_retailprice AS DECIMAL(10,2)) AS VARCHAR)"


def _parse_query(source: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        # no fan_out here: measured 4.6x SLOWER at sf0.1 (0.37s -> 1.73s) —
        # the parse path is cheap per row, so the repartition boundary costs
        # more than the extra cores return; at real split counts the scan
        # parallelizes by itself
        part = load_table(spark, "part", sf_dir)
        pages = spec_pages(part, source).filter(F.col("status") == 200)
        normalized = normalize_records(PARSERS[source](pages), source)
        return normalized.select(
            F.col("src_url").alias("url"),
            "brand",
            "model",
            F.explode("specs").alias("spec_key", "spec_value"),
        )

    return q


register(
    "parse_gsmarena",
    oracle=f"""
    WITH p AS (SELECT *, {_URL.format(src='gsmarena')} AS url
               FROM part WHERE p_partkey % 29 <> 3)
    SELECT url, p_brand AS brand, p_name AS model, 'general_brand' AS spec_key, p_brand AS spec_value FROM p
    UNION ALL
    SELECT url, p_brand, p_name, 'general_type', p_type || ' ' || p_name FROM p
    UNION ALL
    SELECT url, p_brand, p_name, 'general_retail_price', {_PRICE} FROM p
    """,
    doc="gsmarena spec-table extract incl. 1-char-subtitle continuation "
    "(app.js:547-566) — pandas-UDF parse, oracle recomputed from part.",
)(_parse_query("gsmarena"))


register(
    "parse_geekbench",
    oracle="""
    WITH p AS (
      SELECT *,
             'https://example.com/'
               || CASE WHEN p_partkey % 7 = 1 THEN 'ios' ELSE 'android' END
               || '_devices/geekbench/p_' || CAST(p_partkey AS VARCHAR) AS url,
             CASE WHEN p_partkey % 7 = 1 THEN 'Apple' ELSE p_brand END AS brand,
             CASE WHEN p_partkey % 7 = 1 THEN p_brand || ' ' || p_name
                  ELSE p_name END AS model
      FROM part WHERE p_partkey % 29 <> 3)
    SELECT url, brand, model, 'cpu' AS spec_key,
           'armv8 ' || CAST(p_size * 100 AS VARCHAR) || ' MHz' AS spec_value FROM p
    UNION ALL
    SELECT url, brand, model, 'single_core_score', CAST(p_size * 13 AS VARCHAR) FROM p
    UNION ALL
    SELECT url, brand, model, 'multi_core_score', CAST(p_size * 47 AS VARCHAR) FROM p
    """,
    doc="geekbench fixed-position + parallel-array extract (app.js:599-627) — "
    "all built-ins (regexp_extract_all + zip_with); the url's device-class "
    "segment drives the ios→Apple brand override (app.js:629-635), so the "
    "oracle hash-checks the override on every 7th part.",
)(_parse_query("geekbench"))


register(
    "parse_productz",
    oracle=f"""
    WITH p AS (SELECT *, {_URL.format(src='productz')} AS url FROM part)
    SELECT url, p_brand AS brand, p_name AS model, 'brand' AS spec_key, p_brand AS spec_value FROM p
    UNION ALL
    SELECT url, p_brand, p_name, 'display_type', p_type FROM p
    UNION ALL
    SELECT url, p_brand, p_name, 'weight', CAST(p_size * 7 AS VARCHAR) || ' g' FROM p
    """,
    doc="productz label/cell extract with tooltip fallback (app.js:644-670) — "
    "built-ins; coalesce(cell, tooltip).",
)(_parse_query("productz"))


register(
    "parse_versus",
    oracle=f"""
    WITH p AS (SELECT *, {_URL.format(src='versus')} AS url FROM part)
    SELECT url, p_brand AS brand, p_name AS model, 'screen_size' AS spec_key,
           CAST(p_size AS VARCHAR) || ' in' AS spec_value FROM p
    UNION ALL
    SELECT url, p_brand, p_name, 'price', {_PRICE} FROM p
    """,
    doc="versus embedded window.__data JSON extract (app.js:682-704) — "
    "regexp_extract + from_json + nested explode, zero Python.",
)(_parse_query("versus"))


register(
    "parse_phonearena",
    oracle=f"""
    WITH p AS (SELECT *, {_URL.format(src='phonearena')} AS url FROM part)
    SELECT url, p_brand AS brand, p_name AS model, 'display_size' AS spec_key,
           CAST(p_size AS VARCHAR) || ' inches' AS spec_value FROM p
    UNION ALL
    SELECT url, p_brand, p_name, 'display_type', p_type FROM p
    UNION ALL
    SELECT url, p_brand, p_name, 'hardware_brand', p_brand FROM p
    """,
    doc="phonearena nested block extract with title prefixing (app.js:713-742) — "
    "pandas-UDF parse.",
)(_parse_query("phonearena"))


@register(
    "ingest_specs_per_source",
    oracle=f"""
    WITH ok AS (
      SELECT 'gsmarena' AS source, 3 AS n_specs FROM part WHERE p_partkey % 29 <> 3
      UNION ALL SELECT 'geekbench', 3 FROM part WHERE p_partkey % 29 <> 3
      UNION ALL SELECT 'productz', 3 FROM part
      UNION ALL SELECT 'versus', 2 FROM part
      UNION ALL SELECT 'phonearena', 3 FROM part
    )
    SELECT source, COUNT(*) AS n_records, CAST(SUM(n_specs) AS BIGINT) AS n_spec_values
    FROM ok GROUP BY source
    """,
    doc="End-to-end ingest accounting: records + spec values per source after "
    "parse+normalize across all five crawlers.",
)
def q_ingest_specs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)  # no fan_out: see _parse_query
    outs = []
    for source in PARSERS:
        pages = spec_pages(part, source).filter(F.col("status") == 200)
        normalized = normalize_records(PARSERS[source](pages), source)
        outs.append(
            normalized.select("source", F.size("specs").alias("n_specs"))
        )
    union = outs[0]
    for o in outs[1:]:
        union = union.unionByName(o)
    return union.groupBy("source").agg(
        F.count("*").alias("n_records"),
        F.sum("n_specs").alias("n_spec_values"),
    )


# --- WARC container ingest ----------------------------------------------------


@register(
    "warc_container_records",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id % {WARC_BUCKETS} AS bucket, doc_id,
             length(coalesce(text, '')) AS n,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(coalesce(text, ''), ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> a + b) AS payload_sum
      FROM documents
    ),
    sz AS (
      SELECT *,
             CAST({WARC_FIXED_OVERHEAD} + length(CAST(doc_id AS VARCHAR))
                     + length(CAST(n AS VARCHAR)) + n AS BIGINT) AS rec_size
      FROM r
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(row_number() OVER (PARTITION BY source, bucket ORDER BY doc_id) - 1
                AS BIGINT) AS rec_index,
           CAST(COALESCE(SUM(rec_size) OVER (
                  PARTITION BY source, bucket ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS offset,
           doc_id, CAST(n AS BIGINT) AS content_length, payload_sum
    FROM sz
    ORDER BY source, bucket, rec_index
    """,
    doc="WARC-shaped container ingest, round-tripped and value-certified: "
    "documents are packed into sharded containers (one per source x "
    "doc_id%8 — the CommonCrawl layout) with JVM-side string assembly, "
    "then a REAL byte-level parser (Arrow mapInPandas; magic check, "
    "CRLF header framing, Content-Length-driven payload read, strict "
    "trailer) walks the bytes back and reports every record's offset, "
    "length, id, and payload byte sum. The oracle computes the same "
    "columns INDEPENDENTLY from the documents table (window prefix "
    "sums over the closed-form record size 83+digits(id)+digits(n)+n), "
    "so a value match proves the parser's walk — offsets and all — "
    "against arithmetic, not against a second copy of the parser. "
    "Payload arithmetic is chars==bytes by the pinned ASCII fixture "
    "invariant (tests/test_multimodal.py). Scale: containers are the "
    "unit of parallelism; the build is one groupBy of record strings, "
    "the parse is map-only, record rows never shuffle with payloads.",
)
def q_warc_container_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.warc import parse_warc, warc_containers

    docs = load_table(spark, "documents", sf_dir)
    return parse_warc(warc_containers(docs)).orderBy("source", "bucket", "rec_index")


@register(
    "warc_gzip_member_records",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id % {WARC_BUCKETS} AS bucket, doc_id,
             length(coalesce(text, '')) AS n,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(coalesce(text, ''), ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> a + b) AS payload_sum
      FROM documents
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(row_number() OVER (PARTITION BY source, bucket ORDER BY doc_id) - 1
                AS BIGINT) AS rec_index,
           doc_id, CAST(n AS BIGINT) AS content_length, payload_sum
    FROM r
    ORDER BY source, bucket, rec_index
    """,
    doc="warc.gz container ingest (r14) — the compression convention "
    "CommonCrawl actually ships: every record is an independent gzip "
    "member (deterministic stdlib gzip, mtime=0), members concatenated "
    "per sharded container, which is what makes record-level random "
    "access possible (seek to a member offset, inflate one member, get "
    "one record). The parser walks member boundaries STRICTLY with "
    "zlib.decompressobj — each member must inflate to exactly ONE "
    "well-formed CRLF-framed record (grammar shared with "
    "warc_container_records via _parse_record), truncated/corrupt "
    "members raise with their compressed offset. Compressed sizes "
    "depend on the zlib build, so the oracle certifies the DECODED "
    "stream (per-member doc_id / content_length / payload_sum by "
    "closed-form arithmetic); member framing invariants (offsets "
    "monotone, sizes partition the container, per-member round trip) "
    "are pinned by unit tests. Scale: same as the plain container — "
    "members are compressed record-local in an Arrow batch (no "
    "payload shuffle), containers are the unit of parallelism, and "
    "the wire cost is the DEFLATE-compressed size.",
)
def q_warc_gzip_member_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.warc import parse_warc_gzip, warc_gzip_containers

    docs = load_table(spark, "documents", sf_dir)
    return parse_warc_gzip(warc_gzip_containers(docs)).orderBy(
        "source", "bucket", "rec_index"
    )
