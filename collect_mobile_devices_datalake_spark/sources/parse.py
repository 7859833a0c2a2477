"""Per-source page parsers (reference §2.2 #8-#14).

Contract: every parser takes a ``spec_pages``-shaped DataFrame
``(url, source, status, html)`` and returns
``(url, model_raw, img_url, entries array<struct<key,value>>)`` with
RAW (un-normalized) keys — normalization (to_key, last-wins merge,
brand/model split) is a separate built-in-expression stage, mirroring
the reference's page-context extract vs Node-side normalize split.

Engine choice per source:
- versus / geekbench / productz: fully JVM-side —
  ``regexp_extract(_all)`` + ``from_json`` + ``arrays_zip``. These are
  the hot paths; zero Python.
- gsmarena / phonearena: the structurally recursive formats
  (subtitle-continuation, per-block title prefixing) go through
  Arrow-batched pandas UDFs (``page.evaluate`` analogue, SURVEY §2.8).
  At 100 TB these parallelize per-partition with Arrow transfer; never
  row-at-a-time Python UDFs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

ENTRY_TYPE = ArrayType(
    StructType(
        [StructField("key", StringType()), StructField("value", StringType())]
    )
)


def _zip_entries(keys: Column, values: Column) -> Column:
    """Parallel-array zip → entries; reference #11 (app.js:626-627)."""
    return F.zip_with(
        keys, values, lambda k, v: F.struct(k.alias("key"), v.alias("value"))
    )


# --- versus: embedded JSON (app.js:682-704) — pure built-ins ---------------

VERSUS_SCHEMA = (
    "struct<comparison: struct<"
    "rivals: array<struct<name: string, picture: struct<raw: string>>>, "
    "propGroups: array<struct<reasons: array<struct<"
    "name: string, values: array<string>, unit: string>>>>>>"
)

VERSUS_DATA_REGEX = r"<script>window\.__data=(.*\}\}\})</script>"


def parse_versus(pages: DataFrame) -> DataFrame:
    blob = F.regexp_extract("html", VERSUS_DATA_REGEX, 1)
    parsed = pages.select(
        "url", F.from_json(blob, VERSUS_SCHEMA).alias("d")
    ).select(
        "url",
        F.col("d.comparison.rivals")[0]["name"].alias("model_raw"),
        F.col("d.comparison.rivals")[0]["picture"]["raw"].alias("img_url"),
        F.col("d.comparison.propGroups").alias("groups"),
    )
    # reasons[].name → key; values CSV + unit suffix → value (app.js:700-703)
    entries = F.flatten(
        F.transform(
            F.col("groups"),
            lambda g: F.transform(
                g["reasons"],
                lambda r: F.struct(
                    r["name"].alias("key"),
                    F.trim(
                        F.concat(
                            F.array_join(r["values"], ","),
                            F.coalesce(r["unit"], F.lit("")),
                        )
                    ).alias("value"),
                ),
            ),
        )
    )
    return parsed.select("url", "model_raw", "img_url", entries.alias("entries"))


# --- geekbench: fixed positions + parallel arrays (app.js:599-627) ----------


def parse_geekbench(pages: DataFrame) -> DataFrame:
    model = F.regexp_extract("html", r'<div class="model">([^<]*)</div>', 1)
    cpu = F.regexp_extract("html", r'<div class="cpu">([^<]*)</div>', 1)
    keys = F.regexp_extract_all(
        "html", F.lit(r'<span class="description">([^<]*)</span>'), 1
    )
    vals = F.regexp_extract_all("html", F.lit(r'<span class="score">([^<]*)</span>'), 1)
    fixed = F.array(
        F.struct(F.lit("cpu").alias("key"), cpu.alias("value")),
    )
    # length-mismatch rows are quarantined by the caller via entries IS NULL
    zipped = F.when(F.size(keys) == F.size(vals), _zip_entries(keys, vals))
    return pages.select(
        "url",
        model.alias("model_raw"),
        F.lit(None).cast("string").alias("img_url"),
        F.concat(fixed, zipped).alias("entries"),
    )


# --- productz: label/cell rows with tooltip fallback (app.js:644-670) -------


def parse_productz(pages: DataFrame) -> DataFrame:
    row_rx = r"<th><label>([^<]*)</label></th><td[^>]*>([^<]*)</td>"
    labels = F.regexp_extract_all("html", F.lit(row_rx), 1)
    cells = F.regexp_extract_all("html", F.lit(row_rx), 2)
    tooltips = F.regexp_extract_all(
        "html", F.lit(r'<th><label>[^<]*</label></th><td(?: data-tooltip="([^"]*)")?>[^<]*</td>'), 1
    )
    # tooltip fallback when the cell text is empty (app.js:660)
    values = F.zip_with(
        cells,
        tooltips,
        lambda c, t: F.when(F.trim(c) == "", t).otherwise(F.trim(c)),
    )
    model = F.regexp_extract("html", r'<h1 class="title">([^<]*)</h1>', 1)
    img = F.regexp_extract("html", r'<img data-src="([^"]*)">', 1)
    return pages.select(
        "url",
        model.alias("model_raw"),
        img.alias("img_url"),
        _zip_entries(labels, values).alias("entries"),
    )


# --- gsmarena: spec table with continuation rule (app.js:547-566) -----------


@pandas_udf(ENTRY_TYPE)
def _gsmarena_entries(html: pd.Series) -> pd.Series:
    ttl_nfo = re.compile(
        r'<td class="ttl">(.*?)</td><td class="nfo">(.*?)</td>', re.S
    )
    title_rx = re.compile(r"<th>(.*?)</th>", re.S)

    def one(h: str):
        if not h:
            return []
        m = title_rx.search(h)
        title = m.group(1) if m else ""
        out: list[dict] = []
        prev_key = None
        # reproduces app.js:556-564: 1-char subtitles append to the previous
        # key's value with a ' ' separator; others start a new key.
        for sub, content in ttl_nfo.findall(h):
            if len(sub) == 1 and prev_key is not None:
                for e in out:
                    if e["key"] == prev_key:
                        e["value"] += " " + content.strip()
                        break
            else:
                key = f"{title}_{sub}"
                out.append({"key": key, "value": content.strip()})
                prev_key = key
        return out

    return html.map(one)


def parse_gsmarena(pages: DataFrame) -> DataFrame:
    model = F.regexp_extract("html", r'<h1 class="specs-phone-name-title">([^<]*)</h1>', 1)
    img = F.regexp_extract("html", r'<img class="specs-photo-main" src="([^"]*)">', 1)
    return pages.select(
        "url",
        model.alias("model_raw"),
        img.alias("img_url"),
        _gsmarena_entries("html").alias("entries"),
    )


# --- phonearena: nested blocks with title prefixing (app.js:713-742) --------


@pandas_udf(ENTRY_TYPE)
def _phonearena_entries(html: pd.Series) -> pd.Series:
    block_rx = re.compile(r'<div class="specs-table">(.*?)</div>\s*</div>|<div class="specs-table">(.*?)$', re.S)
    header_rx = re.compile(r'<div class="media-header"><h3>(.*?)</h3></div>', re.S)
    body_rx = re.compile(r'<div class="media-body"><span>(.*?)</span><span>(.*?)</span></div>', re.S)

    def one(h: str):
        if not h:
            return []
        out: list[dict] = []
        # split into blocks on the block-open marker; the reference walks
        # .specs-table nodes and prefixes row keys with the block title
        for block in h.split('<div class="specs-table">')[1:]:
            m = header_rx.search(block)
            title = m.group(1) if m else ""
            for k, v in body_rx.findall(block):
                out.append({"key": f"{title}_{k}", "value": v.strip()})
        return out

    return html.map(one)


def parse_phonearena(pages: DataFrame) -> DataFrame:
    model = F.regexp_extract("html", r'<h1 class="model">([^<]*)</h1>', 1)
    return pages.select(
        "url",
        model.alias("model_raw"),
        F.lit(None).cast("string").alias("img_url"),
        _phonearena_entries("html").alias("entries"),
    )


PARSERS = {
    "gsmarena": parse_gsmarena,
    "geekbench": parse_geekbench,
    "productz": parse_productz,
    "versus": parse_versus,
    "phonearena": parse_phonearena,
}
