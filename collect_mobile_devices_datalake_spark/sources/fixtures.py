"""Deterministic fixture pages (FIXTURES.md §B3) rendered from ``part``.

The reference fetches live HTML with a headless browser (app.js:43-96);
this repo never touches the network. Instead each source's page format
is *rendered* from the driver's ``part`` table with pure ``concat``
expressions — JVM-side, deterministic at any scale — and the parse
operators must invert the rendering. That round-trip (parse(render(x))
== x, oracle recomputed from ``part`` directly) is what the driver
hash-checks.

Page shapes mirror what each crawler extracts:
- gsmarena  (app.js:547-566): spec table with .ttl/.nfo pairs under a
  <th> group title; 1-char subtitles CONTINUE the previous key.
- geekbench (app.js:599-621): fixed-position fields + parallel arrays
  of benchmark name/score.
- productz  (app.js:644-670): th>label / td rows where an empty cell
  falls back to a tooltip attribute.
- versus    (app.js:682-704): embedded ``window.__data`` JSON blob.
- phonearena(app.js:713-742): nested media-header/media-body blocks
  with first-title prefixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def page_url(source: str) -> Column:
    return F.concat(
        F.lit(f"https://example.com/devices/{source}/p_"),
        F.col("p_partkey").cast("string"),
    )


def _c(*parts) -> Column:
    return F.concat(*[F.lit(p) if isinstance(p, str) else p for p in parts])


def gsmarena_pages(part: DataFrame) -> DataFrame:
    """Spec-table page; includes the 1-char-subtitle continuation row."""
    html = _c(
        '<h1 class="specs-phone-name-title">', F.col("p_brand"), " ", F.col("p_name"), "</h1>",
        '<img class="specs-photo-main" src="https://img.example.com/', F.col("p_partkey").cast("string"), '.jpg">',
        '<div id="specs-list"><table><tr><th>General</th></tr><tbody>',
        '<td class="ttl">Brand</td><td class="nfo">', F.col("p_brand"), "</td>",
        '<td class="ttl">Type</td><td class="nfo">', F.col("p_type"), "</td>",
        '<td class="ttl">+</td><td class="nfo">', F.col("p_name"), "</td>",
        '<td class="ttl">Retail Price</td><td class="nfo">', F.col("p_retailprice").cast("decimal(10,2)").cast("string"), "</td>",
        "</tbody></table></div>",
    )
    return part.select(
        page_url("gsmarena").alias("url"),
        F.lit("gsmarena").alias("source"),
        F.when(F.col("p_partkey") % 29 == 3, 404).otherwise(200).alias("status"),
        html.alias("html"),
    )


def geekbench_pages(part: DataFrame) -> DataFrame:
    """Fixed-position fields + parallel benchmark name/score lists.

    Unlike the other sources, the URL carries a device-class segment the
    way the reference's geekbench URLs do (``…com/ios_devices/…`` /
    ``…com/android_devices/…``): app.js:629-635 derives
    ``device = url.split('com/')[1].split('_')[0]`` and forces
    brand='Apple' (model unshifted) when it is ``ios``. Every 7th part
    (p_partkey % 7 == 1) renders as an ios page so the override path is
    exercised end-to-end.
    """
    device = F.when(F.col("p_partkey") % 7 == 1, "ios").otherwise("android")
    url = _c(
        "https://example.com/", device, "_devices/geekbench/p_",
        F.col("p_partkey").cast("string"),
    )
    html = _c(
        '<div class="model">', F.col("p_brand"), " ", F.col("p_name"), "</div>",
        '<div class="cpu">armv8 ', (F.col("p_size") * 100).cast("string"), " MHz</div>",
        '<span class="description">Single-Core Score</span>',
        '<span class="description">Multi-Core Score</span>',
        '<span class="score">', (F.col("p_size") * 13).cast("string"), "</span>",
        '<span class="score">', (F.col("p_size") * 47).cast("string"), "</span>",
    )
    return part.select(
        url.alias("url"),
        F.lit("geekbench").alias("source"),
        F.when(F.col("p_partkey") % 29 == 3, 500).otherwise(200).alias("status"),
        html.alias("html"),
    )


def productz_pages(part: DataFrame) -> DataFrame:
    """th>label / td rows; every third row's cell is empty with a tooltip."""
    tooltip_row = F.when(
        F.col("p_partkey") % 3 == 0,
        _c('<th><label>Weight</label></th><td data-tooltip="', (F.col("p_size") * 7).cast("string"), ' g"></td>'),
    ).otherwise(
        _c("<th><label>Weight</label></th><td>", (F.col("p_size") * 7).cast("string"), " g</td>")
    )
    html = _c(
        '<h1 class="title">', F.col("p_brand"), " ", F.col("p_name"), "</h1>",
        '<img data-src="https://img.example.com/pz/', F.col("p_partkey").cast("string"), '.jpg">',
        "<table>",
        "<th><label>Brand</label></th><td>", F.col("p_brand"), "</td>",
        "<th><label>Display Type</label></th><td>", F.col("p_type"), "</td>",
        tooltip_row,
        "</table>",
    )
    return part.select(
        page_url("productz").alias("url"),
        F.lit("productz").alias("source"),
        F.lit(200).alias("status"),
        html.alias("html"),
    )


def versus_pages(part: DataFrame) -> DataFrame:
    """Embedded window.__data JSON (regex target ends in '}}}', app.js:682)."""
    # NB: the blob must end in '}}}' — the reference regex is
    # /window\.__data=(.*}}})/ (app.js:682) and real payloads close three
    # nested objects; the trailing meta object reproduces that.
    payload = _c(
        '{"comparison":{"rivals":[{"name":"', F.col("p_brand"), " ", F.col("p_name"),
        '","picture":{"raw":"https://img.example.com/vs/', F.col("p_partkey").cast("string"), '.jpg"}}],',
        '"propGroups":[{"reasons":[',
        '{"name":"Screen Size","values":["', F.col("p_size").cast("string"), '"],"unit":" in"},',
        '{"name":"Price","values":["', F.col("p_retailprice").cast("decimal(10,2)").cast("string"), '"],"unit":null}',
        ']}],"meta":{"loaded":{"ok":true}}}}',
    )
    html = _c("<html><script>window.__data=", payload, "</script></html>")
    return part.select(
        page_url("versus").alias("url"),
        F.lit("versus").alias("source"),
        F.lit(200).alias("status"),
        html.alias("html"),
    )


def phonearena_pages(part: DataFrame) -> DataFrame:
    """Nested spec blocks: header title + body rows (sub-rows get prefixed)."""
    html = _c(
        '<h1 class="model">', F.col("p_brand"), " ", F.col("p_name"), "</h1>",
        '<div class="specs-table">',
        '<div class="media-header"><h3>Display</h3></div>',
        '<div class="media-body"><span>Size</span><span>', F.col("p_size").cast("string"), " inches</span></div>",
        '<div class="media-body"><span>Type</span><span>', F.col("p_type"), "</span></div>",
        "</div>",
        '<div class="specs-table">',
        '<div class="media-header"><h3>Hardware</h3></div>',
        '<div class="media-body"><span>Brand</span><span>', F.col("p_brand"), "</span></div>",
        "</div>",
    )
    return part.select(
        page_url("phonearena").alias("url"),
        F.lit("phonearena").alias("source"),
        F.lit(200).alias("status"),
        html.alias("html"),
    )


RENDERERS = {
    "gsmarena": gsmarena_pages,
    "geekbench": geekbench_pages,
    "productz": productz_pages,
    "versus": versus_pages,
    "phonearena": phonearena_pages,
}


def spec_pages(part: DataFrame, source: str) -> DataFrame:
    return RENDERERS[source](part)
