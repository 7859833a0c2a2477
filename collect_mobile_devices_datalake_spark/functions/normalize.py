"""Normalization scalar operators (reference §2.2, all built-in expressions).

Every function here is a pure Column→Column expression — JVM-side,
whole-stage-codegen friendly, zero Python in the hot path. Reference
semantics reproduced bit-for-bit:

- ``to_key``        — app.js:99  (lowercase; whitespace + punctuation class → ``_``)
- ``strip_trailing_underscores`` — app.js:100 (``replace(/_+$/g,'')`` on merged keys)
- ``merge_last_wins`` — app.js:100 (array-of-single-key-objects fold, last wins)
- ``brand_model_split`` — app.js:579-582, 629-635 (head token = brand, rest = model,
  geekbench ``device=='ios'`` forces brand='Apple' and keeps the full model string)
- ``value_unit_concat`` — app.js:702 (array→CSV then unit suffix, trimmed)
- ``url_dequery``   — app.js:73 (strip ``?query`` / ``#fragment``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# app.js:99 — /\s|[!"#$%&'()*+,-./:;<=>?@\[\]\^`{|}~]/g  (JS char class; the
# `,-.` run is the literal range ',' '-' '.', which we keep as an escaped '-').
KEY_PUNCT_REGEX = "[\\s!\"#$%&'()*+,\\-./:;<=>?@\\[\\]\\^`{|}~]"


def to_key(col: Column | str) -> Column:
    """Normalize a raw heading into a column key (app.js:99)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), KEY_PUNCT_REGEX, "_")


def strip_trailing_underscores(col: Column | str) -> Column:
    """Strip trailing ``_`` runs from a merged key (app.js:100)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "_+$", "")


def merge_last_wins(entries: Column | str) -> Column:
    """Fold ``array<struct<key,value>>`` → ``map<string,string>``, last-wins.

    Reference ``merge_array_object`` (app.js:100) reduces an array of
    single-key objects into one object; later duplicates overwrite earlier
    ones and keys lose trailing underscores. ``map_from_entries`` under
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set in session.py) is the
    exact distributed equivalent — no UDF.
    """
    c = F.col(entries) if isinstance(entries, str) else entries
    cleaned = F.transform(
        c,
        lambda e: F.struct(
            strip_trailing_underscores(e["key"]).alias("key"),
            e["value"].alias("value"),
        ),
    )
    return F.map_from_entries(cleaned)


def brand_model_split(model: Column | str, device: Column | None = None) -> Column:
    """Split a raw model string into ``struct<brand,model>``.

    app.js:579-582: ``brand = tokens[0]``; if more than one token, the rest
    (space-joined) becomes the model, else model stays the single token.
    app.js:630-635 (geekbench): when ``device == 'ios'`` brand is forced to
    'Apple' and the model string is NOT shifted.
    """
    m = F.col(model) if isinstance(model, str) else model
    toks = F.split(m, " ")
    head = F.element_at(toks, 1)
    rest = F.array_join(F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))), " ")
    plain_brand = head
    plain_model = F.when(F.size(toks) > 1, rest).otherwise(m)
    if device is None:
        return F.struct(plain_brand.alias("brand"), plain_model.alias("model"))
    is_ios = device == F.lit("ios")
    brand = F.when(is_ios, F.lit("Apple")).otherwise(plain_brand)
    model_out = F.when(is_ios, m).otherwise(plain_model)
    return F.struct(brand.alias("brand"), model_out.alias("model"))


def value_unit_concat(values: Column | str, unit: Column | str) -> Column:
    """``(values.toString() + (unit ?? '')).trim()`` (app.js:702).

    JS ``Array.toString()`` is a comma join with no spaces.
    """
    v = F.col(values) if isinstance(values, str) else values
    u = F.col(unit) if isinstance(unit, str) else unit
    return F.trim(F.concat(F.array_join(v, ","), F.coalesce(u, F.lit(""))))


def url_dequery(col: Column | str) -> Column:
    """Drop ``?query`` and ``#fragment`` from a URL (app.js:73)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[?#].*$", "")
