"""Property-based tests: Spark normalization vs an independent Python
reference implementation of the reference's JS semantics.

Hypothesis generates adversarial strings; they're run through Spark in
ONE batch per property (a per-example SparkSession round-trip would be
seconds per case).
"""

from __future__ import annotations

import re
import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.functions.normalize import (
    brand_model_split,
    to_key,
    strip_trailing_underscores,
)

# independent reimplementation of app.js:99-100 (JS regex semantics)
_JS_CLASS = re.compile(r"[\s!\"#$%&'()*+,\-./:;<=>?@\[\]\^`{|}~]")


def py_to_key(t: str) -> str:
    return _JS_CLASS.sub("_", t.lower())


def py_strip(t: str) -> str:
    return re.sub(r"_+$", "", t)


TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + string.punctuation + " \t",
    min_size=0,
    max_size=40,
)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_to_key_matches_js_reference(spark, data):
    cases = [data.draw(TEXT) for _ in range(80)]
    df = spark.createDataFrame([(c,) for c in cases], "raw string")
    got = [
        r["k"]
        for r in df.select(
            strip_trailing_underscores(to_key(F.col("raw"))).alias("k")
        ).collect()
    ]
    want = [py_strip(py_to_key(c)) for c in cases]
    assert got == want


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_brand_model_split_invariants(spark, data):
    # non-empty tokens, no spaces inside tokens
    token = st.text(alphabet=string.ascii_letters, min_size=1, max_size=8)
    models = [
        " ".join(data.draw(st.lists(token, min_size=1, max_size=4)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(m,) for m in models], "m string")
    rows = df.select(F.col("m"), brand_model_split(F.col("m")).alias("s")).collect()
    for r in rows:
        toks = r["m"].split(" ")
        assert r["s"]["brand"] == toks[0]
        if len(toks) > 1:
            assert r["s"]["model"] == " ".join(toks[1:])
            assert r["m"] == f"{r['s']['brand']} {r['s']['model']}"
        else:
            assert r["s"]["model"] == r["m"]


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_rolling_hash_matches_python(spark, data):
    from collect_mobile_devices_datalake_spark.functions.text import rolling_hash

    cases = [data.draw(st.text(alphabet=string.printable[:94], min_size=0, max_size=30))
             for _ in range(60)]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["h"] for r in df.select(rolling_hash(F.col("s")).alias("h")).collect()]

    def py_hash(s: str, mod=1_000_000_007, base=31) -> int:
        acc = 0
        for ch in s:
            acc = (acc * base + ord(ch)) % mod
        return acc

    assert got == [py_hash(c) for c in cases]


# --- middle-pair-sum exact median (order_value_outliers_mad et al.) --------

@given(
    st.lists(
        st.integers(min_value=0, max_value=10**6).map(lambda c: c / 100.0),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_middle_pair_sum_is_twice_the_median(vals):
    """The conditional-sum formula med2 = v[(n+1)//2] + v[(n+2)//2] used by
    the MAD operators must equal 2x the interpolated median for every list
    of 2-decimal values (DuckDB evaluates the same SQL shape the oracles
    use; Spark parity is covered by the oracle gate). The reference is
    computed in exact rationals — float statistics.median already loses
    ULPs that the DECIMAL formula does not."""
    import duckdb

    rows = ", ".join(f"({i}, {v!r})" for i, v in enumerate(vals))
    med2 = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT CAST(v AS DECIMAL(18,4)) AS p,
                 row_number() OVER (ORDER BY v, i) AS rn,
                 COUNT(*) OVER () AS cnt
          FROM (VALUES {rows}) t(i, v)
        )
        SELECT SUM(CASE WHEN rn = (cnt + 1) // 2 THEN p ELSE 0 END)
               + SUM(CASE WHEN rn = (cnt + 2) // 2 THEN p ELSE 0 END)
        FROM ranked
        """
    ).fetchone()[0]
    from fractions import Fraction

    srt = sorted(vals)
    n = len(srt)
    want = Fraction(str(srt[(n - 1) // 2])) + Fraction(str(srt[n // 2]))
    assert Fraction(med2) == want


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 500)),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    )
)
def test_priority_sample_matches_python_reference(spark, corpus):
    """The DLT sample is a pure function of (doc_id, n_chars): a plain
    Python reimplementation of the two-step-Lehmer priority and the
    top-K cut must select the SAME documents with the SAME tau and
    estimates for any corpus, including populations smaller than K
    (tau = 0, estimates collapse to exact masses)."""
    from collect_mobile_devices_datalake_spark.operators.selection import (
        _PRI_K,
        _PRI_MOD,
        _PRI_MULT,
        _PRI_SEED,
    )
    from collect_mobile_devices_datalake_spark.streaming.sample_maintenance import (
        priority_partial,
    )

    def u2(doc_id: int) -> int:
        u1 = ((doc_id + _PRI_SEED) * _PRI_MULT) % _PRI_MOD
        return ((u1 + 1) * _PRI_MULT) % _PRI_MOD + 1

    expect = sorted(
        ((((n + 1) * _PRI_MOD) // u2(d), d) for d, n in corpus),
        key=lambda t: (-t[0], t[1]),
    )[: _PRI_K + 1]
    df = spark.createDataFrame(
        [(d, "s", n) for d, n in corpus], "doc_id long, source string, n_chars long"
    )
    got = [(r.pri, r.doc_id) for r in priority_partial(df).collect()]
    assert got == expect


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-2.0, 2.0, allow_nan=False, width=32), min_size=64, max_size=64),
        min_size=1,
        max_size=8,
    )
)
def test_jl_projection_matches_python_reference(spark, vecs):
    """The JL projected vector is a pure function of the embedding: a
    plain-Python reimplementation of the nonlinear sign hash and the
    left-to-right fold must reproduce Spark's projection bit-for-bit
    (the property the DuckDB oracle relies on)."""
    from collect_mobile_devices_datalake_spark.operators.retrieval import (
        _JL_C1,
        _JL_C2,
        _JL_D,
        _JL_MOD,
        JL_DIMS,
    )

    def sign(i: int, j: int) -> float:
        u = (i * _JL_C2 + j * _JL_C1 + 12345) % _JL_MOD
        return 1.0 if (u * u) % _JL_MOD % 2 == 0 else -1.0

    dp = JL_DIMS[-1]
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(dp - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.lit(_JL_D - 1)),
                lambda v, i: F.when(
                    (
                        ((i * F.lit(_JL_C2) + j * F.lit(_JL_C1) + F.lit(12345)) % F.lit(_JL_MOD))
                        * ((i * F.lit(_JL_C2) + j * F.lit(_JL_C1) + F.lit(12345)) % F.lit(_JL_MOD))
                    )
                    % F.lit(_JL_MOD)
                    % 2
                    == 0,
                    v.cast("double"),
                ).otherwise(-v.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    got = {r.vec_id: r.p for r in df.select("vec_id", proj.alias("p")).collect()}
    import numpy as np

    for k, v in enumerate(vecs):
        v32 = [float(np.float32(x)) for x in v]  # array<float> storage rounding
        for j in range(dp):
            acc = 0.0
            for i in range(_JL_D):
                acc = acc + sign(i, j) * v32[i]
            assert got[k][j] == acc, (k, j, got[k][j], acc)


def test_hll_rho_formula_matches_bit_length():
    """rho = 23 − length(bin(w)) (w > 0) equals the leading-zero rank of
    the 22-bit window + 1, for every boundary and a random sweep — the
    arithmetic both engines compute via minimal-width binary strings."""
    import random

    def rho(w: int) -> int:
        return 23 if w == 0 else 23 - w.bit_length()

    def rho_ref(w: int) -> int:
        # count leading zeros of the 22-bit window, +1
        for k in range(22):
            if w & (1 << (21 - k)):
                return k + 1
        return 23

    rng = random.Random(42)
    samples = {0, 1, 2, 3, (1 << 21), (1 << 22) - 1} | {
        rng.randrange(1 << 22) for _ in range(2000)
    }
    for w in samples:
        assert rho(w) == rho_ref(w), w
    # every hash value splits into a valid register/window pair
    for h in [0, 255, 256, 1_000_000_006] + [rng.randrange(1_000_000_007) for _ in range(500)]:
        assert 0 <= (h & 255) < 256
        assert 0 <= (h >> 8) < (1 << 22)
