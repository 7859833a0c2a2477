"""Iterative graph algorithms over lake tables (generic driver-loop form).

The reference's only iterative dataflow is the frontier BFS of its
crawler (app.js:156-194); this module generalizes that pattern to the
other canonical lake-graph workload: PageRank over the bipartite
customer↔part purchase graph (lineitem ⋈ orders). The same loop shape
(join → aggregate → checkpoint barrier → repeat) serves label
propagation (``dedup_clusters``) and BFS (``frontier_bfs``).

Determinism for the oracle gate: per-edge contributions ``pr/outdeg``
are doubles (IEEE-identical in any engine); each is cast to
DECIMAL(28,18) *before* the sum so the aggregate is exact decimal
addition — associative, partition-order independent — then cast back to
double (via VARCHAR in DuckDB, see memory gotchas). Every per-iteration
value is therefore bit-identical across engines with no rounding slack.

Scale: edges are written once, repartitioned on src, and checkpointed —
each of the k iterations re-joins against that stable partitioning, so
only the (small) rank table moves per round. At 100 TB the checkpoint
becomes a persisted bucketed table and the loop is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..session import load_table

DAMPING = 0.85
ITERS = 3

_EDGES_SQL = """
    pairs AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
                      'p' || CAST(l.l_partkey AS VARCHAR) AS pnode
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT cnode AS src, pnode AS dst FROM pairs
      UNION ALL
      SELECT pnode, cnode FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT node FROM deg),
    n_total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)
"""


def _pagerank_oracle(iters: int) -> str:
    ctes = [_EDGES_SQL.strip(), "pr0 AS (SELECT node, 1.0 / (SELECT n FROM n_total) AS pr FROM nodes)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""s{k} AS (
      SELECT e.dst AS node,
             CAST(CAST(SUM(CAST(p.pr / d.outdeg AS DECIMAL(28,18))) AS VARCHAR) AS DOUBLE) AS contrib
      FROM edges e JOIN pr{k - 1} p ON e.src = p.node JOIN deg d ON d.node = e.src
      GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"""pr{k} AS (
      SELECT n.node,
             (1.0 - CAST({DAMPING} AS DOUBLE)) / (SELECT n FROM n_total)
               + CAST({DAMPING} AS DOUBLE) * COALESCE(s.contrib, 0.0) AS pr
      FROM nodes n LEFT JOIN s{k} s ON n.node = s.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, round(pr, 12) AS pagerank FROM pr{iters}"
    )


def pagerank(edges: DataFrame, iters: int = ITERS, damping: float = DAMPING) -> DataFrame:
    """PageRank over a directed edge list (src, dst); returns (node, pagerank)."""
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    # fold outdegree into the edge ONCE: each iteration then needs a single
    # join (vs edges⋈pr⋈deg), against a partitioning that never changes.
    # Keep od (not 1/od): pr/od must stay the same IEEE division the oracle
    # performs — pr * (1/od) rounds differently.
    edges_w = (
        edges.join(deg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", F.col("outdeg").alias("od"))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    n_total = deg.count()
    base = (1.0 - damping) / n_total
    pr = deg.select("node", (F.lit(1.0) / n_total).alias("pr"))
    # size the per-iteration shuffles to the edge list, not the session
    # default — round overhead dominates small graphs otherwise
    from ..session import scoped_shuffle_width

    with scoped_shuffle_width(edges.sparkSession, max(edges_w.count(), 1)):
        pr = _pagerank_rounds(edges_w, deg, pr, iters, damping, base)
    return pr.select("node", F.round("pr", 12).alias("pagerank"))


def _pagerank_rounds(edges_w, deg, pr, iters, damping, base):
    for _ in range(iters):
        contrib = (
            edges_w.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum((F.col("pr") / F.col("od")).cast("decimal(28,18)"))
                .cast("double")
                .alias("contrib")
            )
        )
        pr = (
            deg.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr


@register(
    "pagerank_purchase_graph",
    oracle=_pagerank_oracle(ITERS),
    doc=f"PageRank ({ITERS} iterations, d={DAMPING}) over the bipartite "
    "customer↔part purchase graph; symmetric edges so every node has "
    "outdegree ≥ 1 (no dangling mass). Value-level oracle: contributions "
    "decimal-routed per iteration, so Spark and DuckDB agree bit-for-bit.",
)
def q_pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cnode"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("pnode"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("cnode").alias("src"), F.col("pnode").alias("dst")).unionAll(
        pairs.select(F.col("pnode").alias("src"), F.col("cnode").alias("dst"))
    )
    return pagerank(edges)


_COEDGES_SQL = """
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
"""


@register(
    "copurchase_triangles",
    oracle=f"""
    WITH e AS ({_COEDGES_SQL}),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    corners AS (
      SELECT a AS node FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node
    """,
    doc="Triangle counting on the co-purchase graph (parts bought together "
    "in >=2 orders), with LOW-DEGREE→HIGH-DEGREE edge orientation: every "
    "triangle has exactly one node with two out-edges in this orientation, "
    "so the wedge join enumerates each triangle once while out-degrees are "
    "bounded by sqrt(m) — on a skewed co-purchase graph the id-ordered "
    "orientation gives hub nodes O(d^2) wedges, the degree orientation "
    "does not. The closing-edge check runs against the canonical "
    "(id-ordered) edge list, so results are identical to the oracle's "
    "id-oriented enumeration.",
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("pa", "pb")
        # the filtered edge list feeds the degree agg, the wedge join and
        # the closing-edge check — materialize once
        .localCheckpoint(eager=True)
    )
    # undirected degree per node, then orient each edge from the endpoint
    # that is smaller in the (degree, id) total order to the larger one
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("pb"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("pa") < F.col("pb"))
    )
    oriented = (
        edges.join(da, "pa")
        .join(db, "pb")
        .select(
            F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    # wedges: unordered out-neighbor pairs of one source, id-ordered so the
    # closing pair (v, w) with v < w matches the canonical edge list directly
    w1 = oriented.alias("w1")
    w2 = oriented.alias("w2")
    tri = (
        w1.join(
            w2,
            (F.col("w1.src") == F.col("w2.src"))
            & (F.col("w1.dst") < F.col("w2.dst")),
        )
        .join(
            edges.alias("c"),
            (F.col("c.pa") == F.col("w1.dst")) & (F.col("c.pb") == F.col("w2.dst")),
            "left_semi",
        )
        .select(
            F.col("w1.src").alias("a"),
            F.col("w1.dst").alias("b"),
            F.col("w2.dst").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select("b"))
        .unionAll(tri.select("c"))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


ASSOC_MIN_SUPPORT = 3
ASSOC_TOPK = 50


@register(
    "copurchase_association_rules",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    n_baskets AS (SELECT COUNT(DISTINCT basket) AS n FROM baskets),
    supp AS (SELECT item, COUNT(*) AS s FROM baskets GROUP BY item),
    pair_supp AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS s_ab
      FROM baskets a JOIN baskets b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= {ASSOC_MIN_SUPPORT}
    )
    SELECT item_a, item_b, s_ab,
           sa.s AS s_a, sb.s AS s_b,
           round(s_ab / CAST(sa.s AS DOUBLE), 6) AS confidence_ab,
           round((s_ab * nb.n) / (CAST(sa.s AS DOUBLE) * sb.s), 6) AS lift,
           rk
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY (s_ab * (SELECT n FROM n_baskets))
                 / (CAST((SELECT s FROM supp WHERE item = p.item_a) AS DOUBLE)
                    * (SELECT s FROM supp WHERE item = p.item_b)) DESC,
                 item_a, item_b) AS rk
      FROM pair_supp p
    ) ranked
    JOIN supp sa ON sa.item = ranked.item_a
    JOIN supp sb ON sb.item = ranked.item_b
    CROSS JOIN n_baskets nb
    WHERE rk <= {ASSOC_TOPK}
    """,
    doc=f"Market-basket association rules over order baskets: pair "
    f"support (min {ASSOC_MIN_SUPPORT}), confidence and lift per "
    f"co-purchased part pair, top-{ASSOC_TOPK} by lift with a "
    "deterministic tiebreak. Counts are integers; confidence/lift are "
    "single IEEE divisions of integers — engine-exact. The pair join "
    "is basket-keyed (bounded fan-out per order, the same shape as "
    "copurchase_triangles); supports broadcast back onto the ranked "
    "pairs. The FP-growth-lite primitive behind 'customers who bought "
    "X also bought Y'.",
)
def q_copurchase_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    n_baskets = baskets.select("basket").distinct().count()
    supp = baskets.groupBy("item").agg(F.count("*").alias("s"))
    a = baskets.select("basket", F.col("item").alias("item_a"))
    b = baskets.select("basket", F.col("item").alias("item_b"))
    pair_supp = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("s_ab"))
        .filter(F.col("s_ab") >= ASSOC_MIN_SUPPORT)
    )
    sa = supp.select(F.col("item").alias("item_a"), F.col("s").alias("s_a"))
    sb = supp.select(F.col("item").alias("item_b"), F.col("s").alias("s_b"))
    scored = (
        pair_supp.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "s_ab",
            "s_a",
            "s_b",
            ((F.col("s_ab") * n_baskets) / (F.col("s_a").cast("double") * F.col("s_b"))).alias("lift_raw"),
        )
    )
    w = Window.orderBy(F.desc("lift_raw"), "item_a", "item_b")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ASSOC_TOPK)
        .select(
            "item_a",
            "item_b",
            "s_ab",
            "s_a",
            "s_b",
            F.round(F.col("s_ab") / F.col("s_a").cast("double"), 6).alias("confidence_ab"),
            F.round("lift_raw", 6).alias("lift"),
            "rk",
        )
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    outs AS (SELECT from_type, SUM(n) AS n_out FROM trans GROUP BY 1)
    SELECT t.from_type, t.to_type, t.n,
           CAST(o.n_out AS BIGINT) AS n_out,
           round(t.n / CAST(o.n_out AS DOUBLE), 6) AS p
    FROM trans t JOIN outs o USING (from_type)
    ORDER BY from_type, to_type
    """,
    doc="First-order Markov transition matrix of user behavior: for each "
    "(event_type -> next event_type) bigram in every user's time-ordered "
    "stream, the transition count and conditional probability. One "
    "window over the user partition (the sessionization shuffle), one "
    "aggregate over |types|^2 cells. Integer counts, single exact "
    "division — the behavioral-analytics primitive under next-action "
    "prediction and funnel-leak diagnosis.",
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    outs = trans.groupBy("from_type").agg(F.sum("n").alias("n_out"))
    return (
        trans.join(F.broadcast(outs), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.col("n_out").cast("long").alias("n_out"),
            F.round(F.col("n") / F.col("n_out").cast("double"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )
