"""Iterative graph algorithms over the KG edge list.

PageRank with a FIXED iteration count: deterministic given the edge set,
so DuckDB can replay the exact computation (chained CTEs, one per
iteration) and the lane gets a value-level oracle even though the
algorithm is iterative — the same no-hand-waving standard as the LSH
and HLL lanes. Float note: per-term arithmetic is identical IEEE
binary64 in both engines; only aggregation ORDER differs, bounding
cross-engine divergence around 1e-13 after 5 iterations — 7 orders of
magnitude below the round(6) reporting grain.

Scale design: each iteration is one equi-join (edges x ranks on src)
plus one groupBy(dst) — shuffles keyed on node ids (high-cardinality,
uniform). Ranks never leave the cluster; the only driver scalar is the
node count. ``localCheckpoint`` per iteration keeps the plan flat at
depth k instead of compounding k joins (the CC lesson,
operators/canonicalize.py).

Dangling-node convention: rank mass flowing into sink nodes is NOT
redistributed (sum of ranks < 1 when sinks exist) — the simplest
convention that both engines state identically; documented rather than
hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
TELEPORT = 0.15  # literal, NOT 1-DAMPING: Python's 1-0.85 is a
# different binary64 than the SQL literal 0.15 both engines parse


def pagerank(edges: DataFrame, iterations: int = 5,
             redistribute_dangling: bool = False) -> DataFrame:
    """(src, dst) edge list -> (node, rank) after ``iterations`` steps.

    Edges are deduplicated to simple directed pairs first (parallel
    predicates between the same nodes count once — the convention the
    oracle replays). Returns the UNROUNDED rank; callers round for
    cross-engine comparison.

    ``redistribute_dangling=False`` (default, the convention the
    kg_pagerank lane's oracle replays): sink-node mass is DROPPED, so
    **sum of ranks < 1 whenever sinks exist** — a downstream consumer
    expecting the canonical probability distribution must pass
    ``redistribute_dangling=True``, which spreads each iteration's
    dangling mass uniformly (one extra global agg per iteration, the
    textbook definition; sum of ranks == 1, pytest-asserted with an
    exact DuckDB replay)."""
    # checkpoint the DEDUPED EDGE LIST first: every iteration joins it
    # (and out_deg derives from it), so without materialization the full
    # upstream pipeline (pages -> parse -> dedup) would re-run ~2x per
    # iteration — the same shared-base lesson as connected_components.
    e = (edges.select("src", "dst").dropDuplicates(["src", "dst"])
         .localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("odeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        inflow_expr = F.coalesce("s", F.lit(0.0))
        if redistribute_dangling:
            # dangling mass = rank held by nodes with no outgoing edge;
            # one global agg per iteration (driver scalar folded into
            # the update as a literal — the oracle derives the same
            # scalar in a per-iteration CTE; agg-order float divergence
            # is ~1e-16, absorbed by the round(6) reporting grain)
            dm = (ranks.join(out_deg, ranks["node"] == out_deg["src"],
                             "left_anti")
                  .agg(F.sum("rank")).first()[0]) or 0.0
            inflow_expr = inflow_expr + F.lit(dm / n)
        contribs = (e.join(ranks, e["src"] == ranks["node"])
                    .join(out_deg, "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("odeg")).alias("c")))
        inflow = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         (F.lit(TELEPORT / n)
                          + F.lit(DAMPING) * inflow_expr)
                         .alias("rank"))
                 .localCheckpoint(eager=False))
    return ranks


def pagerank_oracle_sql(edges_sql: str, iterations: int = 5,
                        redistribute_dangling: bool = False) -> str:
    """DuckDB replay of :func:`pagerank` over ``edges_sql`` (a query
    producing src, dst): one chained CTE per iteration, same teleport /
    damping literals, same left-join inflow shape. With
    ``redistribute_dangling`` a per-iteration ``d{i}`` CTE derives the
    dangling mass exactly as the Spark side's global agg does."""
    if iterations < 1:
        raise ValueError(f"iterations={iterations}: need >= 1 (the CTE"
                         " chain has no zero-iteration form)")
    it_ctes = []
    prev = "r0"
    for i in range(1, iterations + 1):
        inflow = "COALESCE(c.s, 0.0e0)"
        dangling_cte = ""
        if redistribute_dangling:
            dangling_cte = f"""
d{i} AS (
  SELECT COALESCE(SUM(r.rank), 0.0e0) AS dm
  FROM {prev} r LEFT JOIN outd o ON r.node = o.src
  WHERE o.src IS NULL
),"""
            inflow = (f"(COALESCE(c.s, 0.0e0)"
                      f" + (SELECT dm FROM d{i}) / (SELECT n FROM nn))")
        it_ctes.append(f"""{dangling_cte}
r{i} AS (
  SELECT nd.node,
         ({TELEPORT}e0 / (SELECT n FROM nn))
           + {DAMPING}e0 * {inflow} AS rank
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / o.odeg) AS s
    FROM e JOIN {prev} r ON e.src = r.node
           JOIN outd o ON e.src = o.src
    GROUP BY e.dst
  ) c ON nd.node = c.node
)""")
        prev = f"r{i}"
    return f"""
WITH eraw AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM eraw),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
outd AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0e0 / (SELECT n FROM nn) AS rank FROM nodes),
{",".join(it_ctes)}
SELECT node, round(rank, 6) AS rank FROM {prev} ORDER BY node"""
