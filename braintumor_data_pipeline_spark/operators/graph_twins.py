"""Co-purchase twins of the LSH-graph iterative family (VERDICT r5
task 4).

Why twins exist: the LSH candidate graph built from the synthetic
``documents`` fixture is DEGENERATE at sf0.1 — the near-dup density
makes the banding graph a ~9.5M-edge clique, so the independent DuckDB
closures of the iterative graph oracles (components, BFS replay,
peeling, Bellman-Ford, wedge enumeration …) go quadratic-plus and the
queries sit on ``tools/verify_local.SKIP_SF01`` class (a): correct, but
only cross-engine-verifiable at sf0.01. ``copurchase_triangle_stats``
and ``copurchase_pagerank_top20`` (graph.py:946,1053) proved the cure:
run the SAME algorithm over a DATA-DERIVED, NON-degenerate edge list
and the identical unrolled oracle stays sf0.1-green. This module
completes the set — one twin per remaining skip-listed operator, each
SKIP_SF01 entry now pointing at its twin by name.

Two edge lists, both from TPC-H lineitem (no synthetic graph anywhere):

- **full co-purchase graph**: parts sharing an order
  (graph.py:_COPURCHASE_EDGES_SQL) — 1.2M undirected edges / 20k parts
  at sf0.1. Used by the twins whose oracle cost is linear in edges
  (assortativity's moment sums, rich-club's degree-filtered counts).
- **repeat co-purchase graph**: part pairs co-purchased in ≥2 DISTINCT
  orders — the association-rule support-2 graph. Sparse by
  construction (3.9k edges / 6.2k vertices / max degree 10 at sf0.1,
  2.3k components of ≤29 nodes), so the per-node and traversal-replay
  oracles (two-hop enumeration, wedge counts, 12-round label
  propagation, recursive-CTE BFS, 6-round Bellman-Ford, 4-round
  peeling) are all trivially sf0.1-verifiable. Raising the support
  threshold is exactly how a production pipeline would sparsify this
  graph at 100 TB, so the twin formulation IS the scale formulation,
  not a test convenience.

Determinism stance is inherited from graph.py: every iterative twin is
pure integer arithmetic (min-label, hop counts, md5-derived integer
weights, LCM-scaled reciprocals), so any partitioning/retry order
yields bit-identical tables and the oracle replays the same bounded
rounds as unrolled SQL stages. Reference parity: the reference repo has
no graph module at all (SURVEY §2 north-star extensions); these are
scale-design components, cited against the papers in PAPERS.md
(connected components = large/small-star; k-core = peeling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from ..sources.fixtures import load_table as _t
from .graph import (
    _COPURCHASE_EDGES_SQL,
    BFS_HOPS,
    HARM_SCALE,
    HARM_SEEDS,
    KCORE_K,
    KCORE_ROUNDS,
    SSSP_ROUNDS,
)

#: Bounded min-label-propagation rounds for the components twin. The
#: repeat graph's largest-component eccentricity is ≤9 at every tested
#: SF (measured: 9 at sf0.01's 1,875-node giant, ≤8 at sf0.1), so 12
#: rounds reach the true fixpoint there; at any SF the semantics are
#: "labels after ≤12 rounds" on BOTH engines by construction (Spark
#: early-exits on convergence, which equals the 12-round prefix), so
#: parity never depends on convergence.
CC_ROUNDS = 12

#: Rich-club thresholds for the FULL co-purchase graph (degrees up to
#: 222 at sf0.1 — the {2,4,8} ks of the LSH variant would make the club
#: the whole graph).
RICH_KS = (16, 64, 128)

_REPEAT_PAIRS_SQL = """
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a
      JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(DISTINCT a.l_orderkey) >= 2
"""

_SYM_SQL = """
      SELECT pa AS src, pb AS dst FROM rp
      UNION ALL
      SELECT pb AS src, pa AS dst FROM rp
"""


def _repeat_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (pa < pb) repeat-co-purchase pairs, support ≥ 2
    distinct orders. One equi-join on l_orderkey (per-order pair
    fan-out ≤ C(7,2), business-bounded) + one partial-aggregable
    distinct-count groupBy on the pair key."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") > F.col("a.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.countDistinct("a.l_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") >= 2)
        .select("pa", "pb")
    )


def _sym(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )


def _cc_labels(edges: DataFrame) -> DataFrame:
    """Min-label propagation over a symmetric, localCheckpointed edge
    list: ≤CC_ROUNDS rounds, early exit on the 1-row convergence
    aggregate (bounded driver collect — the components.py protocol
    pattern; early exit equals the CC_ROUNDS-round prefix, see
    CC_ROUNDS note). Returns (node, label)."""
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(CC_ROUNDS):
        nbr = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("n2"))
            .agg(F.min("label").alias("nl"))
        )
        new = (
            labels.join(nbr, labels.node == nbr.n2, "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nl"), F.col("label")),
                ).alias("label"),
                (F.col("nl") < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint()  # cut lineage: plans stay O(1) per round
        changed = new.agg(
            F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("c")
        ).collect()[0]["c"]
        labels = new.select("node", "label")
        if not changed:
            break
    return labels


def _cc_round_sql(k: int) -> str:
    # AS MATERIALIZED: each stage references l{k-1} twice; without the
    # hint DuckDB may inline the whole chain (2^CC_ROUNDS expansions of
    # the base scan — fd exhaustion, observed at sf0.001).
    return f"""l{k} AS MATERIALIZED (
      SELECT v.node,
             least(v.label, coalesce(nm.nl, v.label)) AS label
      FROM l{k - 1} v
      LEFT JOIN (
        SELECT e.src AS node, min(p.label) AS nl
        FROM sedges e JOIN l{k - 1} p ON p.node = e.dst
        GROUP BY e.src
      ) nm ON nm.node = v.node
    )"""


_CC_STAGES_SQL = ",\n    ".join(
    _cc_round_sql(k) for k in range(1, CC_ROUNDS + 1)
)


@register(
    "copurchase_components",
    oracle=f"""
    WITH rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    sedges AS MATERIALIZED ({_SYM_SQL}),
    l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS label FROM sedges
    ),
    {_CC_STAGES_SQL}
    SELECT node AS part_id, CAST(label AS BIGINT) AS component
    FROM l{CC_ROUNDS}
    """,
    tags=("graph", "iterative", "relational"),
)
def copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the repeat co-purchase graph — the
    sf0.1-verifiable twin of ``dedup_connected_components``
    (components.py:67; SKIP_SF01 points here). Same distributed
    min-label propagation (label ← min(label, neighbor labels); one
    edges⋈labels join + min-groupBy per round, lineage cut per round),
    but the oracle UNROLLS the bounded 12-round recurrence as
    SQL stages over the sparse support-2 graph instead of a quadratic
    full-pair closure — each stage is one V-row table joined to the
    3.9k-edge list. Labels are exact integers, so the driver hash is
    exact."""
    pairs = _repeat_pairs(spark, sf_dir)
    edges = _sym(pairs).localCheckpoint()
    labels = _cc_labels(edges)
    return labels.select(
        F.col("node").alias("part_id"),
        F.col("label").cast("bigint").alias("component"),
    )


@register(
    "copurchase_modularity",
    oracle=f"""
    WITH rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    sedges AS MATERIALIZED ({_SYM_SQL}),
    l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS label FROM sedges
    ),
    {_CC_STAGES_SQL},
    comp AS (SELECT node AS part_id, label AS component FROM l{CC_ROUNDS}),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM rp),
    ec AS (
      SELECT c.component, CAST(count(*) AS BIGINT) AS e_c
      FROM rp p JOIN comp c ON c.part_id = p.pa
      GROUP BY c.component
    ),
    deg AS (
      SELECT src AS part_id, CAST(count(*) AS BIGINT) AS d
      FROM sedges GROUP BY src
    ),
    dc AS (
      SELECT c.component, CAST(sum(d.d) AS BIGINT) AS d_c
      FROM deg d JOIN comp c ON c.part_id = d.part_id
      GROUP BY c.component
    ),
    nn AS (
      SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
      FROM comp GROUP BY component
    )
    SELECT nn.component, nn.n_nodes,
           coalesce(ec.e_c, 0) AS n_edges_in,
           coalesce(dc.d_c, 0) AS deg_sum,
           CASE WHEN mm.m > 0 THEN
             round((4 * CAST(mm.m AS DOUBLE) * coalesce(ec.e_c, 0)
                    - CAST(coalesce(dc.d_c, 0) AS DOUBLE)
                      * coalesce(dc.d_c, 0))
                   / (4 * CAST(mm.m AS DOUBLE) * mm.m), 6)
           END AS contribution
    FROM nn
    LEFT JOIN ec ON ec.component = nn.component
    LEFT JOIN dc ON dc.component = nn.component
    CROSS JOIN mm
    ORDER BY nn.component
    """,
    tags=("graph", "evaluation", "agg"),
)
def copurchase_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity decomposition of the repeat-co-purchase
    component partition — the sf0.1-verifiable twin of
    ``component_modularity`` (components.py:139; SKIP_SF01 points
    here), and a MEANINGFUL one: the support-2 graph has ~2.3k real
    communities at sf0.1 (the LSH fixture collapses to one blob).
    Per component: exact BIGINT node/edge/degree counts from
    partial-aggregable groupBys; contribution = e_c/m − (d_c/2m)² as
    ONE float expression per output row (integer-valued doubles ≪ 2⁵³);
    the scalar m rides a 1-row broadcast cross join."""
    pairs = _repeat_pairs(spark, sf_dir).transform(persist_tracked)
    edges = _sym(pairs).localCheckpoint()
    comp = _cc_labels(edges).select(
        F.col("node").alias("part_id"), F.col("label").alias("component")
    )
    m_df = pairs.agg(F.count("*").alias("m"))
    ec = (
        pairs.join(
            comp.select(F.col("part_id").alias("pa"), "component"), "pa"
        )
        .groupBy("component")
        .agg(F.count("*").alias("e_c"))
    )
    deg = edges.groupBy(F.col("src").alias("part_id")).agg(
        F.count("*").alias("d")
    )
    dc = (
        deg.join(comp, "part_id")
        .groupBy("component")
        .agg(F.sum("d").alias("d_c"))
    )
    nn = comp.groupBy("component").agg(F.count("*").alias("n_nodes"))
    out = (
        nn.join(ec, "component", "left")
        .join(dc, "component", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "component",
            "n_nodes",
            F.coalesce(F.col("e_c"), F.lit(0)).alias("n_edges_in"),
            F.coalesce(F.col("d_c"), F.lit(0)).alias("deg_sum"),
            F.col("m"),
        )
    )
    md = F.col("m").cast("double")
    contribution = (
        4 * md * F.col("n_edges_in").cast("double")
        - F.col("deg_sum").cast("double") * F.col("deg_sum").cast("double")
    ) / (4 * md * md)
    return out.select(
        "component",
        "n_nodes",
        "n_edges_in",
        "deg_sum",
        F.when(F.col("m") > 0, F.round(contribution, 6)).alias(
            "contribution"
        ),
    ).orderBy("component")


@register(
    "copurchase_bfs_levels",
    oracle=f"""
    WITH RECURSIVE rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    sedges AS MATERIALIZED ({_SYM_SQL}),
    hub AS (
      SELECT src FROM (
        SELECT src, count(*) AS deg FROM sedges GROUP BY src
        ORDER BY deg DESC, src LIMIT 1
      )
    ),
    bfs(node, lvl) AS (
      SELECT (SELECT src FROM hub), 0
      UNION
      SELECT e.dst, b.lvl + 1
      FROM bfs b JOIN sedges e ON e.src = b.node
      WHERE b.lvl < {BFS_HOPS}
    )
    SELECT node AS part_id, CAST(min(lvl) AS INT) AS level
    FROM bfs GROUP BY node
    """,
    tags=("graph", "iterative", "relational"),
)
def copurchase_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted BFS levels (4 hops) over the repeat
    co-purchase graph from its MAX-DEGREE hub part (tie-break: min id
    — a total order, so both engines pick the identical source; the
    min-id vertex of the LSH original would land in a 2-node
    component at sf0.1 and make the check vacuous) — the
    sf0.1-verifiable twin of ``bfs_levels_from_min_vertex``
    (graph.py:248; SKIP_SF01 points here). Identical frontier
    algorithm (expand ⋈ edges, distinct, anti-join visited, lineage
    cut per hop); the recursive-CTE oracle replays it over the sparse
    graph where each wavefront is bounded by the source's
    component."""
    pairs = _repeat_pairs(spark, sf_dir)
    edges = _sym(pairs).localCheckpoint()
    source = (
        edges.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .orderBy(F.desc("deg"), "src")
        .limit(1)
        .select(F.col("src").alias("part_id"), F.lit(0).alias("lvl"))
    )
    levels = source.localCheckpoint()
    frontier = levels
    for hop in range(1, BFS_HOPS + 1):
        reached = (
            frontier.join(edges, frontier.part_id == edges.src)
            .select(F.col("dst").alias("part_id"), F.lit(hop).alias("lvl"))
            .distinct()
        )
        frontier = reached.join(
            levels, "part_id", "left_anti"
        ).localCheckpoint()
        levels = levels.unionAll(frontier).localCheckpoint()
    return levels.groupBy("part_id").agg(
        F.min("lvl").cast("int").alias("level")
    )


def _sssp_twin_round_sql(k: int) -> str:
    return f"""d{k} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{k - 1}
        UNION ALL
        SELECT e.dst AS node, p.dist + e.w AS dist
        FROM wedges e JOIN d{k - 1} p ON p.node = e.src
      ) GROUP BY node
    )"""


@register(
    "copurchase_sssp_bellman",
    oracle=f"""
    WITH rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    wp AS MATERIALIZED (
      SELECT pa, pb,
             ('0x' || substr(md5(pa || ':' || pb), 1, 8))::BIGINT
               % 9 + 1 AS w
      FROM rp
    ),
    wedges AS MATERIALIZED (
      SELECT pa AS src, pb AS dst, w FROM wp
      UNION ALL
      SELECT pb AS src, pa AS dst, w FROM wp
    ),
    hub AS (
      SELECT src FROM (
        SELECT src, count(*) AS deg FROM wedges GROUP BY src
        ORDER BY deg DESC, src LIMIT 1
      )
    ),
    d0 AS (
      SELECT (SELECT src FROM hub) AS node, CAST(0 AS BIGINT) AS dist
    ),
    """ + ",\n    ".join(
        _sssp_twin_round_sql(k) for k in range(1, SSSP_ROUNDS + 1)
    ) + f"""
    SELECT node AS part_id, CAST(dist AS BIGINT) AS dist
    FROM d{SSSP_ROUNDS}
    """,
    tags=("graph", "iterative", "relational"),
)
def copurchase_sssp_bellman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (bounded Bellman-Ford,
    6 rounds) over the repeat co-purchase graph from its
    MAX-DEGREE hub part (total-order tie-break (deg DESC, id), so both
    engines relax from the identical source and the reached set is a
    real component, not a 2-node islet) — the sf0.1-verifiable twin of
    ``sssp_weighted_bellman`` (graph.py:405; SKIP_SF01 points here).
    Same md5-derived integer weights 1..9 on the canonical (pa < pb)
    pair (symmetric across directions, replayed bit-exactly by
    DuckDB's hex-prefix cast), same min-relaxation recurrence, same
    per-round localCheckpoint; the unrolled oracle's per-stage cost is
    one ≤V-row table joined to the sparse edge list."""
    pairs = _repeat_pairs(spark, sf_dir)
    w = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("pa"), F.col("pb"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 9
        + 1
    ).alias("w")
    wp = pairs.select("pa", "pb", w)
    wedges = (
        wp.select(F.col("pa").alias("src"), F.col("pb").alias("dst"), "w")
        .unionAll(
            wp.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w")
        )
        .localCheckpoint()
    )
    dist = (
        wedges.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .orderBy(F.desc("deg"), "src")
        .limit(1)
        .select(
            F.col("src").alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
        .localCheckpoint()
    )
    for _ in range(SSSP_ROUNDS):
        relaxed = dist.join(wedges, dist.node == wedges.src).select(
            F.col("dst").alias("node"), (dist.dist + wedges.w).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select(
        F.col("node").alias("part_id"),
        F.col("dist").cast("bigint").alias("dist"),
    )


def _kcore_twin_round_sql(r: int) -> str:
    return f"""deg{r} AS MATERIALIZED (
      SELECT src, count(*) AS deg FROM e{r - 1} GROUP BY src
    ),
    keep{r} AS (SELECT src FROM deg{r} WHERE deg >= {KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r - 1} e
      JOIN keep{r} a ON a.src = e.src
      JOIN keep{r} b ON b.src = e.dst
    )"""


@register(
    "copurchase_kcore",
    oracle=f"""
    WITH rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    e0 AS MATERIALIZED ({_SYM_SQL}),
    """ + ",\n    ".join(
        _kcore_twin_round_sql(r) for r in range(1, KCORE_ROUNDS + 1)
    ) + f"""
    SELECT src AS part_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM e{KCORE_ROUNDS} GROUP BY src
    """,
    tags=("graph", "iterative", "relational"),
)
def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the repeat co-purchase graph by bounded
    iterative peeling (KCORE_ROUNDS rounds) — the sf0.1-verifiable
    twin of ``kcore_peeling`` (graph.py:501; SKIP_SF01 points here),
    and on THIS graph the peel actually bites (half the vertices are
    degree-1 leaves of association pairs). Same per-round shape: one
    degree count + two semi-joins on the shrinking, per-round
    checkpointed edge relation; the oracle unrolls the identical
    rounds."""
    pairs = _repeat_pairs(spark, sf_dir)
    edges = _sym(pairs).localCheckpoint()
    for _ in range(KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= KCORE_K).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint()
        )
    return edges.groupBy("src").agg(F.count("*").alias("core_degree")).select(
        F.col("src").alias("part_id"), "core_degree"
    )


@register(
    "copurchase_link_prediction",
    oracle=f"""
    WITH rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    sedges AS MATERIALIZED ({_SYM_SQL}),
    two_hop AS (
      SELECT a.src AS u, b.dst AS w, CAST(count(*) AS BIGINT) AS common
      FROM sedges a JOIN sedges b
        ON a.dst = b.src AND a.src < b.dst
      GROUP BY a.src, b.dst
    ),
    non_edges AS (
      SELECT t.u, t.w, t.common
      FROM two_hop t
      LEFT JOIN sedges e ON e.src = t.u AND e.dst = t.w
      WHERE e.src IS NULL
    )
    SELECT CAST(u AS BIGINT) AS part_a,
           CAST(w AS BIGINT) AS part_b,
           common AS common_neighbors
    FROM non_edges
    WHERE common >= 1
    ORDER BY common DESC, u, w
    LIMIT 20
    """,
    tags=("graph", "join", "topk"),
)
def copurchase_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction over the repeat co-purchase
    graph ("parts that should co-sell but haven't repeatedly yet") —
    the sf0.1-verifiable twin of ``link_prediction_common_neighbors``
    (graph.py:326; SKIP_SF01 points here). The two-hop self-join costs
    Σ deg² ≈ 12k rows on this graph (vs ~300M on the full co-purchase
    graph — the support threshold is the scale lever); anti-join drops
    existing edges; exact integer scores, top-20 with total-order
    tie-breaks. Threshold common ≥ 1 (not the original's ≥ 2): the
    support-2 graph is sparse enough that ≥2-witness non-edges vanish
    at sf0.1 and the check would be vacuous."""
    pairs = _repeat_pairs(spark, sf_dir)
    edges = _sym(pairs).transform(persist_tracked)
    a = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = edges.select(F.col("src").alias("v2"), F.col("dst").alias("w"))
    two_hop = (
        a.join(b, (F.col("v") == F.col("v2")) & (F.col("u") < F.col("w")))
        .groupBy("u", "w")
        .agg(F.count("*").alias("common"))
    )
    non_edges = two_hop.join(
        edges,
        (two_hop.u == edges.src) & (two_hop.w == edges.dst),
        "left_anti",
    )
    return (
        non_edges.filter(F.col("common") >= 1)
        .select(
            F.col("u").alias("part_a"),
            F.col("w").alias("part_b"),
            F.col("common").alias("common_neighbors"),
        )
        .orderBy(F.desc("common_neighbors"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "copurchase_local_clustering",
    oracle=f"""
    WITH rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    tri_v AS (
      SELECT v, CAST(count(*) AS BIGINT) AS n_tri
      FROM (
        SELECT unnest([e1.pa, e1.pb, e2.pb]) AS v
        FROM rp e1
        JOIN rp e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
        JOIN rp e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
      ) GROUP BY v
    ),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT pa AS v FROM rp UNION ALL SELECT pb AS v FROM rp
      ) GROUP BY v
    )
    SELECT d.v AS part_id, d.deg,
           coalesce(t.n_tri, 0) AS n_triangles,
           round(CAST(2 * coalesce(t.n_tri, 0) AS DOUBLE)
                 / (d.deg * (d.deg - 1)), 6) AS lcc
    FROM deg d LEFT JOIN tri_v t ON t.v = d.v
    WHERE d.deg >= 2
    ORDER BY part_id
    """,
    tags=("graph", "join", "agg"),
)
def copurchase_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient of the repeat co-purchase
    graph — the sf0.1-verifiable twin of
    ``local_clustering_coefficient`` (graph.py:571; SKIP_SF01 points
    here). Each oriented triangle (pa < pb < pc) found once at its
    lowest vertex, EXPLODED to credit all three corners; LCC =
    2·tri/(deg·(deg−1)) one exact int/int float division per row,
    degree-<2 rows excluded on both engines."""
    pairs = _repeat_pairs(spark, sf_dir).transform(persist_tracked)
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tris = (
        e1.join(
            e2,
            (F.col("e2.pa") == F.col("e1.pa"))
            & (F.col("e2.pb") > F.col("e1.pb")),
        )
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pb"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.explode(
                F.array(F.col("e1.pa"), F.col("e1.pb"), F.col("e2.pb"))
            ).alias("v")
        )
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        pairs.select(F.col("pa").alias("v"))
        .unionAll(pairs.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    return (
        deg.join(tris, "v", "left")
        .filter(F.col("deg") >= 2)
        .select(
            F.col("v").alias("part_id"),
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_triangles"),
            F.round(
                (2 * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("lcc"),
        )
        .orderBy("part_id")
    )


@register(
    "copurchase_harmonic_centrality",
    oracle=f"""
    WITH RECURSIVE rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    sedges AS MATERIALIZED ({_SYM_SQL}),
    seeds AS (
      SELECT DISTINCT pa AS s FROM rp ORDER BY pa LIMIT {HARM_SEEDS}
    ),
    bfs(s, node, lvl) AS (
      SELECT s, s, 0 FROM seeds
      UNION
      SELECT b.s, e.dst, b.lvl + 1
      FROM bfs b JOIN sedges e ON e.src = b.node
      WHERE b.lvl < {BFS_HOPS}
    ),
    dist AS (
      SELECT s, node, min(lvl) AS d FROM bfs GROUP BY s, node
    )
    SELECT s AS source_part,
           CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum({HARM_SCALE} // d) AS BIGINT) AS harmonic_fix,
           round(CAST(sum({HARM_SCALE} // d) AS DOUBLE)
                 / {HARM_SCALE}, 6) AS harmonic
    FROM dist WHERE d > 0
    GROUP BY s
    ORDER BY harmonic_fix DESC, s
    """,
    tags=("graph", "iterative", "centrality"),
)
def copurchase_harmonic_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Harmonic centrality (Σ 1/d, exact LCM-scaled integers) of the
    8 lowest-id repeat-co-purchase parts via one
    multi-source 4-hop BFS — the sf0.1-verifiable twin of
    ``harmonic_centrality_seeds`` (graph.py:848; SKIP_SF01 points
    here). Same traversal (source id rides as a key column; frontier
    distinct + anti-join visited + per-hop checkpoint), same exact
    840//d scores; the recursive-CTE oracle replays it over
    wavefronts bounded by the ≤29-node components."""
    pairs = _repeat_pairs(spark, sf_dir)
    edges = (
        _sym(pairs)
        .select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
        .localCheckpoint()
    )
    seeds = (
        pairs.select(F.col("pa").alias("s"))
        .distinct()
        .orderBy("s")
        .limit(HARM_SEEDS)
    )
    levels = seeds.select(
        "s", F.col("s").alias("node"), F.lit(0).alias("lvl")
    ).localCheckpoint()
    frontier = levels
    for hop in range(1, BFS_HOPS + 1):
        reached = (
            frontier.join(edges, frontier.node == edges.e_src)
            .select(
                "s", F.col("e_dst").alias("node"), F.lit(hop).alias("lvl")
            )
            .distinct()
        )
        frontier = reached.join(
            levels, ["s", "node"], "left_anti"
        ).localCheckpoint()
        levels = levels.unionAll(frontier).localCheckpoint()
    dist = levels.groupBy("s", "node").agg(F.min("lvl").alias("d"))
    return (
        dist.filter(F.col("d") > 0)
        .groupBy(F.col("s").alias("source_part"))
        .agg(
            F.count("*").alias("n_reached"),
            F.sum(F.expr(f"{HARM_SCALE} div d")).alias("harmonic_fix"),
            F.round(
                F.sum(F.expr(f"{HARM_SCALE} div d")).cast("double")
                / HARM_SCALE,
                6,
            ).alias("harmonic"),
        )
        .orderBy(F.col("harmonic_fix").desc(), "source_part")
    )


@register(
    "copurchase_assortativity",
    oracle=f"""
    WITH edges AS ({_COPURCHASE_EDGES_SQL}),
    deg AS (
      SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
      FROM edges GROUP BY src
    ),
    dedges AS (
      SELECT da.deg AS dx, db.deg AS dy
      FROM edges e
      JOIN deg da ON da.v = e.src
      JOIN deg db ON db.v = e.dst
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m2,
             CAST(sum(dx) AS BIGINT) AS sx,
             CAST(sum(CAST(dx AS DECIMAL(38,0)) * dy) AS DECIMAL(38,0))
               AS sxy,
             CAST(sum(CAST(dx AS DECIMAL(38,0)) * dx) AS DECIMAL(38,0))
               AS sxx
      FROM dedges
    )
    SELECT m2 // 2 AS n_edges,
           round((CAST(sxy AS DOUBLE) / m2
                  - (CAST(sx AS DOUBLE) / m2) * (CAST(sx AS DOUBLE) / m2))
                 / (CAST(sxx AS DOUBLE) / m2
                  - (CAST(sx AS DOUBLE) / m2) * (CAST(sx AS DOUBLE) / m2)),
                 6) AS assortativity
    FROM s
    """,
    tags=("graph", "stats", "agg"),
)
def copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the FULL co-purchase graph — the
    sf0.1-verifiable twin of ``degree_assortativity`` (graph.py:667;
    SKIP_SF01 points here). The directed edge list is already
    symmetric (src <> dst both ways), so the endpoint-degree moment
    sums run once over it: exact BIGINT / DECIMAL(38,0) moments
    (degree²·edges outgrows a LONG at 100 TB), one float Pearson
    expression on the single output row, two broadcast degree joins."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") != F.col("a.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        .transform(persist_tracked)
    )
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("deg")
    )
    da = deg.select(F.col("v").alias("src"), F.col("deg").alias("dx"))
    db = deg.select(F.col("v").alias("dst"), F.col("deg").alias("dy"))
    dedges = edges.join(F.broadcast(da), "src").join(F.broadcast(db), "dst")
    dxd = F.col("dx").cast("decimal(38,0)")
    s = dedges.agg(
        F.count("*").alias("m2"),
        F.sum("dx").alias("sx"),
        F.sum(dxd * F.col("dy")).alias("sxy"),
        F.sum(dxd * F.col("dx")).alias("sxx"),
    )
    mean = F.col("sx").cast("double") / F.col("m2")
    return s.select(
        F.expr("m2 div 2").alias("n_edges"),
        F.round(
            (F.col("sxy").cast("double") / F.col("m2") - mean * mean)
            / (F.col("sxx").cast("double") / F.col("m2") - mean * mean),
            6,
        ).alias("assortativity"),
    )


@register(
    "copurchase_rich_club",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a
      JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
    ),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT pa AS v FROM pairs UNION ALL SELECT pb AS v FROM pairs
      ) GROUP BY v
    ),
    ks AS (SELECT unnest([{", ".join(str(k) for k in RICH_KS)}]) AS k),
    club AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS n_k
      FROM ks k JOIN deg d ON d.deg > k.k
      GROUP BY k.k
    ),
    club_edges AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS e_k
      FROM ks k
      JOIN pairs p ON TRUE
      JOIN deg da ON da.v = p.pa AND da.deg > k.k
      JOIN deg db ON db.v = p.pb AND db.deg > k.k
      GROUP BY k.k
    )
    SELECT c.k, c.n_k,
           coalesce(e.e_k, 0) AS e_k,
           CASE WHEN c.n_k >= 2 THEN
             round(CAST(2 * coalesce(e.e_k, 0) AS DOUBLE)
                   / (c.n_k * (c.n_k - 1)), 6)
           END AS phi
    FROM club c LEFT JOIN club_edges e ON e.k = c.k
    ORDER BY c.k
    """,
    tags=("graph", "stats", "agg"),
)
def copurchase_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the FULL co-purchase graph at
    k ∈ (16, 64, 128) (degree scale of THIS graph: max 222 at sf0.1) — the
    sf0.1-verifiable twin of ``rich_club_coefficient`` (graph.py:750;
    SKIP_SF01 points here). Exact counts: club sizes from a degree
    filter per k (3-value constant domain via a literal-array explode),
    club-internal edges by two broadcast degree joins over the
    canonical pair list, φ one int/int division per k."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") > F.col("a.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
        .transform(persist_tracked)
    )
    deg = (
        pairs.select(F.col("pa").alias("v"))
        .unionAll(pairs.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    ).transform(persist_tracked)
    k_arr = F.array(*[F.lit(k) for k in RICH_KS])
    club = (
        deg.select("deg", F.explode(k_arr).alias("k"))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_k"))
    )
    da = deg.select(F.col("v").alias("pa"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("pb"), F.col("deg").alias("degb"))
    club_edges = (
        pairs.join(F.broadcast(da), "pa")
        .join(F.broadcast(db), "pb")
        .select("dega", "degb", F.explode(k_arr).alias("k"))
        .filter((F.col("dega") > F.col("k")) & (F.col("degb") > F.col("k")))
        .groupBy("k")
        .agg(F.count("*").alias("e_k"))
    )
    return (
        club.join(club_edges, "k", "left")
        .select(
            "k",
            "n_k",
            F.coalesce(F.col("e_k"), F.lit(0)).alias("e_k"),
            F.when(
                F.col("n_k") >= 2,
                F.round(
                    (2 * F.coalesce(F.col("e_k"), F.lit(0))).cast("double")
                    / (F.col("n_k") * (F.col("n_k") - 1)),
                    6,
                ),
            ).alias("phi"),
        )
        .orderBy("k")
    )


#: Synchronous label-propagation rounds. Unlike the min-label
#: components recurrence (CC_ROUNDS), sync LPA has no convergence
#: guarantee (bipartite structures can 2-cycle), so the operator's
#: SEMANTICS are "labels after exactly LPA_ROUNDS synchronous rounds"
#: on both engines — parity never depends on convergence, and the
#: bounded unrolled oracle replays the identical prefix.
LPA_ROUNDS = 4


def _lpa_round_sql(k: int) -> str:
    # argmax by (count DESC, label ASC) via min_by over a composite
    # key: with c ≤ max degree 222 ≪ 2^20, (2^20 − c)·2^40 + label
    # orders exactly like the pair and stays far under 2^63.
    return f"""a{k} AS MATERIALIZED (
      SELECT v.node, coalesce(b.nl, v.label) AS label
      FROM a{k - 1} v
      LEFT JOIN (
        SELECT node,
               CAST(min(key) % 1099511627776 AS BIGINT) AS nl
        FROM (
          SELECT e.src AS node,
                 (1048576 - count(*)) * 1099511627776 + p.label AS key
          FROM sedges e JOIN a{k - 1} p ON p.node = e.dst
          GROUP BY e.src, p.label
        ) t GROUP BY node
      ) b ON b.node = v.node
    )"""


_LPA_STAGES_SQL = ",\n    ".join(
    _lpa_round_sql(k) for k in range(1, LPA_ROUNDS + 1)
)


@register(
    "label_propagation_communities",
    oracle=f"""
    WITH rp AS MATERIALIZED ({_REPEAT_PAIRS_SQL}),
    sedges AS MATERIALIZED ({_SYM_SQL}),
    a0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS label FROM sedges
    ),
    {_LPA_STAGES_SQL}
    SELECT node AS part_id, CAST(label AS BIGINT) AS community
    FROM a{LPA_ROUNDS}
    """,
    tags=("graph", "iterative", "community"),
)
def label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over the repeat co-purchase graph: each round every node
    adopts its neighborhood's MOST FREQUENT label, ties broken toward
    the smallest label, isolated-update nodes keep their own — the
    classic near-linear community detector, run for exactly
    LPA_ROUNDS synchronous rounds (see constant note: fixed-prefix
    semantics, parity independent of convergence). Distributed shape
    per round: one edges⋈labels hash join + TWO map-side-combinable
    aggregations — count per (node, neighbor-label), then a composite
    integer min_by per node (no per-round window shuffle; the argmax
    is encoded as min((2^20 − c)·2^40 + label), exact because count ≤
    degree ≤ 222 ≪ 2^20 and labels are part keys < 2^40). Lineage cut
    per round. Labels stay exact integers end-to-end, so the driver
    hash is exact. Distinct from copurchase_components' min-label
    recurrence: LPA yields sub-component communities (mode vs min)."""
    pairs = _repeat_pairs(spark, sf_dir)
    edges = _sym(pairs).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    big = F.lit(1099511627776).cast("long")  # 2^40
    for _ in range(LPA_ROUNDS):
        key = (F.lit(1048576) - F.col("c")) * big + F.col("label")
        best = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("n2"), "label")
            .agg(F.count("*").alias("c"))
            .select("n2", key.alias("key"))
            .groupBy("n2")
            .agg((F.min("key") % big).cast("long").alias("nl"))
        )
        labels = (
            labels.join(best, labels.node == best.n2, "left")
            .select(
                "node",
                F.coalesce(F.col("nl"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
    return labels.select(
        F.col("node").alias("part_id"),
        F.col("label").cast("bigint").alias("community"),
    )
