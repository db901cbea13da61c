"""Graph analytics over the near-dup candidate graph (north-star scale
extensions; companions to ``components.py``'s connected components).

The graph: vertices = documents, undirected edges = MinHash-LSH
candidate pairs (``dedup.LSH_PAIRS_SQL`` — the sub-quadratic banding
join, NOT an all-pairs construction). On a 100 TB corpus this is exactly
the graph a dedup/influence pipeline owns anyway, so the operators here
are the follow-on analyses: PageRank-style centrality (which near-dup
cluster cores dominate), triangle counting / clustering coefficient
(how clique-like the candidate clusters are — LSH false-positive bands
produce low-triangle stars, true near-dup groups produce dense
triangles).

Determinism-at-scale stance (the repo-wide lesson from the money-sum
and IVF fixes): iterative float algorithms are NOT reproducible under
Spark's nondeterministic partial-aggregation order, so PageRank here is
defined in FIXED-POINT integer arithmetic — mass at 1e-12 resolution,
shares by integer division, damping as 85/100 integer multiply-divide.
Integer sums are order-independent, so retries, speculation, and any
partitioning produce the bit-identical ranking, and a SQL engine
replays all 5 iterations exactly (the oracle unrolls them). The ~1e-12
per-edge truncation loss is irrelevant to ranking and a price worth
paying for a reproducible model at any cluster size.

Scale notes: each PageRank iteration is one shuffle on dst (the
aggregation) after an edges⋈rank broadcast-or-shuffle join keyed on
src; degrees and edges persist across iterations. Triangle counting
uses the a<b orientation; at production scale orient by (degree, id)
instead so every wedge is enumerated at its lowest-degree vertex —
documented on the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from ..sources.fixtures import load_table as _t
from .dedup import LSH_PAIRS_SQL, minhash_lsh_pairs

PR_SCALE = 10**12  # total PageRank mass, integer
PR_ITERS = 5
_D_NUM, _D_DEN = 85, 100  # damping 0.85 as an exact ratio


def _doc_count_base(spark: SparkSession, sf_dir: str):
    """(docs, base) where base = PR_SCALE // N as a broadcast scalar —
    the per-vertex initial (and teleport) mass. Computed as an aggregate
    + broadcast, never a driver-side count()."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # exact integer division (NOT double /, whose rounding could differ
    # from the oracle's // at unlucky N)
    base = docs.agg(F.count("*").alias("n")).select(
        F.expr(f"{PR_SCALE} div n").alias("base")
    )
    return docs, base


@register(
    "pagerank_fixed_point",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    docs AS (SELECT doc_id FROM documents),
    params AS (
      SELECT CAST({PR_SCALE} // count(*) AS BIGINT) AS base FROM documents
    ),
    it0 AS (SELECT doc_id, (SELECT base FROM params) AS pr FROM docs),
    """ + ",\n    ".join(
        f"""in{k} AS (
      SELECT e.dst AS doc_id, CAST(sum(p.pr // d.deg) AS BIGINT) AS inflow
      FROM edges e
      JOIN it{k - 1} p ON p.doc_id = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    it{k} AS (
      SELECT d.doc_id,
             ({_D_DEN - _D_NUM} * (SELECT base FROM params)) // {_D_DEN}
             + ({_D_NUM} * coalesce(i.inflow, 0)) // {_D_DEN} AS pr
      FROM docs d LEFT JOIN in{k} i USING (doc_id)
    )"""
        for k in range(1, PR_ITERS + 1)
    ) + f"""
    SELECT doc_id, pr FROM it{PR_ITERS}
    """,
    tags=("graph", "iterative", "dedup"),
)
def pagerank_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the LSH candidate graph: 5 damped
    iterations entirely in BIGINT arithmetic (see module docstring for
    why integer, not float). The oracle replays all 5 iterations as
    unrolled SQL stages — both engines run the identical integer
    recurrence, so the driver hash is exact with no float tolerance
    anywhere.

    Plan shape per iteration: edges ⋈ rank (on src, shuffle) ⋈ deg →
    groupBy(dst) sum — LONG sums partial-aggregate map-side. ``edges``
    and ``deg`` persist once; the rank lineage is linear (each
    iteration's output feeds exactly one consumer), so no checkpointing
    is needed for a fixed small iteration count."""
    docs, base = _doc_count_base(spark, sf_dir)
    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .transform(persist_tracked)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).transform(persist_tracked)

    pr = docs.crossJoin(F.broadcast(base)).select(
        "doc_id", F.col("base").alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(pr, edges.src == pr.doc_id)
            .join(deg, "src")
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("pr div deg").alias("share"),
            )
        )
        inflow = contrib.groupBy("doc_id").agg(F.sum("share").alias("inflow"))
        pr = (
            docs.join(inflow, "doc_id", "left")
            .crossJoin(F.broadcast(base))
            .select(
                "doc_id",
                (
                    F.expr(f"({_D_DEN - _D_NUM} * base) div {_D_DEN}")
                    + F.expr(
                        f"({_D_NUM} * coalesce(inflow, 0L)) div {_D_DEN}"
                    )
                ).alias("pr"),
            )
        ).localCheckpoint()  # cut lineage: plans stay O(1) per iteration
        # (components.py pattern — raising PR_ITERS can't balloon the plan)
    return pr


@register(
    "triangle_stats",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
    ),
    deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b AS v FROM pairs
      ) GROUP BY v
    ),
    wed AS (
      SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT CAST(n_triangles AS BIGINT) AS n_triangles,
           n_wedges,
           CAST(3 * n_triangles AS DOUBLE) / n_wedges AS clustering_coeff
    FROM tri, wed
    """,
    tags=("graph", "join", "dedup"),
)
def triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count + wedge count + transitivity over the LSH
    candidate graph, via the oriented two-hop join (each triangle
    a<b<c is counted exactly once, at its lowest vertex).

    Scale note: the a<b orientation is skew-prone when degree correlates
    with id order; at production scale orient edges low-degree→high
    ((deg, id) lexicographic), which bounds the join fan-out at each
    vertex by its effective degree — the standard compact-forward
    algorithm. On this corpus the id orientation is already uniform.
    Clustering coefficient = 3·triangles / wedges, an exact int/int
    division both engines compute identically."""
    pairs = minhash_lsh_pairs(spark, sf_dir).transform(persist_tracked)
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.doc_a") == F.col("e1.doc_a"))
            & (F.col("e2.doc_b") > F.col("e1.doc_b")),
        )
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_b"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    wed = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges")
    )
    return tri.crossJoin(wed).select(
        "n_triangles",
        "n_wedges",
        (
            (F.lit(3) * F.col("n_triangles")).cast("double")
            / F.col("n_wedges")
        ).alias("clustering_coeff"),
    )


BFS_HOPS = 4


@register(
    "bfs_levels_from_min_vertex",
    oracle=f"""
    WITH RECURSIVE pairs AS ({LSH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    bfs(doc_id, lvl) AS (
      SELECT (SELECT min(doc_a) FROM pairs), 0
      UNION
      SELECT e.dst, b.lvl + 1
      FROM bfs b JOIN edges e ON e.src = b.doc_id
      WHERE b.lvl < {BFS_HOPS}
    )
    SELECT doc_id, CAST(min(lvl) AS INT) AS level
    FROM bfs GROUP BY doc_id
    """,
    tags=("graph", "iterative", "dedup"),
)
def bfs_levels_from_min_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest-path levels (unweighted BFS, 4 hops)
    over the LSH candidate graph, from the graph's minimum vertex
    id — "how far does contamination spread from this document through
    near-dup links". Pure integer algorithm: level = min hop count, so
    the result is partitioning/retry-independent and the DuckDB
    recursive CTE replays it exactly (UNION-dedup keeps the recursion
    finite exactly like the Spark frontier dedup).

    Scale shape per hop: frontier ⋈ edges (shuffle on src) → union →
    min-groupBy. Frontier lineage is cut with localCheckpoint each hop
    (the components.py lesson); edges persist once. At 100 TB the
    frontier is the only growing relation and it is bounded by the
    vertex set; a Pregel engine would do the same joins with the same
    shuffles."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint()
    )
    source = pairs.agg(F.min("doc_a").alias("doc_id")).select(
        "doc_id", F.lit(0).alias("lvl")
    )
    levels = source.localCheckpoint()
    frontier = levels
    for hop in range(1, BFS_HOPS + 1):
        reached = (
            frontier.join(edges, frontier.doc_id == edges.src)
            .select(F.col("dst").alias("doc_id"), F.lit(hop).alias("lvl"))
            .distinct()
        )
        # next frontier = newly reached vertices only (anti-join against
        # everything already levelled) — keeps per-hop work proportional
        # to the BFS wavefront, not the visited set
        frontier = reached.join(
            levels, "doc_id", "left_anti"
        ).localCheckpoint()
        levels = levels.unionAll(frontier).localCheckpoint()
    return levels.groupBy("doc_id").agg(F.min("lvl").cast("int").alias("level"))


@register(
    "link_prediction_common_neighbors",
    oracle=f"""
    WITH pairs AS ({{LSH_PAIRS_SQL}}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    two_hop AS (
      -- candidate (u, w): share neighbor v; count distinct v
      SELECT a.src AS u, b.dst AS w, count(*) AS common
      FROM edges a JOIN edges b
        ON a.dst = b.src AND a.src < b.dst
      GROUP BY a.src, b.dst
    ),
    non_edges AS (
      SELECT t.u, t.w, t.common
      FROM two_hop t
      LEFT JOIN edges e ON e.src = t.u AND e.dst = t.w
      WHERE e.src IS NULL
    )
    SELECT CAST(u AS BIGINT) AS doc_a,
           CAST(w AS BIGINT) AS doc_b,
           CAST(common AS BIGINT) AS common_neighbors
    FROM non_edges
    WHERE common >= 2
    ORDER BY common DESC, u, w
    LIMIT 20
    """.format(LSH_PAIRS_SQL=LSH_PAIRS_SQL),
    tags=("graph", "join", "topk"),
)
def link_prediction_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the LSH near-dup graph by the
    common-neighbors score: non-adjacent document pairs ranked by how
    many neighbors they share — the classic "these two are probably
    duplicates the bands missed" recovery pass (and the standard
    baseline of the link-prediction literature). One two-hop self-join
    on the symmetric edge list (cost Σ deg², bounded by LSH bucket
    sizes), an anti-join to drop existing edges, exact integer counts,
    top-20 with total-order tie-breaks.

    r12: the edge list feeds THREE plan branches (both two-hop sides
    and the anti-join) — persist it once, like every sibling graph
    query (the diamond rule); before this the bands-join+distinct
    subplan was built and executed three times."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).transform(persist_tracked)
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
        non_edges.filter(F.col("common") >= 2)
        .select(
            F.col("u").alias("doc_a"),
            F.col("w").alias("doc_b"),
            F.col("common").alias("common_neighbors"),
        )
        .orderBy(F.desc("common_neighbors"), "doc_a", "doc_b")
        .limit(20)
    )


SSSP_ROUNDS = 6  # bounded Bellman-Ford relaxation rounds


def _sssp_round_sql(k: int) -> str:
    return f"""d{k} AS (
      SELECT doc_id, min(dist) AS dist FROM (
        SELECT doc_id, dist FROM d{k - 1}
        UNION ALL
        SELECT e.dst AS doc_id, p.dist + e.w AS dist
        FROM edges e JOIN d{k - 1} p ON p.doc_id = e.src
      ) GROUP BY doc_id
    )"""


@register(
    "sssp_weighted_bellman",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    wpairs AS (
      SELECT doc_a, doc_b,
             ('0x' || substr(md5(doc_a || ':' || doc_b), 1, 8))::BIGINT
               % 9 + 1 AS w
      FROM pairs
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst, w FROM wpairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst, w FROM wpairs
    ),
    d0 AS (
      SELECT (SELECT min(doc_a) FROM pairs) AS doc_id,
             CAST(0 AS BIGINT) AS dist
    ),
    """ + ",\n    ".join(
        _sssp_round_sql(k) for k in range(1, SSSP_ROUNDS + 1)
    ) + f"""
    SELECT doc_id, CAST(dist AS BIGINT) AS dist FROM d{SSSP_ROUNDS}
    """,
    tags=("graph", "iterative", "dedup"),
)
def sssp_weighted_bellman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (bounded Bellman-Ford,
    6 relaxation rounds) over the LSH candidate graph from its minimum
    vertex — the weighted companion to `bfs_levels_from_min_vertex`.
    Edge weights are integers 1..9 derived from the md5 of the
    canonical (doc_a < doc_b) pair — deterministic, symmetric across
    both edge directions, and replayed bit-exactly by DuckDB's
    ``('0x' || substr(md5(..),1,8))::BIGINT`` (the repo's standard
    hash-to-int bridge).

    Pure integer algorithm: dist = min over relaxation paths, so any
    partitioning/retry order yields the identical table, and the
    oracle unrolls the same 6 rounds as SQL stages. Scale shape per
    round: settled ⋈ edges (one shuffle on src) → unionAll →
    min-groupBy (partial-aggregable map-side); edges persist once and
    the settled lineage is cut with localCheckpoint per round — the
    bounded-round production form (delta-stepping's outer loop) whose
    per-round cost is one edge-relation join regardless of graph
    size. Rounds, not convergence, bound the work: both engines
    compute the same 6-round fixpoint prefix by definition."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    w = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_a"), F.col("doc_b"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 9
        + 1
    ).alias("w")
    wpairs = pairs.select("doc_a", "doc_b", w)
    edges = (
        wpairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), "w"
        )
        .unionAll(
            wpairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"), "w"
            )
        )
        .localCheckpoint()
    )
    dist = (
        pairs.agg(F.min("doc_a").alias("doc_id"))
        .select("doc_id", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint()
    )
    for _ in range(SSSP_ROUNDS):
        relaxed = dist.join(edges, dist.doc_id == edges.src).select(
            F.col("dst").alias("doc_id"),
            (dist.dist + edges.w).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("doc_id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select("doc_id", F.col("dist").cast("bigint").alias("dist"))


KCORE_K = 2
KCORE_ROUNDS = 4  # bounded peeling rounds (unrolled in the oracle)


def _kcore_round_sql(r: int) -> str:
    return f"""deg{r} AS (
      SELECT src, count(*) AS deg FROM e{r - 1} GROUP BY src
    ),
    keep{r} AS (SELECT src FROM deg{r} WHERE deg >= {KCORE_K}),
    e{r} AS (
      SELECT e.src, e.dst FROM e{r - 1} e
      JOIN keep{r} a ON a.src = e.src
      JOIN keep{r} b ON b.src = e.dst
    )"""


@register(
    "kcore_peeling",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    e0 AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    """ + ",\n    ".join(
        _kcore_round_sql(r) for r in range(1, KCORE_ROUNDS + 1)
    ) + f"""
    SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM e{KCORE_ROUNDS} GROUP BY src
    """,
    tags=("graph", "iterative", "dedup"),
)
def kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the LSH candidate graph by bounded iterative
    peeling (KCORE_ROUNDS rounds): repeatedly drop vertices with
    degree < 2 and the edges they carry — the standard
    dense-cluster extractor that separates true near-dup cliques from
    the degree-1 hair of LSH false-positive bands (a star's leaves
    peel away; a clique survives).

    Pure integer algorithm (degrees and joins only), so any
    partitioning yields the identical core, and the oracle unrolls the
    same 4 peel rounds as SQL stages. Scale shape per
    round: one groupBy(src) count + two semi-join-shaped filters on
    the shrinking edge relation (each round's edge set is cut with
    localCheckpoint — lineage stays flat, and the relation only ever
    shrinks, so per-round cost is bounded by the previous round's
    edges). Fixed rounds, not convergence, bound the work — both
    engines compute the same peeling prefix by definition."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint()
    )
    for _ in range(KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= KCORE_K).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .localCheckpoint()
        )
    return edges.groupBy("src").agg(
        F.count("*").alias("core_degree")
    ).select(F.col("src").alias("doc_id"), "core_degree")


@register(
    "local_clustering_coefficient",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    tri_v AS (
      SELECT v, CAST(count(*) AS BIGINT) AS n_tri
      FROM (
        SELECT unnest([e1.doc_a, e1.doc_b, e2.doc_b]) AS v
        FROM pairs e1
        JOIN pairs e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
        JOIN pairs e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
      ) GROUP BY v
    ),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b AS v FROM pairs
      ) GROUP BY v
    )
    SELECT d.v AS doc_id, d.deg,
           coalesce(t.n_tri, 0) AS n_triangles,
           round(CAST(2 * coalesce(t.n_tri, 0) AS DOUBLE)
                 / (d.deg * (d.deg - 1)), 6) AS lcc
    FROM deg d LEFT JOIN tri_v t ON t.v = d.v
    WHERE d.deg >= 2
    ORDER BY doc_id
    """,
    tags=("graph", "join", "dedup", "agg"),
)
def local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the LSH candidate
    graph — the node-grain refinement of ``triangle_stats``: how
    clique-like each document's near-dup neighborhood is (LCC ≈ 1 →
    the node sits in a tight dup cluster; LCC ≈ 0 → it's a hub of
    unrelated collisions, the classic over-broad-banding symptom).
    Each oriented triangle (a<b<c) is found once at its lowest vertex,
    then EXPLODED to credit all three corners — per-node counts without
    re-running the two-hop join per corner. LCC = 2·tri_v/(deg·(deg−1))
    is one exact int/int float division per row; nodes of degree < 2
    (undefined denominator) are excluded on both engines."""
    pairs = minhash_lsh_pairs(spark, sf_dir).transform(persist_tracked)
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tris = (
        e1.join(
            e2,
            (F.col("e2.doc_a") == F.col("e1.doc_a"))
            & (F.col("e2.doc_b") > F.col("e1.doc_b")),
        )
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_b"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.explode(
                F.array(
                    F.col("e1.doc_a"), F.col("e1.doc_b"), F.col("e2.doc_b")
                )
            ).alias("v")
        )
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    return (
        deg.join(tris, "v", "left")
        .filter(F.col("deg") >= 2)
        .select(
            F.col("v").alias("doc_id"),
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_triangles"),
            F.round(
                (2 * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("lcc"),
        )
        .orderBy("doc_id")
    )


@register(
    "degree_assortativity",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b AS v FROM pairs
      ) GROUP BY v
    ),
    dedges AS (
      SELECT da.deg AS dx, db.deg AS dy
      FROM pairs p
      JOIN deg da ON da.v = p.doc_a
      JOIN deg db ON db.v = p.doc_b
      UNION ALL
      SELECT db.deg, da.deg
      FROM pairs p
      JOIN deg da ON da.v = p.doc_a
      JOIN deg db ON db.v = p.doc_b
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
    tags=("graph", "stats", "dedup", "agg"),
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the LSH candidate graph — do
    high-degree documents collide with other high-degree documents
    (r > 0, the banding-hotspot signature) or with low-degree ones
    (r < 0, hub-and-spoke dup clusters)? Pearson correlation of
    endpoint degrees over the SYMMETRIZED directed edge list: the
    moment sums Σdx, Σdx·dy, Σdx² are exact integers (DECIMAL(38,0)
    for the products — degree² · edges overflows a LONG on a 100 TB
    graph), and the whole r is one float expression on the single
    output row. Two broadcast-degree joins + one partial-aggregable
    reduction; nothing touches the graph twice."""
    pairs = minhash_lsh_pairs(spark, sf_dir).transform(persist_tracked)
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("doc_a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("doc_b"), F.col("deg").alias("degb"))
    joined = pairs.join(F.broadcast(da), "doc_a").join(
        F.broadcast(db), "doc_b"
    )
    dedges = joined.select(
        F.col("dega").alias("dx"), F.col("degb").alias("dy")
    ).unionAll(
        joined.select(F.col("degb").alias("dx"), F.col("dega").alias("dy"))
    )
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


RICH_CLUB_KS = (2, 4, 8)


@register(
    "rich_club_coefficient",
    oracle=f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b AS v FROM pairs
      ) GROUP BY v
    ),
    ks AS (SELECT unnest([2, 4, 8]) AS k),
    club AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS n_k
      FROM ks k JOIN deg d ON d.deg > k.k
      GROUP BY k.k
    ),
    club_edges AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS e_k
      FROM ks k
      JOIN pairs p ON TRUE
      JOIN deg da ON da.v = p.doc_a AND da.deg > k.k
      JOIN deg db ON db.v = p.doc_b AND db.deg > k.k
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
    tags=("graph", "stats", "dedup", "agg"),
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the LSH candidate graph at
    k ∈ (2, 4, 8): among nodes of degree > k, what fraction of
    their possible pairwise edges exist? A rising φ(k) means the most
    collision-prone documents preferentially collide with EACH OTHER —
    the signature of a shared boilerplate core (one giant template
    family) as opposed to many disjoint dup clusters. Exact counts
    end to end: club sizes from a degree filter per k (the 3-value k
    domain broadcasts), club-internal edges by two broadcast degree
    joins over the bounded pair set, φ one int/int division per k."""
    pairs = minhash_lsh_pairs(spark, sf_dir).transform(persist_tracked)
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    ).transform(persist_tracked)
    # k domain via explode of a literal array — narrow 3× expansion,
    # no join node (the audit-clean constant-domain form)
    k_arr = F.array(*[F.lit(k) for k in RICH_CLUB_KS])
    club = (
        deg.select("deg", F.explode(k_arr).alias("k"))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_k"))
    )
    da = deg.select(F.col("v").alias("doc_a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("doc_b"), F.col("deg").alias("degb"))
    club_edges = (
        pairs.join(F.broadcast(da), "doc_a")
        .join(F.broadcast(db), "doc_b")
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


#: Harmonic-centrality fixed-point scale: LCM(1..8), so 1/d is the
#: exact integer HARM_SCALE // d for every hop distance this query can
#: produce (d ≤ BFS_HOPS = 4, with headroom to 8) and per-source scores
#: are exact BIGINT sums — order-independent under any partitioning.
HARM_SCALE = 840
HARM_SEEDS = 8


@register(
    "harmonic_centrality_seeds",
    oracle=f"""
    WITH RECURSIVE pairs AS ({LSH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    seeds AS (
      SELECT DISTINCT doc_a AS s FROM pairs
      ORDER BY doc_a LIMIT {HARM_SEEDS}
    ),
    bfs(s, doc_id, lvl) AS (
      SELECT s, s, 0 FROM seeds
      UNION
      SELECT b.s, e.dst, b.lvl + 1
      FROM bfs b JOIN edges e ON e.src = b.doc_id
      WHERE b.lvl < {BFS_HOPS}
    ),
    dist AS (
      SELECT s, doc_id, min(lvl) AS d
      FROM bfs GROUP BY s, doc_id
    )
    SELECT s AS source_doc,
           CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum({HARM_SCALE} // d) AS BIGINT) AS harmonic_fix,
           round(CAST(sum({HARM_SCALE} // d) AS DOUBLE)
                 / {HARM_SCALE}, 6) AS harmonic
    FROM dist WHERE d > 0
    GROUP BY s
    ORDER BY harmonic_fix DESC, s
    """,
    tags=("graph", "iterative", "centrality", "dedup"),
)
def harmonic_centrality_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality (Σ 1/d over reachable targets, the
    disconnected-graph-safe closeness variant) for the 8
    lowest-id candidate-graph vertices, by one MULTI-SOURCE 4-hop BFS —
    the "which documents sit closest to the rest of their near-dup
    neighborhood" ranking, and the multi-source generalization of
    ``bfs_levels_from_min_vertex`` (one traversal carries all sources
    as a key column; K seeds cost one extra shuffle key, not K
    traversals). 1/d is the exact integer 840 // d (840 = LCM(1..8) ≥
    any hop count here), so scores are exact BIGINT sums replayed by
    the oracle's recursive CTE, and the only float is one final
    display division. Per hop: frontier ⋈ edges (shuffle on the edge
    key), distinct, anti-join against visited — work proportional to
    the union of wavefronts; lineage cut per hop with localCheckpoint
    (the components.py lesson)."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    edges = (
        pairs.select(
            F.col("doc_a").alias("e_src"), F.col("doc_b").alias("e_dst")
        )
        .unionAll(
            pairs.select(
                F.col("doc_b").alias("e_src"), F.col("doc_a").alias("e_dst")
            )
        )
        .localCheckpoint()
    )
    seeds = (
        pairs.select(F.col("doc_a").alias("s"))
        .distinct()
        .orderBy("s")
        .limit(HARM_SEEDS)
    )
    levels = seeds.select(
        "s", F.col("s").alias("doc_id"), F.lit(0).alias("lvl")
    ).localCheckpoint()
    frontier = levels
    for hop in range(1, BFS_HOPS + 1):
        reached = (
            frontier.join(edges, frontier.doc_id == edges.e_src)
            .select("s", F.col("e_dst").alias("doc_id"), F.lit(hop).alias("lvl"))
            .distinct()
        )
        frontier = reached.join(
            levels, ["s", "doc_id"], "left_anti"
        ).localCheckpoint()
        levels = levels.unionAll(frontier).localCheckpoint()
    dist = levels.groupBy("s", "doc_id").agg(F.min("lvl").alias("d"))
    return (
        dist.filter(F.col("d") > 0)
        .groupBy(F.col("s").alias("source_doc"))
        .agg(
            F.count("*").alias("n_reached"),
            F.sum(F.expr(f"{HARM_SCALE} div d")).alias("harmonic_fix"),
            F.round(
                F.sum(F.expr(f"{HARM_SCALE} div d")).cast("double")
                / HARM_SCALE,
                6,
            ).alias("harmonic"),
        )
        .orderBy(F.col("harmonic_fix").desc(), "source_doc")
    )


@register(
    "copurchase_triangle_stats",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a
      JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
      JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
    ),
    deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e
      ) GROUP BY v
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
             CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT n_parts, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0
                THEN CAST(3 * n_triangles AS DOUBLE) / n_wedges
           END AS transitivity
    FROM agg, tri
    """,
    tags=("graph", "join", "relational"),
)
def copurchase_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the part CO-PURCHASE graph (parts sharing an
    order are connected) — the graph-family operator on a DATA-DERIVED,
    NON-DEGENERATE edge list, so unlike the LSH-pair graph it stays
    cross-engine verifiable at every SF (the sf0.1 skip-list class (a)
    does not apply here).

    Scale shape: edge enumeration is the lineitem self-join on
    l_orderkey — per-order pair fan-out is C(items, 2) <= C(7, 2) = 21
    (TPC-H order size is business-bounded, independent of corpus
    scale), so edges are linear in orders. Triangles use the oriented
    two-hop join (pa < pb < pc, each triangle counted once at its
    lowest vertex); wedges are one partial-aggregable degree pass.
    Transitivity = 3*tri/wedges, an int/int division both engines
    compute identically, NULL-guarded for the empty-graph edge."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
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
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
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
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("pa").alias("v"))
        .unionAll(edges.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    agg = deg.agg(
        F.count("*").alias("n_parts"),
        F.expr("sum(deg) div 2").alias("n_edges"),
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
    )
    return agg.crossJoin(tri).select(
        "n_parts",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            (F.lit(3) * F.col("n_triangles")).cast("double")
            / F.col("n_wedges"),
        ).alias("transitivity"),
    )


_COPURCHASE_EDGES_SQL = """
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey <> a.l_partkey
"""


@register(
    "copurchase_pagerank_top20",
    oracle=f"""
    WITH edges AS ({_COPURCHASE_EDGES_SQL}),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT p_partkey FROM part),
    params AS (
      SELECT CAST({PR_SCALE} // count(*) AS BIGINT) AS base FROM part
    ),
    it0 AS (SELECT p_partkey, (SELECT base FROM params) AS pr FROM nodes),
    """ + ",\n    ".join(
        f"""in{k} AS (
      SELECT e.dst AS p_partkey, CAST(sum(p.pr // d.deg) AS BIGINT) AS inflow
      FROM edges e
      JOIN it{k - 1} p ON p.p_partkey = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    it{k} AS (
      SELECT n.p_partkey,
             ({_D_DEN - _D_NUM} * (SELECT base FROM params)) // {_D_DEN}
             + ({_D_NUM} * coalesce(i.inflow, 0)) // {_D_DEN} AS pr
      FROM nodes n LEFT JOIN in{k} i USING (p_partkey)
    )"""
        for k in range(1, PR_ITERS + 1)
    ) + f"""
    SELECT p_partkey, pr FROM it{PR_ITERS}
    ORDER BY pr DESC, p_partkey LIMIT 20
    """,
    tags=("graph", "iterative", "relational"),
)
def copurchase_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank hub parts of the co-purchase graph — the ITERATIVE
    graph operator on the data-derived, non-degenerate edge list
    (see ``copurchase_triangle_stats``), so unlike the LSH-graph
    iterative family its unrolled oracle stays cross-engine verifiable
    at sf0.1. Same BIGINT fixed-point recurrence as
    ``pagerank_fixed_point`` (integer mass 10**12, damping
    _D_NUM/_D_DEN as an exact ratio, floor division everywhere —
    bit-reproducible under any partitioning); nodes are ALL parts, so
    never-co-purchased parts keep the teleport term only. Output is
    the top-20 hubs with a total-order tie-break (pr DESC, p_partkey),
    so both engines cut the identical prefix."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") != F.col("a.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .transform(persist_tracked)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).transform(persist_tracked)
    base = part.agg(
        F.expr(f"cast({PR_SCALE} div count(*) as bigint)").alias("base")
    )
    pr = part.crossJoin(F.broadcast(base)).select(
        "p_partkey", F.col("base").alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(pr, edges.src == pr.p_partkey)
            .join(deg, "src")
            .select(
                F.col("dst").alias("p_partkey"),
                F.expr("pr div deg").alias("share"),
            )
        )
        inflow = contrib.groupBy("p_partkey").agg(
            F.sum("share").alias("inflow")
        )
        pr = (
            part.join(inflow, "p_partkey", "left")
            .crossJoin(F.broadcast(base))
            .select(
                "p_partkey",
                (
                    F.expr(f"({_D_DEN - _D_NUM} * base) div {_D_DEN}")
                    + F.expr(
                        f"({_D_NUM} * coalesce(inflow, 0L)) div {_D_DEN}"
                    )
                ).alias("pr"),
            )
        ).localCheckpoint()  # cut lineage: plans stay O(1) per iteration
        # (VERDICT r5 task 7 — matches components.py; PR_ITERS can now
        # be raised without growing one joined plan per round)
    return pr.orderBy(F.col("pr").desc(), "p_partkey").limit(20)


#: HITS (Kleinberg 1999) over the customer→part purchase bipartite
#: graph: HITS_ROUNDS full hub↔authority alternations, each half-step
#: renormalized to |score| ≤ HITS_VSCALE by truncating integer
#: division (Spark div ≡ DuckDB // toward zero), so the whole
#: trajectory is exact integers and the unrolled oracle replays it
#: bit-for-bit. Scores are non-negative throughout (sums of
#: non-negative starts), so truncation direction never matters here;
#: the div/// parity note is for symmetry with power_iteration.
HITS_ROUNDS = 4
HITS_VSCALE = 1000


def _hits_stage_sql(k: int) -> str:
    return f"""a{k}raw AS MATERIALIZED (
      SELECT e.part, CAST(sum(h.s) AS BIGINT) AS s
      FROM edges e JOIN h{k - 1} h ON h.cust = e.cust
      GROUP BY e.part
    ),
    am{k} AS (SELECT greatest(max(s) // {HITS_VSCALE}, 1) AS m FROM a{k}raw),
    a{k} AS MATERIALIZED (
      SELECT part, s // m AS s FROM a{k}raw, am{k}
    ),
    h{k}raw AS MATERIALIZED (
      SELECT e.cust, CAST(sum(a.s) AS BIGINT) AS s
      FROM edges e JOIN a{k} a ON a.part = e.part
      GROUP BY e.cust
    ),
    hm{k} AS (SELECT greatest(max(s) // {HITS_VSCALE}, 1) AS m FROM h{k}raw),
    h{k} AS MATERIALIZED (
      SELECT cust, s // m AS s FROM h{k}raw, hm{k}
    )"""


_HITS_STAGES_SQL = ",\n    ".join(
    _hits_stage_sql(k) for k in range(1, HITS_ROUNDS + 1)
)


@register(
    "hits_hubs_authorities",
    oracle=f"""
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS MATERIALIZED (
      SELECT DISTINCT cust, CAST({HITS_VSCALE} AS BIGINT) AS s FROM edges
    ),
    {_HITS_STAGES_SQL},
    tops AS (
      SELECT 'authority' AS side, part AS node_id, s
      FROM a{HITS_ROUNDS}
      ORDER BY s DESC, part LIMIT 20
    ),
    toph AS (
      SELECT 'hub' AS side, cust AS node_id, s
      FROM h{HITS_ROUNDS}
      ORDER BY s DESC, cust LIMIT 20
    )
    SELECT side, CAST(node_id AS BIGINT) AS node_id,
           CAST(s AS BIGINT) AS score_scaled
    FROM (SELECT * FROM tops UNION ALL SELECT * FROM toph)
    ORDER BY side, score_scaled DESC, node_id
    """,
    tags=("graph", "iterative", "ranking"),
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the customer→part
    purchase graph: authority(part) sums its buyers' hub scores,
    hub(customer) sums its parts' authority scores, alternating for
    HITS_ROUNDS rounds with integer renormalization each half-step —
    the link-analysis complement to pagerank_fixed_point (bipartite,
    two mutually-recursive scores instead of one stochastic walk).
    Exactness: all-integer trajectory (see constant note), top-20 per
    side by (score, id) total order. Distributed shape per half-step:
    one edges⋈scores hash join + one map-side-combinable sum-groupBy
    (linear in edges, one shuffle) + a 1-row max broadcast; the edge
    list builds once from a single orders⋈lineitem equi-join and is
    lineage-cut. Top-K is TakeOrdered — never a global sort."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("cust")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part")
    )
    edges = (
        o.join(li, "ok").select("cust", "part").distinct().localCheckpoint()
    )
    h = edges.select("cust").distinct().select(
        "cust", F.lit(HITS_VSCALE).cast("long").alias("s")
    )

    def _renorm(df, key):
        m = df.agg(
            F.greatest(
                F.expr(f"div(max(s), {HITS_VSCALE})"), F.lit(1).cast("long")
            ).alias("m")
        )
        return (
            df.crossJoin(F.broadcast(m))
            .select(key, F.expr("div(s, m)").cast("long").alias("s"))
            .localCheckpoint()
        )

    a = None
    for _ in range(HITS_ROUNDS):
        araw = (
            edges.join(h, "cust")
            .groupBy("part")
            .agg(F.sum("s").cast("long").alias("s"))
        )
        a = _renorm(araw, "part")
        hraw = (
            edges.join(a, "part")
            .groupBy("cust")
            .agg(F.sum("s").cast("long").alias("s"))
        )
        h = _renorm(hraw, "cust")
    tops = (
        a.orderBy(F.desc("s"), "part")
        .limit(20)
        .select(
            F.lit("authority").alias("side"),
            F.col("part").cast("long").alias("node_id"),
            F.col("s").cast("long").alias("score_scaled"),
        )
    )
    toph = (
        h.orderBy(F.desc("s"), "cust")
        .limit(20)
        .select(
            F.lit("hub").alias("side"),
            F.col("cust").cast("long").alias("node_id"),
            F.col("s").cast("long").alias("score_scaled"),
        )
    )
    return tops.unionAll(toph).orderBy(
        "side", F.desc("score_scaled"), "node_id"
    )
