"""Connected-component dedup groups (north-star X21 capstone).

Near-duplicate candidate pairs form a graph; real dedup needs its
TRANSITIVE closure (A≈B, B≈C ⇒ {A,B,C} one group even if A,C never
collided). This implements distributed min-label propagation over the
MinHash-LSH candidate-pair graph:

    label(v) ← min(label(v), min label of neighbors);  iterate to fixpoint

Each iteration is two hash joins + an aggregation (all on uniform keys);
iterations ≤ graph diameter, which for dup clusters is tiny (they're
near-cliques — LSH generates most intra-cluster edges directly). This is
the standard large-graph CC recipe (GraphFrames/Pregel-style) expressed
in plain DataFrame ops; the driver only checks a one-row convergence
aggregate per iteration, never the data.

Oracle: a DuckDB **recursive CTE** computing min-reachable-label per
node — an independent formulation of the same closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..registry import register
from .dedup import bands_df

# the oracle rebuilds the same candidate-pair graph via the registered
# minhash_lsh_pairs SQL, then closes it recursively
_PAIRS_SQL_IMPORT = None  # resolved lazily to avoid circular text


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected edges with the SAME connected components as the
    candidate-pair graph, star-reduced: the pair graph connects every
    two docs sharing an LSH bucket (a clique per bucket), and a clique
    has identical connectivity to a star through its min-doc_id hub —
    so emit only (hub, member) per bucket. Edge count drops from
    Σ m²/2 (20M at sf0.1 — quadratic inside dup clusters) to Σ m
    (≈ docs × bands), which is what the propagation loop then joins
    per iteration. This is the bucket-local form of the large-star/
    small-star CC optimization; the oracle still closes the full pair
    graph, and closures agree because star and clique connect the same
    vertex sets."""
    bands = bands_df(spark, sf_dir)
    hubs = bands.groupBy("band", "band_sig").agg(
        F.min("doc_id").alias("hub"), F.count("*").alias("m")
    )
    star = (
        bands.join(hubs.filter(F.col("m") > 1), ["band", "band_sig"])
        .filter(F.col("doc_id") != F.col("hub"))
        .select("hub", "doc_id")
        .distinct()
    )
    fwd = star.select(F.col("hub").alias("src"), F.col("doc_id").alias("dst"))
    return fwd.union(
        star.select(F.col("doc_id").alias("src"), F.col("hub").alias("dst"))
    )


@register(
    "dedup_connected_components",
    oracle=None,  # assigned below (needs the pairs SQL from dedup module)
    tags=("dedup", "graph", "iterative"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → component label (= min doc_id reachable through the
    near-dup graph). Iterative min-label propagation to fixpoint."""
    from ..sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # materialize the edge list once; localCheckpoint also truncates the
    # (expensive) LSH lineage so iterations replan only the propagation
    edges = _edges(spark, sf_dir).localCheckpoint()
    labels = docs.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
    )
    labels = _min_label_propagation(labels, edges)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def _min_label_propagation(
    labels: DataFrame, edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Min-label propagation to fixpoint (pure extraction of the r3 loop
    body — plans are bit-identical to the inlined form). ``labels`` is
    (node, label) with label = node initially; ``edges`` is a directed
    (src, dst) frame carrying BOTH orientations. Each iteration: two
    hash joins + one agg on uniform keys; localCheckpoint cuts lineage
    so plans stay O(1) per iteration; the driver sees only a one-row
    convergence count."""
    for _ in range(max_iter):  # diameter bound; dup clusters are near-cliques
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.node2, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint()  # cut lineage: plans stay O(1) per iteration
        changed = new_labels.agg(
            F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("c")
        ).collect()[0]["c"]
        labels = new_labels.select("node", "label")
        if not changed:
            break
    return labels


def _install_oracle() -> None:
    """Attach the recursive-CTE oracle (built from the registered
    minhash_lsh_pairs SQL so both sides see the identical graph)."""
    from ..registry import _REGISTRY

    pairs_sql = _REGISTRY["minhash_lsh_pairs"].oracle
    _REGISTRY["dedup_connected_components"].oracle = f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS label FROM documents
      UNION
      SELECT e.src AS node, r.label
      FROM reach r
      JOIN edges e ON e.dst = r.node
      WHERE r.label < e.src
    )
    SELECT node AS doc_id, min(label) AS component
    FROM reach
    GROUP BY node
    """


_install_oracle()


@register(
    "component_modularity",
    oracle=None,  # assigned below (needs the pairs SQL from dedup module)
    tags=("dedup", "graph", "evaluation", "agg"),
)
def component_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity decomposition of the connected-component dedup
    partition over the LSH candidate graph — the number that says
    whether the dup clusters are tight communities or an artifact of a
    too-aggressive banding (near-0 contributions = the partition
    explains no edge structure). Per component c:
    contribution = e_c/m − (d_c/2m)², reported alongside the exact
    integer ingredients (node count, internal edge count, degree sum);
    the global Q is the plain sum of the contribution column's exact
    numerators, which the tests pin. All counts are BIGINTs from
    partial-aggregable groupBys; the single scalar m rides a 1-row
    cross join (the allowlisted scalar-broadcast pattern), and the
    contribution is ONE float expression per output row over
    exact-integer-valued doubles (≤4·10¹⁰ here — far inside 2⁵³, so
    both engines compute identical bits). Scale note: components and
    degrees shuffle on content-uniform keys; nothing global moves."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, sf_dir).transform(persist_tracked)
    comp = dedup_connected_components(spark, sf_dir)
    m_df = pairs.agg(F.count("*").alias("m"))
    ec = (
        pairs.join(
            comp.select(F.col("doc_id").alias("doc_a"), "component"), "doc_a"
        )
        .groupBy("component")
        .agg(F.count("*").alias("e_c"))
    )
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("d"))
    )
    dc = (
        deg.join(comp, "doc_id")
        .groupBy("component")
        .agg(F.sum("d").alias("d_c"))
    )
    nn = comp.groupBy("component").agg(F.count("*").alias("n_nodes"))
    out = (
        nn.join(ec, "component", "left")
        .join(dc, "component", "left")
        .crossJoin(m_df)
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


def _install_modularity_oracle() -> None:
    from ..registry import _REGISTRY

    pairs_sql = _REGISTRY["minhash_lsh_pairs"].oracle
    _REGISTRY["component_modularity"].oracle = f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS label FROM documents
      UNION
      SELECT e.src AS node, r.label
      FROM reach r
      JOIN edges e ON e.dst = r.node
      WHERE r.label < e.src
    ),
    comp AS (
      SELECT node AS doc_id, min(label) AS component
      FROM reach GROUP BY node
    ),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
    ec AS (
      SELECT c.component, CAST(count(*) AS BIGINT) AS e_c
      FROM pairs p JOIN comp c ON c.doc_id = p.doc_a
      GROUP BY c.component
    ),
    deg AS (
      SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS d
      FROM edges GROUP BY src
    ),
    dc AS (
      SELECT c.component, CAST(sum(d.d) AS BIGINT) AS d_c
      FROM deg d JOIN comp c ON c.doc_id = d.doc_id
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
    """


_install_modularity_oracle()
