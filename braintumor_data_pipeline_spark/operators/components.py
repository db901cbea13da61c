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
    for _ in range(30):  # diameter bound; dup clusters are near-cliques
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
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


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
