"""Connected components over duplicate-pair edges — dedup clustering.

Near-dup detection (MinHash/SimHash/embedding pairs) emits EDGES; a
curation pipeline needs CLUSTERS: transitive groups of documents that
are all variants of one another, so it can keep one canonical doc per
cluster. (Pairwise keep-one is wrong under transitivity: keep(a of a-b),
keep(b of b-c) can drop nothing from {a,b,c}.)

Implementation is iterative min-label propagation on the symmetrized
edge list: every vertex starts labeled with its own id and repeatedly
takes the min of its neighbors' labels until a fixpoint — O(component
diameter) rounds, each one join + one groupBy (both shuffles keyed on
vertex id, so AQE coalesces/skew-splits them), with ``localCheckpoint``
truncating the plan between rounds (an iterative loop otherwise builds
an exponentially deep lineage). Driver involvement is one convergence
count per round — the classic Spark iterative-algorithm shape.

Near-dup graphs are overwhelmingly tiny components (pairs/triangles of
variants), so diameters are small and the loop converges in a handful
of rounds. For adversarially long chains or power-law hubs, the
documented upgrade is the large-star/small-star algorithm (alternating
star contractions, provably O(log n) rounds) — same join/agg building
blocks, more rounds math; not needed for the duplicate-cluster shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
    out_id: str = "id",
    out_label: str = "cluster_id",
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``;
    the component id is the minimum vertex id in the component."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels.withColumnRenamed("id", "b"), "b"
        ).select(F.col("a").alias("id"), "label")
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # eager: also truncates lineage per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias(out_id), F.col("label").alias(out_label)
    )
