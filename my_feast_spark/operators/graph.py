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

import math

from pyspark.sql import DataFrame, functions as F

#: target edges per partition inside the propagation loop — the edge
#: graph is orders of magnitude smaller than the corpus that produced
#: it, so the loop re-partitions to match ITS size, not the corpus scan
#: parallelism (at 32 default partitions, a few-hundred-edge graph pays
#: ~32x scheduler overhead per round for nothing; with billions of
#: edges the cap below keeps the session default).
_EDGES_PER_PARTITION = 100_000


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
    spark = edges.sparkSession
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint()
    # Size loop parallelism to the materialized edge count (one cheap
    # count over the checkpoint), capped at the session default.
    default_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_edges = sym.count()
    loop_p = max(1, min(default_p, math.ceil(n_edges / _EDGES_PER_PARTITION)))
    if loop_p < default_p:
        sym = sym.repartition(loop_p, "b").localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    # Convergence check: per-vertex labels are monotonically
    # non-increasing, so the EXACT label sum (decimal — no long
    # overflow at any vertex count) strictly decreases until the
    # fixpoint; an unchanged sum means no label moved. One tiny
    # aggregate per round instead of a labels-vs-labels join + count.
    label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(label_sum).collect()[0][0]
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels.withColumnRenamed("id", "b"), "b"
        ).select(F.col("a").alias("id"), "label")
        new_labels = (
            labels.union(neighbor_labels)
            .repartition(loop_p, "id")
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # eager: also truncates lineage per round
        )
        new_sum = new_labels.agg(label_sum).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(
        F.col("id").alias(out_id), F.col("label").alias(out_label)
    )
