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
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Returns (node, component) — component = min node id (string
    order) reachable from the node. Deterministic fixpoint.

    Small-graph fast path: dedup/clustering edge lists are usually
    FAR smaller than the corpus that produced them (that's the point
    of the LSH/cosine filtering upstream), and the distributed
    min-label loop pays several shuffles + an eager checkpoint + a
    count PER ROUND — ~9 s for a 742-edge graph at sf0.1, all fixed
    cost. When the deduplicated undirected edge list is at most
    `driver_threshold` rows, collect it and run union-find on the
    driver: one bounded transfer (edge-list-sized, the same contract
    as kmeans' model-sized transfer), identical labels (component =
    min member under the same ordering). The distributed loop remains
    the path for edge lists that don't fit the driver."""
    # an edge requires BOTH endpoints: NULL src/dst rows (a missing
    # dimension value upstream) are dropped, never propagated into the
    # label lattice — a NULL node would crash the driver union-find's
    # ordering and has no graph meaning
    edges = edges.filter(
        F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
    )
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
    n_und = und.count()
    if n_und <= driver_threshold:
        return _driver_components(und)
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


def _driver_components(und: DataFrame) -> DataFrame:
    """Union-find over a collected (a, b) undirected edge list; returns
    the same (node, component=min member) frame the distributed loop
    converges to. Path-compressed + union-by-root-min, so label =
    exact min of each component under the column's natural ordering
    (string order for string ids, numeric for numerics — identical to
    F.min in the distributed rounds)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in und.select("a", "b").toLocalIterator():
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as the root so the root IS the min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(n, find(n)) for n in parent]
    spark = und.sparkSession
    schema = und.select(F.col("a").alias("node"), F.col("a").alias("component")).schema
    return spark.createDataFrame(rows, schema)
