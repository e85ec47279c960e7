"""Duplicate-group clustering: connected components over near-dup pairs.

A dedup pipeline's pair stage (MinHash/SimHash/exact Jaccard — see
``extensions.dedup``) emits EDGES; keeping "one doc per duplicate
group" requires the transitive closure of those edges: if A~B and B~C,
then {A,B,C} is one group even when A~C was never emitted. This module
computes that closure as (node, comp) labels with ``comp`` = the
minimum node id reachable from ``node``.

Algorithm: hash-min label propagation — every node starts labeled with
its own id; each round every node takes the min of its own and its
neighbors' labels; converges when no label changes. Rounds needed =
the eccentricity of the min-id node within its component, which for
near-dup clusters (dense, tiny diameter) is 2-4. Each round is one
equi-join + one hash aggregate — all shuffles are on the node id, so
AQE coalesces/skew-splits them like any other keyed stage.

Scale notes (100 TB): the label frame is two longs per node and the
edge frame two longs per edge — both narrow. The driver loop runs
O(diameter) Spark jobs, NOT O(n); for adversarial long-chain graphs
(diameter in the hundreds) the published fix is the two-phase
large-star/small-star iteration (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14), which this hash-min loop upgrades
to without changing the contract. Lineage is truncated every round by
materializing the persisted label frame before releasing the previous
generation, so the logical plan stays O(1) deep across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions import cachereg


#: below this many (directed) edges the transitive closure runs as a
#: driver-side union-find over one collect of the edge list instead of
#: the iterative join loop. 2M edges of two longs is a few tens of MB —
#: broadcast-scale, the same driver budget a small join side gets —
#: while the loop's floor is O(diameter) Spark jobs (join + checkpoint +
#: convergence collect each round), which dominates wall time whenever
#: the duplicate graph is small. Near-dup graphs at curation scale are
#: usually ABOVE this and take the loop; override per session with
#: spark.sqlbackuphistoryetl.cc.driverMaxEdges (0 disables the
#: fallback entirely).
_CC_DRIVER_MAX_EDGES = 2_000_000


def _driver_components(edge_rows) -> dict:
    """Union-find with min-id labels over collected (src, dst) rows —
    the exact fixpoint hash-min propagation converges to. Python str
    comparison is code-point order, which equals Spark's UTF-8 binary
    order for every Unicode string, so min() agrees across engines for
    string ids as well as numeric ones."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        cur = comp_min.get(root)
        if cur is None or node < cur:
            comp_min[root] = node
    return {node: comp_min[find(node)] for node in parent}


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; ``comp`` is
    the min node id of the node's connected component. Ids may be any
    orderable atomic type (long, string/UUID, …) — hash-min label
    propagation only needs min(), so no numeric cast is applied (an
    earlier ``cast("long")`` here silently nulled UUID ids, emptying the
    component map downstream — r3 ADVICE).

    Nodes with no edges never appear in ``pairs`` and so are absent —
    callers wanting singleton rows left-join this result onto the
    corpus and coalesce(comp, id). Raises on null ids (min() would
    silently drop them) and if the loop hits ``max_iter`` without
    converging (labels would be an under-propagated prefix — wrong
    answer, not a degraded one).

    Scale dispatch (r13): one aggregate over the persisted edge frame
    counts edges (and nulls) first; at or below
    ``spark.sqlbackuphistoryetl.cc.driverMaxEdges`` (default
    ``_CC_DRIVER_MAX_EDGES``) the closure is a driver union-find over
    one collect — identical labels, two jobs total instead of
    O(diameter) join+checkpoint+collect rounds. Above it, the loop
    runs exactly as before.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
    )
    # Edges are re-joined every round — one materialization, released at
    # the next connected_components() call (generation-scoped).
    cachereg.begin("concomp")
    edges = cachereg.persist("concomp", edges)
    # one job: materialize the cache, count edges, surface null ids
    stats = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("src").isNull() | F.col("dst").isNull()).cast("long")
        ).alias("bad"),
    ).collect()[0]
    if (stats["bad"] or 0) > 0:
        raise ValueError(
            f"connected_components: null ids in pairs ({id_a}/{id_b}) — "
            "min-label propagation would silently drop them"
        )
    spark = pairs.sparkSession
    try:
        driver_max = int(
            spark.conf.get(
                "spark.sqlbackuphistoryetl.cc.driverMaxEdges",
                str(_CC_DRIVER_MAX_EDGES),
            )
        )
    except ValueError:
        driver_max = _CC_DRIVER_MAX_EDGES
    if 0 < stats["n"] <= driver_max:
        labels = _driver_components(edges.collect())
        node_type = edges.schema["src"].dataType
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("node", node_type, False),
                StructField("comp", node_type, False),
            ]
        )
        return spark.createDataFrame(
            sorted(labels.items()), schema
        )
    if stats["n"] == 0:
        # empty edge frame: no nodes, preserve the (node, comp) shape
        return edges.select(
            F.col("src").alias("node"), F.col("dst").alias("comp")
        )

    # Per-round label frames go through localCheckpoint, NOT persist:
    # each round's plan must start from a lineage-truncated LogicalRDD.
    # A persist chain keeps the full iteration lineage alive, and
    # unpersisting a mid-chain ancestor makes CacheManager re-canonicalize
    # every dependent cache entry over an O(rounds)-deep plan — measured
    # blowing up past ~6 rounds. Checkpointed round frames are freed by
    # the ContextCleaner when the previous round's DataFrame goes out of
    # scope; on a real cluster prefer reliable checkpoint() (HDFS-backed)
    # for executor-loss tolerance.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = edges.join(labels, edges["dst"] == labels["node"]).groupBy(
            "src"
        ).agg(F.min("comp").alias("nbr_comp"))
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                labels["node"].alias("node"),
                F.least(
                    labels["comp"], F.coalesce("nbr_comp", labels["comp"])
                ).alias("comp"),
                (F.col("nbr_comp") < labels["comp"]).alias("_improved"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.agg(
                F.coalesce(
                    F.sum(F.col("_improved").cast("int")), F.lit(0)
                ).alias("c")
            ).collect()[0]["c"]
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter too large — use a large-star/small-star pass)"
        )

    return labels.select("node", "comp")


def dedup_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """``df`` reduced to one row per duplicate group: the min-id member
    of each connected component survives; documents in no pair survive
    unchanged. This is the "keep one copy" terminal of a dedup
    pipeline: pairs → components → anti-join the non-representatives.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
