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
    if edges.filter(F.col("src").isNull() | F.col("dst").isNull()).limit(1).count():
        raise ValueError(
            f"connected_components: null ids in pairs ({id_a}/{id_b}) — "
            "min-label propagation would silently drop them"
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
