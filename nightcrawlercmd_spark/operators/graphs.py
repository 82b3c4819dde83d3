"""Iterative graph operators: connected components for dedup clustering.

A MinHash-LSH (or SimHash / embedding-LSH) near-dup pass emits *pairs*
(`A ~ B`). Turning pairwise evidence into dedup *groups* ("keep one doc
per component") needs the transitive closure — connected components
over the pair list. This is the standard final step of a web-scale
dedup pipeline and the reference has no analog (it has no dedup at
all); it is part of the training-data layer this engine adds.

Algorithm: min-label propagation. ``label(v) := min(label(v),
min_{u in N(v)} label(u))`` swept to fixpoint. Each sweep is one
shuffle (hash join edges×labels + groupBy-min, both map-side
combinable); convergence takes O(component diameter) sweeps. Near-dup
components are star-like (diameter <= ~3 — most dups cluster around a
canonical text), so a handful of sweeps suffice and this beats the
O(log n)-round large-star/small-star alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) on constant
factors; switch to the alternation if long-chain components are
expected. ``localCheckpoint`` truncates lineage each sweep so the plan
does not grow with iteration count; on a real cluster use a
fault-tolerant ``checkpoint()`` (HDFS/S3 checkpoint dir) instead.

The early-exit test is the label-sum fixpoint certificate (labels are
per-node non-increasing, so an unchanged exact sum means no label
moved) — an O(1)-result agg folded into the same job that materializes
each sweep's checkpoint, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checkpoint_tracked(
    df: DataFrame, action=None
) -> tuple[DataFrame, set[int], object]:
    """``localCheckpoint`` + the ids of the RDD blocks it persisted.
    ``DataFrame.unpersist()`` is a NO-OP on checkpointed data — it only
    consults the CacheManager, which never registered the checkpoint
    RDD — so freeing a superseded sweep requires unpersisting the
    underlying RDD by id. The ids are recovered as the diff of
    ``getPersistentRDDs`` around the (synchronous) materialization; the
    loop is driver-sequential so nothing else persists in between.

    ``action`` (checkpointed df → value) doubles as the materializer:
    the checkpoint is marked lazy and the action's full-coverage job
    computes-and-stores every partition while producing its value —
    one job instead of an eager-checkpoint job plus an action job per
    sweep. Without ``action`` the checkpoint is eager as before."""
    sc = df.sparkSession.sparkContext
    before = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    if action is None:
        out = df.localCheckpoint(eager=True)
        val = None
    else:
        out = df.localCheckpoint(eager=False)
        val = action(out)
    after = sc._jsc.getPersistentRDDs()
    new_ids = {int(i) for i in after.keySet().toArray()} - before
    return out, new_ids, val


def _unpersist_ids(df: DataFrame, ids: set[int]) -> None:
    jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        if int(rid) in ids:
            jmap.get(rid).unpersist(False)


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 60
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns ``(node, label)`` where ``label`` is the smallest node id
    in the component — a deterministic canonical representative, so
    downstream "keep the representative, drop the rest" is stable
    across runs and engines.

    The min label travels one hop per sweep, so convergence needs up to
    diameter(component) sweeps. Raises ``RuntimeError`` if ``max_iter``
    sweeps exhaust before the fixpoint — returning partial labels would
    silently split one physical cluster into several, letting
    duplicates survive dedup; long-chain graphs should raise
    ``max_iter`` or switch to star alternation.
    """
    # checkpoint the DIRECTED edge list first, then symmetrize over the
    # materialized copy: every sweep joins against sym, and without the
    # checkpoint the upstream pipeline (e.g. the full MinHash-LSH pair
    # derivation) would re-execute per sweep — and checkpointing the
    # union directly would execute that pipeline twice (once per union
    # branch) in the very first job. The reversed branch now reads the
    # checkpointed blocks instead.
    ce, ce_ids, _ = _checkpoint_tracked(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    sym, sym_ids, _ = _checkpoint_tracked(
        ce.union(ce.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    _unpersist_ids(ce, ce_ids)  # sym supersedes the directed copy

    # Convergence check via the label-sum invariant: each sweep takes
    # new(v) = min(old(v), incoming) so labels are NON-INCREASING per
    # node and the node set is constant — the sum strictly decreases
    # iff any label changed, and an unchanged sum certifies the
    # fixpoint. The map-side-combinable agg rides the SAME job that
    # materializes the sweep's checkpoint (see _checkpoint_tracked),
    # replacing the former join-against-previous + limit + count (a
    # shuffle join plus an extra job per sweep). decimal(38,0) keeps
    # the sum exact far beyond any bigint node-id corpus
    # (n·2^63 < 10^38 for n < 10^19).
    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    labels, labels_ids, prev_sum = _checkpoint_tracked(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        action=_label_sum,
    )
    changed = 1
    for _ in range(max_iter):
        msgs = sym.alias("e").join(
            labels.alias("l"), F.col("e.a") == F.col("l.node")
        ).select(F.col("e.b").alias("node"), F.col("l.label").alias("label"))
        new, new_ids, new_sum = _checkpoint_tracked(
            labels.union(msgs).groupBy("node").agg(F.min("label").alias("label")),
            action=_label_sum,
        )
        changed = int(new_sum != prev_sum)
        prev_sum = new_sum
        # the old sweep's checkpoint blocks are dead once the changed
        # check has consumed them — without this, ~diameter copies of
        # the labels table pile up in block-manager storage (freed by
        # RDD id: DataFrame.unpersist() cannot see checkpoint blocks)
        _unpersist_ids(labels, labels_ids)
        labels, labels_ids = new, new_ids
        if changed == 0:
            break
    # the returned labels no longer reference the edges
    _unpersist_ids(sym, sym_ids)
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "sweeps (component diameter exceeds it); raise max_iter"
        )
    return labels


def dedup_clusters(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Dedup groups from near-dup pairs: ``(doc_id, cluster_id,
    cluster_size)`` for every doc that appears in at least one pair.
    ``cluster_id`` is the min doc_id of the component (the keeper under
    a keep-smallest policy); singletons never enter the edge list and
    are trivially their own keepers."""
    comp = connected_components(edges, src, dst)
    sizes = comp.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )
