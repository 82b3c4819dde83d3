"""Property tests for the iterative graph + IVF operators.

connected_components is checked against an independent pure-Python
union-find on random edge lists (Hypothesis); ivf_topk is checked
against brute force: probing ALL cells must equal exact top-k, and
default probing must keep recall on the synthetic embeddings.
"""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from nightcrawlercmd_spark.operators import annsearch as ANN
from nightcrawlercmd_spark.operators.graphs import connected_components, dedup_clusters

SF = "/root/testdata/sf0.001"


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    out = {}
    for node in parent:
        root = find(node)
        out.setdefault(root, set()).add(node)
    labels = {}
    for members in out.values():
        lo = min(members)
        for m in members:
            labels[m] = lo
    return labels


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a bigint, doc_b bigint"
    )
    got = {r["node"]: r["label"] for r in connected_components(df).collect()}
    want = _union_find_components(edges)
    assert got == want


def test_connected_components_frees_checkpoint_blocks(spark):
    """Superseded per-sweep localCheckpoint blocks must actually leave
    block-manager storage. DataFrame.unpersist() is a NO-OP on
    checkpointed data (it only consults the CacheManager), so the
    implementation frees the underlying RDDs by id — a long-diameter
    graph would otherwise accumulate ~diameter label-table copies."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = {int(i) for i in jmap.keySet().toArray()}
    # a 12-node chain: diameter 11 → many sweeps, many checkpoints
    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "doc_a bigint, doc_b bigint")
    labels = connected_components(df)
    assert labels.count() == 13
    after = {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
    # only the RETURNED labels' checkpoint may remain (caller owns it);
    # the edge list and every superseded sweep must be gone
    assert len(after - before) <= 1, after - before


def test_dedup_clusters_sizes_consistent(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    rows = dedup_clusters(df).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert {c: len(v) for c, v in by_cluster.items()} == {1: 3, 10: 2, 20: 4}
    for c, members in by_cluster.items():
        assert all(m["cluster_size"] == len(members) for m in members)
        assert min(m["doc_id"] for m in members) == c


def _emb_and_query(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    return emb, qv


def test_ivf_probe_all_cells_equals_brute_force(spark):
    """nprobe = K prunes nothing, so IVF must return exactly the exact
    top-k (same ids, same scores) — the pruning is the only source of
    approximation in the operator."""
    emb, qv = _emb_and_query(spark)
    k_cells = 8
    ivf = ANN.ivf_topk(emb, qv, centroids_k=k_cells, nprobe=k_cells, k=10)
    bf = ANN.brute_force_topk(emb, qv, k=10)
    got = [(r["vec_id"], r["sim"]) for r in ivf.collect()]
    want = [(r["vec_id"], r["sim"]) for r in bf.collect()]
    assert got == want


def test_ivf_default_probe_recall(spark):
    emb, qv = _emb_and_query(spark)
    ivf_ids = {r["vec_id"] for r in ANN.ivf_topk(emb, qv, nprobe=2, k=10).collect()}
    bf_ids = {r["vec_id"] for r in ANN.brute_force_topk(emb, qv, k=10).collect()}
    assert len(ivf_ids & bf_ids) >= 5  # recall@10 ≥ 0.5 with 2/8 cells probed
