

def test_semantic_dedup_planted_twins(spark):
    """SemDeDup chain: planted near-twins (last 4 of 64 components
    zeroed, cosine ~0.97) must land in their base's duplicate group
    with the min-id member kept — WHEN the coarse quantizer co-locates
    them (cross-cluster pairs are the documented recall trade, so the
    assertion conditions on same-cluster, exactly like the oracle);
    clean vectors come back as kept singletons; NULL and wrong-length
    vectors are kept singletons with a NULL cluster, never dropped."""
    import numpy as np
    from pyspark.sql import functions as F

    from vinum_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(40)]
    twins = [(i + 1000, v[:60] + [0.0, 0.0, 0.0, 0.0]) for i, v in base[:10]]
    degenerate = [(5000, None), (5001, [1.0, 2.0])]
    df = spark.createDataFrame(
        base + twins + degenerate, "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in semantic_dedup(df, dim=64).collect()}
    assert set(out) == {i for i, _ in base + twins + degenerate}

    for i, _ in base[:10]:
        b, t = out[i], out[i + 1000]
        if b["sem_cluster"] == t["sem_cluster"]:
            # co-located twin: one group, min id (the base) survives
            assert t["component"] == i and not t["kept"]
            assert b["component"] == i and b["kept"]
        else:  # cross-cluster: both kept — the paper's recall trade
            assert b["kept"] and t["kept"]
    # enough twins must co-locate for the test to exercise the
    # duplicate-group path (with 16 random cells and random 64-dim
    # bases, a 0.97-cosine twin straddles an argmax boundary more
    # often than intuition says — this seed lands 6/10)
    co = sum(
        1 for i, _ in base[:10]
        if out[i]["sem_cluster"] == out[i + 1000]["sem_cluster"]
    )
    assert co >= 5, co

    for i, _ in base[10:]:
        assert out[i]["kept"] and out[i]["component"] == i
    for vid, _ in degenerate:
        assert out[vid]["kept"] and out[vid]["sem_cluster"] is None


def test_semantic_dedup_transitivity(spark):
    """A~B, B~C within one cluster must yield ONE group {A,B,C} with
    only A kept — the transitive-closure semantics pairwise dropping
    cannot express (the reason the chain runs connected_components)."""
    import numpy as np
    from pyspark.sql import functions as F

    from vinum_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    v = rng.normal(size=64)
    v /= np.linalg.norm(v)
    # orthogonal jitter directions: A·B ~ 0.98, B·C ~ 0.98, A·C ~ 0.93
    # with threshold 0.95 -> edges A-B and B-C only
    q1 = rng.normal(size=64); q1 -= (q1 @ v) * v; q1 /= np.linalg.norm(q1)
    a = v + 0.20 * q1
    b = v
    c = v - 0.20 * q1
    rows = [(1, [float(x) for x in a]), (2, [float(x) for x in b]),
            (3, [float(x) for x in c])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, dim=64, n_clusters=1, threshold=0.95).collect()}
    cos_ac = float(np.dot(a, c) / (np.linalg.norm(a) * np.linalg.norm(c)))
    assert cos_ac < 0.95  # the chain premise: A and C are NOT a pair
    assert [out[i]["component"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [out[i]["kept"] for i in (1, 2, 3)] == [True, False, False]
