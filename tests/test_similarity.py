

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
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(df, dim=64, n_clusters=16).collect()
    }
    assert set(out) == {i for i, _ in base + twins + degenerate}

    def cos(i):
        v = np.asarray(dict(base)[i])
        t = np.concatenate([v[:60], np.zeros(4)])
        return float(v @ t / (np.linalg.norm(v) * np.linalg.norm(t)))

    for i, _ in base[:10]:
        b, t = out[i], out[i + 1000]
        if b["sem_cluster"] == t["sem_cluster"] and cos(i) >= 0.95:
            # co-located above-threshold twin: one group, min id (the
            # base) survives (this seed's pairs 1 and 8 sit BELOW the
            # 0.95 edge threshold — they are kept singletons wherever
            # the quantizer puts them)
            assert t["component"] == i and not t["kept"]
            assert b["component"] == i and b["kept"]
        else:  # cross-cluster or sub-threshold: both kept
            assert b["kept"] and t["kept"]
    # enough above-threshold twins must co-locate for the test to
    # exercise the duplicate-group path (this seed at k=16 lands >= 4)
    co = sum(
        1 for i, _ in base[:10]
        if out[i]["sem_cluster"] == out[i + 1000]["sem_cluster"]
        and cos(i) >= 0.95
    )
    assert co >= 4, co

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


def test_semantic_n_clusters_auto_knob(spark, tmp_path):
    """The n_clusters auto rule (~sqrt(n), the SemDeDup scaling choice)
    and the two materialization paths: DEFAULT (localCheckpoint) and
    checkpoint_dir (write-then-read parquet — the 100 TB path) must
    produce identical results, and auto mode must pick sqrt-of-corpus
    so within-cluster pair work stays ~n^1.5 instead of quadratic at a
    fixed k."""
    import numpy as np

    from vinum_spark.operators.similarity import (
        semantic_dedup,
        semantic_n_clusters,
    )

    assert semantic_n_clusters(0) == 1
    assert semantic_n_clusters(1) == 1
    assert semantic_n_clusters(100) == 10
    assert semantic_n_clusters(1_000_000) == 1000
    # the knob tracks corpus growth: 100x corpus -> 10x clusters
    assert semantic_n_clusters(10_000) == 10 * semantic_n_clusters(100)

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(64)]
    twins = [(i + 500, v) for i, v in rows[:6]]  # exact dups, cosine 1.0
    df = spark.createDataFrame(
        rows + twins, "vec_id long, embedding array<double>"
    )
    # auto mode: k = sqrt(70) ~ 8; every input row comes back exactly once
    auto = semantic_dedup(df, dim=16).collect()
    assert len(auto) == len(rows) + len(twins)
    assert {r["sem_cluster"] for r in auto} <= set(range(9))
    # an exact twin ALWAYS lands in its base's cell (identical argmax),
    # so the duplicate-group path is deterministic here
    by_id = {r["vec_id"]: r for r in auto}
    for i, _ in rows[:6]:
        assert by_id[i + 500]["component"] == i and not by_id[i + 500]["kept"]
        assert by_id[i]["kept"]

    # checkpoint_dir path: same result set, files actually written
    ck = semantic_dedup(
        df, dim=16, checkpoint_dir=str(tmp_path)
    ).collect()
    assert sorted(map(tuple, ck)) == sorted(map(tuple, auto))
    import glob as _glob

    assert _glob.glob(str(tmp_path / "semantic_dedup_cells_*" / "*.parquet"))
