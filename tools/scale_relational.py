"""Relational-core scale anchors at sf1 (~6M lineitem rows) and, with
``--copies 100``, sf10 (~60M lineitem rows).

The pipeline operators have measured walls to 500k docs, but the
joins/aggregates had never been measured past 600k rows (VERDICT r11
item 4). /root/testdata is read-only and the driver's generator is not
in this repo, so sfN is built as N*10 DISJOINT COPIES of the sf0.1
universe: every copy shifts its keys (orderkey/custkey/partkey/
suppkey/event ids) by copy*stride so the copies never join across —
per-key fanouts, join selectivities, value distributions, and the
q86 skew fraction are EXACTLY those of sf0.1 at N*10x the rows.
nation/region are genuine shared dims and stay as-is.

    python tools/scale_relational.py [--out DIR] [--runs 3]
        [--copies 10] [--queries q14_join_multiway,q86_skew_join_aqe]

Prints one JSON line per query (median wall over --runs) plus a
linear-scaling verdict vs the sf0.1 wall measured in the same session,
same JVM: PASS if wall(sfN) <= 2 * copies * wall(sf0.1) (the "no query
>2x its linear-scaled expectation" bound from the round-11 verdict;
sub-linear is common because fixed per-query overheads amortize).
``--copies 100`` is the round-13 decade (VERDICT r12 item 7): q14 and
q86 were the only sf1 anchors with real shuffle growth (1.59x/1.67x at
10x rows) — one more decade confirms the trend holds once shuffles
stop being overhead-dominated.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_COPIES = 10
QUERIES = ["q01_pricing_summary", "q13_join_broadcast", "q14_join_multiway",
           "q18_window_topk_per_group", "q22_count_distinct",
           "q86_skew_join_aqe"]

# table -> {column: stride} key shifts; one disjoint sub-universe per copy
SHIFTS = {
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "customer": {"c_custkey": 15_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    # user_id is custkey-domain (q86 joins events.user_id = o_custkey),
    # so it must shift by the o_custkey stride or copies 1-9's user_ids
    # would land inside copy-0's custkey range and join cross-copy; the
    # resulting id gaps are harmless for the group-by queries
    "events": {"event_id": 100_000, "user_id": 15_000},
}
COPY_AS_IS = ["nation", "region"]


def build(spark, out_dir: str, copies: int) -> None:
    """N-way cross-join against a copy-index literal table instead of
    an N-way unionByName: the same disjoint-copy rows, but the plan is
    one scan x one broadcast join regardless of N (a 100-branch union
    plans slowly and re-scans the source per branch)."""
    from pyspark.sql import functions as F

    for table, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        idx = spark.range(copies).withColumnRenamed("id", "__copy")
        df = src.crossJoin(F.broadcast(idx))
        for col, stride in shifts.items():
            # cast back: long __copy arithmetic must not widen the
            # source column's parquet type (schema parity with SRC)
            df = df.withColumn(
                col,
                (F.col(col) + F.col("__copy") * stride).cast(
                    src.schema[col].dataType
                ),
            )
        df.drop("__copy").write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        print(f"built {table}", flush=True)
    for table in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")


def main() -> None:
    args = sys.argv[1:]
    copies = (
        int(args[args.index("--copies") + 1])
        if "--copies" in args
        else DEFAULT_COPIES
    )
    out_dir = f"/tmp/testdata_sf{copies // 10}"
    if "--out" in args:
        out_dir = args[args.index("--out") + 1]
    runs = int(args[args.index("--runs") + 1]) if "--runs" in args else 3
    queries = (
        args[args.index("--queries") + 1].split(",")
        if "--queries" in args
        else QUERIES
    )

    from vinum_spark.inventory import QUERIES as Q
    from vinum_spark.session import get_spark

    spark = get_spark()
    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        t0 = time.time()
        build(spark, out_dir, copies)
        print(f"{copies}-copy build: {time.time() - t0:.1f}s", flush=True)

    def median_wall(name: str, sf_dir: str) -> float:
        walls = []
        for _ in range(runs):
            t0 = time.time()
            n = Q[name].fn(spark, sf_dir).count()
            walls.append(time.time() - t0)
        return statistics.median(walls), n

    results = {}
    for name in queries:
        w01, _ = median_wall(name, SRC)
        w1, rows = median_wall(name, out_dir)
        ratio = w1 / w01
        verdict = "PASS" if ratio <= 2 * copies else "FAIL"
        results[name] = {
            "sf0.1_s": round(w01, 3),
            "scaled_s": round(w1, 3),
            "copies": copies,
            "ratio": round(ratio, 2),
            "rows": rows,
            "linear_bound": verdict,
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)
    worst = max(results.values(), key=lambda r: r["ratio"])
    print(json.dumps({"metric": f"sf{copies // 10}_relational_anchors",
                      "worst_ratio": worst["ratio"],
                      "all_pass": all(r["linear_bound"] == "PASS"
                                      for r in results.values())}))


if __name__ == "__main__":
    main()
