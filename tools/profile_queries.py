"""Per-query profiling: split driver-side plan construction from
execution, using the bench's own methodology (noop sink, one warm-up,
median of N). Complements bench.py — this is the diagnosis tool, not
the committed number.

Usage:
    python tools/profile_queries.py [--sf-dir DIR] [--runs N] [q...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE
    from vinum_spark.inventory import QUERIES
    from vinum_spark.session import get_spark

    names = args.queries or list(HEADLINE)
    spark = get_spark("profile_queries")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM warm-up (same rationale as bench.py)
    for _ in range(2):
        QUERIES[names[0]].fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    print(f"{'query':38s} {'build_ms':>9s} {'exec_ms':>9s} {'total_ms':>9s}")
    for name in names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append((t1 - t0) * 1000)
            execs.append((t2 - t1) * 1000)
        b = statistics.median(builds)
        e = statistics.median(execs)
        print(f"{name:38s} {b:9.1f} {e:9.1f} {b + e:9.1f}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
