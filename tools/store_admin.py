"""Fingerprint-store maintenance CLI.

The one operation a human needs today: recovering from a CRASHED
compactor, whose leftover ``_compaction_lease`` blocks every later
compaction by design (auto-expiry would re-open the two-compactors
race). ``--break-lease`` runs ``break_compaction_lease``: the lease
records the holder's applicationId, host, and pid, and the break is
refused while a same-host holder pid is still alive; a holder on
another host (or a lease without host/pid) cannot be verified from
here and needs ``--force`` after an out-of-band check that no
compaction job is running.

Usage:
    python tools/store_admin.py --break-lease <store_path> [--force]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    if "--break-lease" not in args:
        print(__doc__)
        sys.exit(2)
    path = args[args.index("--break-lease") + 1]
    force = "--force" in args

    from vinum_spark.io.bucketing import break_compaction_lease
    from vinum_spark.session import get_spark

    spark = get_spark("store_admin")
    spark.sparkContext.setLogLevel("ERROR")
    holder = break_compaction_lease(spark, path, force=force)
    print(f"lease broken: evicted holder {holder} from {path}")


if __name__ == "__main__":
    main()
