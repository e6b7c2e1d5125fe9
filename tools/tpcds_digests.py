"""Regenerate the FROZEN_DIGESTS literals in walden_spark/queries/tpcds.py.

Runs every TPC-DS analytic body at the registry scale (SF, seed=42),
computes its canonicalized digest, and prints the dict to paste. Run
twice with different parallelism to confirm layout-independence:

    python tools/tpcds_digests.py          # local[8], 8 partitions
    python tools/tpcds_digests.py --alt    # local[3], 17 partitions
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    alt = "--alt" in sys.argv
    from walden_spark.session import get_spark

    spark = get_spark(
        app_name="tpcds_digests",
        master="local[3]" if alt else "local[8]",
        shuffle_partitions=17 if alt else 8,
    )
    from walden_spark.queries.tpcds import TPCDS_BODIES, digest  # noqa: E402
    from walden_spark.registry import load_all

    load_all()
    print("FROZEN_DIGESTS: dict[str, tuple[int, int]] = {")
    for name in sorted(TPCDS_BODIES):
        row = digest(TPCDS_BODIES[name](spark, "")).collect()[0]
        print(f'    "{name}": ({row.n_rows}, {row.checksum}),')
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
