"""Interactive SQL shell — parity with the reference devserver's
``trino <schema>`` CLI wrapper (reference: docker/devserver/
Dockerfile:24-26, which runs ``trino-cli --server trino --catalog hive
--schema $1``).

Usage:  python -m walden_spark.sqlshell [schema] [--sf-dir DIR]

Fixture tables are pre-registered as views (like the reference's
pre-wired catalog); every line is executed with ``spark.sql`` and
printed with ``.show``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="walden-sql")
    ap.add_argument("schema", nargs="?", default=None, help="USE this schema on start")
    ap.add_argument("--sf-dir", default=None, help="fixture dir to register as views")
    ap.add_argument("-e", "--execute", default=None, help="run one statement and exit")
    ap.add_argument(
        "--versioned",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="register a VersionedTable for FOR VERSION/TIMESTAMP AS OF",
    )
    args = ap.parse_args(argv)

    from walden_spark.session import WaldenSession, get_spark
    from walden_spark.tables import register_views

    ws = WaldenSession(get_spark(app_name="walden-sql"))
    spark = ws.spark
    if args.sf_dir:
        register_views(spark, args.sf_dir)
    if args.schema:
        spark.sql(f"USE {args.schema}")
    for spec in args.versioned:
        name, _, path = spec.partition("=")
        ws.register_versioned(name, path)

    def run(stmt: str) -> None:
        stmt = stmt.strip().rstrip(";")
        if not stmt:
            return
        try:
            # WaldenSession.sql: query-history recording + time-travel
            # clause rewrite over registered versioned tables
            ws.sql(stmt).show(100, truncate=False)
        except Exception as exc:  # surface the analyzer error, keep REPL alive
            print(f"ERROR: {exc}", file=sys.stderr)

    if args.execute:  # trino-cli --execute parity (tf/test-hive.sh:19-24)
        run(args.execute)
        return 0

    print("walden-sql — Spark SQL shell (quit/exit to leave)")
    while True:
        try:
            line = input("walden> ")
        except EOFError:
            break
        if line.strip().lower() in {"quit", "exit"}:
            break
        run(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
