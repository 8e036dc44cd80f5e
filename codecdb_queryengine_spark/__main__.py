"""Command-line runner: execute named queries or ad-hoc SQL.

    python -m codecdb_queryengine_spark list
    python -m codecdb_queryengine_spark run q3 [--sf-dir DIR] [-n 20]
    python -m codecdb_queryengine_spark sql "SELECT count(*) FROM lineitem"

The CLI face of the Engine facade (engine.py) — the reference ships
per-query executables (cpp/src/lqf/tpch/tpchquery.cc); this is the
equivalent surface with one binary.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="codecdb_queryengine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list named queries")
    p_list.add_argument("--prefix", default="", help="name filter")
    p_run = sub.add_parser("run", help="run a named query")
    p_run.add_argument("name")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("-n", type=int, default=20, help="rows to show")
    p_sql = sub.add_parser("sql", help="run SQL over the registered views")
    p_sql.add_argument("text")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_sql.add_argument("-n", type=int, default=20)
    args = p.parse_args(argv)

    from codecdb_queryengine_spark.engine import Engine

    if args.cmd == "list":
        for name in Engine.queries():
            if name.startswith(args.prefix):
                print(name)
        return 0
    eng = Engine.local(sf_dir=args.sf_dir)
    df = eng.query(args.name) if args.cmd == "run" else eng.sql(args.text)
    df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
