"""CLI: run any registered query and print its result.

    python -m cybersecurity_ioc_etl_spark <query-name> [sf_dir] [--limit N]
    python -m cybersecurity_ioc_etl_spark --list

Replaces the reference's two hard-coded CLI entry points (`python3
h-isac.py <folder>` / `python3 firehose.py`) with one launcher over the
whole query surface.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cybersecurity_ioc_etl_spark")
    p.add_argument("query", nargs="?", help="query name (see --list)")
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--list", action="store_true", dest="list_queries")
    args = p.parse_args(argv)

    from . import get_spark, queries

    qs = queries()
    if args.list_queries or not args.query:
        print("\n".join(sorted(qs)))
        return 0
    if args.query not in qs:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2
    spark = get_spark(f"cli-{args.query}")
    spark.sparkContext.setLogLevel("WARN")
    qs[args.query](spark, args.sf_dir).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
