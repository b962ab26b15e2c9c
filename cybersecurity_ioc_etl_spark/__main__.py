"""CLI: run any registered query, or either end-to-end pipeline.

    python -m cybersecurity_ioc_etl_spark <query-name> [sf_dir] [--limit N]
    python -m cybersecurity_ioc_etl_spark --list
    python -m cybersecurity_ioc_etl_spark --batch OUT_DIR [sf_dir]
    python -m cybersecurity_ioc_etl_spark --stream JSON_DIR OUT_DIR
    python -m cybersecurity_ioc_etl_spark [sf_dir] --export-corpus OUT_DIR

Replaces the reference's two hard-coded CLI entry points:
`python3 h-isac.py <folder> [--splunk cfg]` → `--batch` (extract → CSV +
metrics under OUT_DIR), and `python3 firehose.py` → `--stream` (tweet
JSON drop-directory → checkpointed parquet IOC table, resumable).
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
    p.add_argument("--batch", metavar="OUT_DIR", help="run the h-isac batch pipeline")
    p.add_argument(
        "--splunk",
        metavar="CFG",
        help="with --batch: also push IOCs to the splunkkv sink named by a "
        "JSON config with a required 'url' key (h-isac.py's --splunk fork, "
        "with S10 set-diff validation instead of its None crash)",
    )
    p.add_argument(
        "--stream",
        nargs=2,
        metavar=("JSON_DIR", "OUT_DIR"),
        help="run the firehose streaming pipeline over a tweet-JSON drop dir",
    )
    p.add_argument(
        "--export-corpus",
        metavar="OUT_DIR",
        help="run the training-corpus export (curate → chunk → ranged "
        "archive + manifest) to OUT_DIR; positional sf_dir selects input",
    )
    args = p.parse_args(argv)

    from . import get_spark, queries

    if args.batch:
        from .batch import run_hisac_batch

        kv_url = None
        if args.splunk:
            from .config import load_config

            kv_url = load_config(
                args.splunk, required=("url",), context="splunk config"
            )["url"]
        spark = get_spark("cli-batch")
        spark.sparkContext.setLogLevel("WARN")
        print(
            run_hisac_batch(
                spark, args.query or "/root/testdata/sf0.01", args.batch, kv_url=kv_url
            )
        )
        return 0
    if args.export_corpus:
        from .corpus_export import run_corpus_export

        spark = get_spark("cli-export")
        spark.sparkContext.setLogLevel("WARN")
        print(
            run_corpus_export(
                spark, args.query or "/root/testdata/sf0.01", args.export_corpus
            )
        )
        return 0
    if args.stream:
        import os

        from .streaming.pipeline import run_ioc_stream

        json_dir, out_dir = args.stream
        spark = get_spark("cli-stream")
        spark.sparkContext.setLogLevel("WARN")
        result = run_ioc_stream(
            spark, json_dir, os.path.join(out_dir, "_checkpoint"),
            out_dir=os.path.join(out_dir, "iocs"),
        )
        print(f"{result.count()} IOC rows in {out_dir}/iocs")
        return 0

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
