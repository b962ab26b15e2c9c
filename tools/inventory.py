#!/usr/bin/env python3
"""Generate OPERATORS.md — the full query inventory, derived from the
live registry so it can never go stale (tests/test_sql_surface.py keeps
it in sync the same way it keeps the doc counts).

One row per registered query: name, defining module, oracle kind, and
the first sentence of its docstring."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

HEADER = """# Operator inventory (generated — do not edit)

`python tools/inventory.py --write` regenerates this file from the
registry; every row is a `__spark_entry__.queries()` entry.  "oracle"
means the driver value-hashes the query against DuckDB running the
equivalent SQL; "rows-only" is the weaker check reserved for genuinely
non-SQL-expressible operators.

"""


def _first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.strip().split())
    m = re.match(r"(.+?\.)(\s|$)", text)
    return (m.group(1) if m else text)[:220]


def render() -> str:
    from cybersecurity_ioc_etl_spark import operators as _ops

    rows = []
    for name in sorted(_ops.QUERIES):
        fn = _ops.QUERIES[name]
        inner = getattr(fn, "__wrapped__", fn)
        mod = inner.__module__.rsplit(".", 1)[-1]
        kind = "oracle" if name in _ops.ORACLES else "rows-only"
        rows.append(
            f"| {name} | {mod} | {kind} | {_first_sentence(inner.__doc__)} |"
        )
    return (
        HEADER
        + f"**{len(rows)} queries.**\n\n"
        + "| query | module | check | summary |\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )


def main() -> None:
    write = "--write" in sys.argv
    path = os.path.join(REPO, "OPERATORS.md")
    want = render()
    have = open(path).read() if os.path.exists(path) else ""
    if have != want:
        if write:
            with open(path, "w") as f:
                f.write(want)
            print("rewrote OPERATORS.md")
        else:
            print("STALE: OPERATORS.md (run tools/inventory.py --write)")
            raise SystemExit(1)
    else:
        print("OPERATORS.md in sync")


if __name__ == "__main__":
    main()
