#!/usr/bin/env python3
"""Registry-count sync for the docs (VERDICT r3 next-round item 8).

COVERAGE.md and BASELINE.md cite the query/oracle totals; those go
stale every round they're hand-maintained.  This tool derives them from
the live registry and either rewrites the citations in place
(``--write``) or exits non-zero when a doc disagrees (the CI mode —
tests/test_sql_surface.py::test_doc_counts_in_sync runs it).

Rewritten patterns:
- COVERAGE.md: the ``**Registry totals: ...**`` marker line.
- BASELINE.md: every ``all N oracle-checked queries`` phrase.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def registry_counts() -> tuple[int, int, list[str]]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = sorted(set(qs) - set(oracles))
    return len(qs), len(oracles), rows_only


def totals_line(n_q: int, n_o: int, rows_only: list[str]) -> str:
    return (
        f"**Registry totals: {n_q} queries registered, {n_o} oracle-checked, "
        f"{len(rows_only)} rows-only ({', '.join(rows_only)}).**"
    )


def sync(write: bool) -> list[str]:
    """Returns the list of stale files (empty = in sync)."""
    n_q, n_o, rows_only = registry_counts()
    stale = []

    cov_path = os.path.join(REPO, "COVERAGE.md")
    with open(cov_path) as f:
        cov = f.read()
    want = totals_line(n_q, n_o, rows_only)
    new_cov, n_sub = re.subn(r"\*\*Registry totals:.*?\.\*\*", want, cov, flags=re.S)
    if n_sub == 0 or new_cov != cov:
        stale.append("COVERAGE.md")
        if write:
            if n_sub == 0:  # first run: insert after the intro paragraph
                new_cov = cov.replace(
                    "`t:` names are test files.\n",
                    f"`t:` names are test files.\n\n{want}\n",
                    1,
                )
            with open(cov_path, "w") as f:
                f.write(new_cov)

    base_path = os.path.join(REPO, "BASELINE.md")
    with open(base_path) as f:
        base = f.read()
    new_base, n_sub = re.subn(
        r"all\s+\d+\s+oracle-checked\s+queries",
        f"all {n_o} oracle-checked queries",
        base,
    )
    if n_sub == 0:
        stale.append("BASELINE.md (phrase not found)")
    elif new_base != base:
        stale.append("BASELINE.md")
        if write:
            with open(base_path, "w") as f:
                f.write(new_base)

    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    all_marker = "ALL " if n_q == n_o else ""
    new_readme, n_sub = re.subn(
        r"\(\d+ at last count, (?:ALL )?\d+ with\s+full\s+oracles\)",
        f"({n_q} at last count, {all_marker}{n_o} with\nfull oracles)",
        readme,
    )
    if n_sub == 0:
        stale.append("README.md (phrase not found)")
    elif new_readme != readme:
        stale.append("README.md")
        if write:
            with open(readme_path, "w") as f:
                f.write(new_readme)

    return stale


def main() -> None:
    write = "--write" in sys.argv
    n_q, n_o, rows_only = registry_counts()
    print(totals_line(n_q, n_o, rows_only))
    stale = sync(write)
    if stale and not write:
        print(f"STALE: {', '.join(stale)} (run tools/counts.py --write)")
        raise SystemExit(1)
    if stale:
        print(f"rewrote: {', '.join(stale)}")


if __name__ == "__main__":
    main()
