"""Run any registered query from the command line.

Usage:
    python tools/run_query.py <query> [sf_dir] [--plan] [--limit N]

Prints the result (limited) and, with ``--plan``, the formatted
physical plan plus the plan-audit summary — the loop used while tuning:
run, read the plan, fix the shuffle, run again.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if not args:
        from divolte_collector_spark.queries import all_queries

        print("usage: run_query.py <query> [sf_dir] [--plan] [--limit N]")
        print("queries:", ", ".join(sorted(all_queries())))
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    limit = 20
    for a in flags:
        if a.startswith("--limit"):
            limit = int(a.split("=", 1)[1])

    from divolte_collector_spark.queries import all_queries
    from divolte_collector_spark.session import get_spark

    registry = all_queries()
    if name not in registry:
        print(f"unknown query {name!r}; known: {', '.join(sorted(registry))}")
        return 2
    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry[name].fn(spark, sf_dir)
    if "--plan" in flags:
        from divolte_collector_spark.plans import audit, explain_formatted

        print(explain_formatted(df))
        print(json.dumps(audit(df).as_dict(), indent=2))
    df.show(limit, truncate=False)
    print(f"rows: {df.count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
