"""Dump the physical-plan audit for every registered query (or the
names given) as JSON lines — the review loop behind `.explain` and the
plan-shape tests.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]

    from divolte_collector_spark.plans import audit
    from divolte_collector_spark.queries import all_queries
    from divolte_collector_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names or sorted(registry):
        try:
            a = audit(registry[name].fn(spark, sf_dir))
            print(json.dumps({"query": name, **a.as_dict()}))
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(json.dumps({"query": name, "error": str(exc)[:200]}))


if __name__ == "__main__":
    main()
