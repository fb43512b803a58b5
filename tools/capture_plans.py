"""Capture .explain("formatted") for the headline (or named) queries
into plans/<tag>/<query>_<suffix>.txt — the before/after evidence an
optimization round commits alongside the code.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [query ...]
e.g.   python tools/capture_plans.py r12 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "sessionize_30min",
    "session_window_native",
    "funnel_view_click_purchase",
    "daily_active_users",
    "asof_last_view_before_purchase",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_bruteforce_cosine",
    "ann_ivf_bucketed",
    "text_quality_scores",
    "token_counts",
    "browser_wire_roundtrip",
    "dsl_mapping_segments",
    "geoip_enrich_events",
    "multimodal_features",
]


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        return 2
    tag, suffix = args[0], args[1]
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
    names = args[3:] or HEADLINE

    from divolte_collector_spark.plans import explain_formatted
    from divolte_collector_spark.queries import all_queries
    from divolte_collector_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df))
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
