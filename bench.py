"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via a cheap full-evaluation action
(``df.write.format("noop")``) so timing covers the whole plan without
driver-side collect overhead dominating.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reconciliation_hive_data_spark import registry  # noqa: E402
from reconciliation_hive_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("rhds-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all_modules()

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    registry.get("recon_order_totals").fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the metastore too: the embedded Derby catalog inits lazily on
    # first touch (~5 s) — session setup, not a property of whichever
    # catalog-backed query happens to run first
    spark.catalog.tableExists("rhds_warmup_probe")

    for name, spec in sorted(registry.REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a failing query must not kill the bench
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
