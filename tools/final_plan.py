"""Execute one query via the noop sink and print timing plus the FINAL
adaptive plan (isFinalPlan=true), which shows runtime exchange reuse /
AQE join rewrites the initial explain() cannot.

The timing loop uses the noop sink (guide §1.4), but a DataFrameWriter.save
wraps the logical plan in a NEW write-command QueryExecution — it never
executes the DataFrame's OWN QueryExecution, so explaining that one after
the writes would still show isFinalPlan=false (ADVICE r18). The explain
step therefore runs one extra ``df.collect()`` first, which executes the
DataFrame's own QE and leaves its adaptive plan finalized. (collect is fine
here: every registered query's result is report-sized; the TIMED passes
stay on the noop sink.)

Usage: python tools/final_plan.py <query> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reconciliation_hive_data_spark import registry  # noqa: E402
from reconciliation_hive_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rhds-final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all_modules()
    # same warmup as bench.py
    registry.get("recon_order_totals").fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.tableExists("rhds_warmup_probe")
    spec = registry.get(name)
    df = None
    for i in range(reps):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_all = time.perf_counter() - t0
        print(
            f"pass {i}: build(fn+eager jobs)={t_build:.3f}s"
            f" noop={t_all - t_build:.3f}s total={t_all:.3f}s",
            flush=True,
        )
    df.collect()  # execute df's OWN QueryExecution so AQE finalizes it
    print(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    ))


if __name__ == "__main__":
    main()
