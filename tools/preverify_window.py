"""Replay the projected driver verification window locally at the driver's
correctness scale (sf0.01) through the strict parity harness. Usage::

    python tools/preverify_window.py [window_size] [sf_dir] [--plain]

The driver compares each window query's Spark result against its DuckDB
oracle at sf0.01; test_parity covers the same ground but at sf0.001 (speed).
Running this before round end catches sf-dependent drift (approximation
buckets, quantile interpolation, fixture-vintage sensitivity) in exactly the
rows the next CORRECTNESS_r{N}.json will grade. Rows-only queries are run
and counted, mirroring the driver's weaker check.

``--plain`` replays the window under a bare ``SparkSession.builder`` (no
UTC/AQE/Arrow/shuffle tuning) — the closest local simulation of the
driver's own session; a query that only passes under the tuned builder
would fail its first driver row. Slower (default 200 shuffle partitions),
so the tuned run is the iterating default and ``--plain`` the
belt-and-braces pass before round end.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reconciliation_hive_data_spark import registry  # noqa: E402
from reconciliation_hive_data_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    window = int(args[0]) if args else 50
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    from tests.parity import compare  # late: needs repo root on sys.path

    registry.load_all_modules()
    names = registry.ordered_names()[:window]
    if plain:
        from pyspark.sql import SparkSession

        # getOrCreate() would silently return an already-built (tuned)
        # session if one exists in this process, defeating the whole point
        # of --plain; stop it first so the bare builder really builds bare.
        # A session built on another thread is invisible to
        # getActiveSession() (thread-local) but still served by
        # getOrCreate() through the process-wide instantiated session
        # (PySpark's default-session equivalent), so check both.
        # _instantiatedSession is a private attribute; degrade to the
        # getActiveSession()-only check on PySpark versions without it.
        for stale in (SparkSession.getActiveSession(),
                      getattr(SparkSession, "_instantiatedSession", None)):
            if stale is not None:
                print("--plain: stopping pre-existing SparkSession "
                      "(would not have been plain)", flush=True)
                stale.stop()
                break
        spark = SparkSession.builder.master("local[8]").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("rhds-preverify", shuffle_partitions=16)
    failures: list[str] = []
    for i, name in enumerate(names):
        spec = registry.get(name)
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle:
                problems = compare(df, spec.oracle, sf_dir, name)
                status = "ok" if not problems else "FAIL"
                if problems:
                    failures.append(name)
            else:
                # every rows-only query is guaranteed non-empty at fixture
                # scale (counts pinned in tests/test_rows_only_invariants.py),
                # so an empty result here is a real failure, not a weak pass
                n = df.count()
                problems = (
                    []
                    if n > 0 and df.columns
                    else [f"{name}: empty result or schema ({n} rows)"]
                )
                status = f"rows-only ok ({n})" if not problems else "FAIL"
        except Exception as exc:  # noqa: BLE001 — report and continue the sweep
            problems = [f"{name}: raised {exc!r}"]
            failures.append(name)
            status = "ERROR"
        dt = time.time() - t0
        print(f"[{i + 1:2d}/{len(names)}] {name:28s} {status:18s} {dt:5.1f}s", flush=True)
        for p in problems:
            print(f"       {p}", flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} green at {sf_dir}")
    if failures:
        print("failing:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
