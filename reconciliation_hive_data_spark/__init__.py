"""PySpark-native analytics engine with the query/data-processing
capabilities of the ``plahoi/Reconciliation-hive-data`` reference
(Hive data reconciliation: generated per-check SQL + comparison), re-expressed
Spark-first, plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Reference note: the reference checkout at /root/reference was empty at build
time (SURVEY.md §0), so parity targets are the capability contract in
SURVEY.md §2 rather than file:line citations.

Layout
------
- ``session``    SparkSession builder tuned for the bench/test environment
- ``catalog``    fixture-table loading + temp-view registration
- ``registry``   the query registry backing ``__spark_entry__.queries()``
- ``canonical``  cross-engine determinism helpers (exact money sums,
                 canonical row hashes, timestamp formatting)
- ``operators/`` scans, filters, joins, aggregates, windows, sort/limit, set ops
- ``functions/`` scalar-function surface (string/date/math/cond/hash/array/json)
- ``plans/``     reconciliation composites + LLM-pipeline extensions
- ``streaming/`` Structured Streaming operators with batch twins
"""

__version__ = "0.1.0"


def __getattr__(name):
    if name == "ReconPair":
        from .plans.api import ReconPair

        return ReconPair
    raise AttributeError(name)
