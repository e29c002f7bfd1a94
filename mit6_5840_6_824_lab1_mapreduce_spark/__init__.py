"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference MapReduce engine (MIT 6.5840 lab solution),
rebuilt Spark-first.

Subpackages
-----------
- ``operators``: core dataflow (MapReduce parity engine, KV replay,
  dedup, similarity search, text analysis, multimodal plumbing).
- ``sources``: whole-file text source / deterministic text sink parity.
- ``functions``: reusable column expressions (tokenizer, hashing).
- ``plans``: table loading / logical-plan helpers.
- ``streaming``: Structured Streaming restatement of the KV state machine
  and windowed event aggregation.
- ``queries``: the registry consumed by ``__spark_entry__.py`` — every
  operator exposed as ``(spark, sf_dir) -> DataFrame`` plus a DuckDB
  oracle SQL string.
"""

__version__ = "0.1.0"
