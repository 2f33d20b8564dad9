"""ipydataclean_spark — a PySpark-native analytics/data-cleaning engine.

A from-scratch rebuild of the *capabilities* of ``facultyai/ipydataclean``
(an interactive pandas-DataFrame cleaning widget) as a distributed,
Spark-first engine, extended with the relational substrate, streaming,
and LLM-data-pipeline operators described in SURVEY.md §2.

The reference checkout at /root/reference was empty at build time
(SURVEY.md §0), so reference citations are capability-level ``[P]``
provenance tags per SURVEY.md's citation policy, not file:line.

Package layout:
  session    — tuned SparkSession builder (local testing; cluster-safe knobs)
  catalog    — fixture table loader + temp-view registration
  recipe     — ordered, composable cleaning recipe (the engine's IR) + codegen
  operators/ — profiling, detectors, cleaning, relational, windows, llm ops
  functions/ — scalar/vector helper expressions (pure pyspark.sql.functions)
  sources/   — readers/writers (parquet/csv/json/binary/stream)
  streaming/ — structured-streaming twins of the batch operators
  registry   — the (name -> query fn, oracle SQL) table that the driver
               contract file ``__spark_entry__.py`` exposes
"""

__version__ = "0.1.0"

from ipydataclean_spark.registry import QUERIES, load_all, register  # noqa: F401
