"""hadoop_prototype_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the Microsoft-CISL/hadoop-prototype reference (Hadoop MapReduce + its
operator library), re-expressed Spark-first:

- data model: DataFrames with real schemas instead of Writable (K,V) pairs
  (SURVEY.md §1); the reference's sort/group comparator split maps to
  Window.partitionBy().orderBy().
- operators: the MapReduce lib operator inventory (SURVEY.md §2) as
  declarative DataFrame transforms so Catalyst/Tungsten pick the physical
  strategy (whole-stage codegen, partial aggregation, broadcast vs SMJ, AQE).
- extensions: LLM-training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory tuned for the local harness
  sources/      readers (text/kv/fixed-width/sequencefile shim), table
                loading, synthetic generators (RandomTextWriter/TeraGen)
  functions/    scalar/text helper functions (tokenize, regex extract)
  operators/    relational + pipeline operators (fieldsel, aggregate
                descriptors, joins, sorts, dedup, similarity, textstats)
  plans/        query registry (Spark impl + DuckDB oracle SQL pairs),
                JobControl-style DAG runner
  streaming/    Structured Streaming extensions over the events table
"""

__version__ = "0.1.0"
