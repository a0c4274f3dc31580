"""imp_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
``djacob0/IMP-etl`` (a Node.js MySQL->MySQL work-queue ETL service) as an
idiomatic Spark engine, extended with the analytics and LLM-data-pipeline
operators described in SURVEY.md §7.

Layout
------
- ``session``    SparkSession builder with scale-conscious defaults (AQE,
                 adaptive skew-join, shuffle partitioning).
- ``schemas``    Explicit StructTypes for every table (reference DDL parity
                 + the TPC-H-ish test fixtures). No schema inference in
                 production paths.
- ``sources``    Parquet / JDBC / text-log readers behind one interface.
- ``functions``  Pure Column-level functions: cleanse (T1-T7 of SURVEY §2.5
                 with bug-compat quirk flags Q1-Q4), text analysis, vector
                 math, portable hashing.
- ``operators``  DataFrame->DataFrame operators: dedup family, join
                 helpers, aggregation/top-k, windowing, similarity search,
                 multimodal plumbing.
- ``plans``      Assembled pipelines: the reference ETL dataflow
                 (queue -> join -> cleanse -> filter -> dedup -> upsert)
                 with counters, plus the upsert sink and run driver.
- ``streaming``  Structured Streaming equivalents: windowed aggregation
                 with watermarks, session windows, log tailing.

Every operator is designed for a multi-executor cluster: broadcast joins
for dimension/key-set tables, partial aggregation, salted/AQE handling for
skew, predicate pushdown + column pruning preserved (declarative plans
only), no driver-side collect loops in any data path.
"""

__version__ = "0.1.0"
