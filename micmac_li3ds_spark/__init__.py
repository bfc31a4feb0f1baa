"""micmac_li3ds_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the LI3DS/micmac_li3ds reference (a batch photogrammetry-XML
→ relational-store ETL tool), widened — per the project north star — to a
full relational + streaming + LLM-data-pipeline query surface.

Design stance (SURVEY.md §7.0):
- Declarative DataFrame/SQL everywhere; Catalyst + Tungsten pick the
  physical plan. No RDDs.
- Pandas UDFs (Arrow-batched) only where column algebra cannot express the
  semantics; never row-at-a-time Python UDFs in a hot path.
- Every operator registered in ``micmac_li3ds_spark.registry`` with an
  equivalent DuckDB oracle SQL string where SQL-expressible.
- Every operator designed for 100 TB / 1000-executor scale: broadcast the
  dims, shuffle on the right keys, no crossJoin where a bucketing pattern
  exists, AQE on.
"""

__version__ = "0.1.0"

from micmac_li3ds_spark.registry import all_oracles, all_queries  # noqa: F401
