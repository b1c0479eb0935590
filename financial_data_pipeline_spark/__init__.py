"""financial_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ``josetraderx/financial-data-pipeline``
(an eager single-process pandas ETL; see SURVEY.md) as lazy, declarative
Spark DataFrame plans designed for 100 TB scale:

- All operators are composable ``DataFrame -> DataFrame`` transforms
  (usable via ``df.transform(...)``) partitioned by ``symbol``.
- Catalyst handles predicate pushdown / column pruning / join
  strategy; the package only adds the four genuinely custom pieces
  identified in SURVEY.md §4.3 (deterministic keep-first dedup,
  resample-with-empty-bucket-fill, EMA pandas-UDF kernel, batched
  JDBC upsert sink).
- Beyond-reference LLM-data-pipeline operators (dedup at scale,
  similarity search, text analysis, multimodal plumbing) live in
  ``operators.dedup`` / ``operators.similarity`` / ``operators.text``
  / ``operators.multimodal``.
"""

from financial_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
