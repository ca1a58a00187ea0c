"""aws_iceberg_automation_spark — a PySpark-native lakehouse analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``03dipak/aws-iceberg-automation`` (a YAML→Iceberg DDL automation tool;
see SURVEY.md) as an idiomatic PySpark engine:

- Layer A: declarative YAML table specs → Spark SQL DDL + catalog
  management (``tablespec``, ``catalog``).
- Layer B: the relational / time-series / LLM-data-pipeline operator
  surface the tables exist to serve (``operators``, ``functions``,
  ``streaming``), every operator designed for 100 TB scale.

All queries are declared through the DataFrame API so Catalyst picks the
physical plan; Python UDFs appear only where built-ins cannot express the
semantics (and then as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
