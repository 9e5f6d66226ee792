"""graph_database_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of AshmitGupta/Graph-Database-Project (a Neo4j-backed RAG system
over Boeing Service Bulletin XML — see SURVEY.md), extended with the
relational / graph / LLM-data-pipeline operator surface a large-scale
training-data pipeline needs.

Design stance (SURVEY.md §7.0): pure DataFrame/SQL — declare logical plans,
let Catalyst/Tungsten pick physical strategy; property graph = two
Parquet-backed DataFrames; iterative graph algorithms are driver-side
DataFrame loops with checkpointing; Python only at genuine UDF seams
(XML shredding, multimodal decode), always Arrow-batched.
"""

__version__ = "0.1.0"
