"""PySpark-native analytics engine with the query and data-processing
capabilities of the DSPA stream-analytics reference (rschoening/mvrs-dspa),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for the streaming surface, and deterministic
arithmetic hash families so every batch operator is oracle-checkable.
"""

__version__ = "0.1.0"
