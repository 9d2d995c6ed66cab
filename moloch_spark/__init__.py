"""moloch_spark — a PySpark-native session-analytics engine.

A from-scratch engine with the query and data-processing capabilities of
aol/moloch (Arkime 3.0.0): streaming sessionization, a moloch-expression
query language compiled to Spark Column predicates, and the full analytics
endpoint surface (sessions / unique / multiunique / spiview / spigraph /
spigraphhierarchy / connections / hunts / cron queries), plus LLM-data-
pipeline operators (dedup, similarity search, text analysis, multimodal).

Everything is expressed DataFrame/SQL-first so Catalyst handles pushdown,
pruning, join selection, and codegen; Python UDFs appear only where the
built-in operators genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
