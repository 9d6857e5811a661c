"""PySpark-native analytics engine with the capabilities of the
aurora-cdc-demo reference (CDC streaming + merge/SCD appliers +
monitoring analytics), plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal).

Everything is expressed with the DataFrame/SQL API so Catalyst plans
the physical execution (pushdown, broadcast, AQE); Python UDFs appear
only where semantics genuinely require them, always Arrow-batched.
"""

__version__ = "0.1.0"
