"""PySpark-native analytics engine with the query and data-processing
capabilities of andrewalumkal/SQLBackupHistoryETL (reference studied at
/root/reference; nothing copied — every operator re-expressed
Spark-first on the DataFrame/SQL API).

Layout
------
- ``schema``      : fixed StructTypes for the domain tables (SURVEY §1.2)
- ``session``     : tuned SparkSession factory (AQE, UTC, arrow)
- ``sources``     : readers + the per-server msdb extract transform (§2.1, §2.3)
- ``operators``   : reusable relational operators (windows, merge, string_agg,
                    fallback, retention) (§2.2–§2.7)
- ``functions``   : scalar column functions (path surgery, json, text) (§2.8)
- ``plans``       : entry points — ETL run, chain procs, restore script (§3)
- ``streaming``   : Structured Streaming ingest variant (§2.9)
- ``extensions``  : large-scale training-data ops (dedup, similarity,
                    multimodal, text analysis)
"""

__version__ = "0.1.0"
