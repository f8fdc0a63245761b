"""reddit_big_data_spark — a PySpark-native analytics engine.

A clean, importable re-expression of the operator surface exercised by the
reference workload (nixiaojing/reddit-big-data: 10 Databricks notebooks over
the Pushshift Reddit dataset), rebuilt Spark-first:

- DataFrame / SQL declarative plans (Catalyst + Tungsten pick the physical
  strategy); no RDD escape hatches, no driver-side loops.
- Broadcast hints for small dimensions, AQE on, explicit shuffle sizing.
- Pandas UDFs (Arrow) only where built-in functions genuinely cannot express
  the semantics (stemming, pluggable sentiment, multimodal decode).

Package layout mirrors SURVEY.md §7.
"""

__version__ = "0.1.0"

from reddit_big_data_spark.session import get_spark  # noqa: F401
