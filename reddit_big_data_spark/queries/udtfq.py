"""Python-UDTF query — completes the §2.11 surface (scalar pandas UDF:
q68 Porter; grouped-map applyInPandas: q65 OLS; grouped-agg: tests;
table function: here).

The UDTF lateral-explodes documents into (pos, token) rows inside an
Arrow batch; the oracle rebuilds identical rows natively with DuckDB's
indexed list lambda. Equality therefore pins the lateral-join fan-out,
0-based ordinality, and empty-token semantics of the UDTF plumbing —
while q26 remains the native fast path for real token work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table

_VIEW = "__udtf_documents"


@register(
    "q74_udtf_tokens",
    oracle="""
    WITH t AS (
      SELECT d.source,
             u.s.token AS token,
             u.s.pos AS pos
      FROM documents d,
           UNNEST(list_transform(string_split(d.text, ' '),
                                 (x, i) -> {'token': x, 'pos': i - 1})) AS u(s)
    )
    SELECT source,
           COUNT(*) AS token_rows,
           COUNT(DISTINCT token) AS distinct_tokens,
           CAST(SUM(pos * LENGTH(token)) AS BIGINT) AS poslen_sum
    FROM t
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Arrow UDTF lateral explode == native indexed-list oracle (§2.11)",
)
def q74_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView(_VIEW)
    # The position-weighted length sum is order-sensitive: it only matches
    # the oracle if the UDTF emits tokens in document order with correct
    # 0-based positions — COUNT alone would not catch an ordinality bug.
    return spark.sql(f"""
        SELECT d.source,
               COUNT(*) AS token_rows,
               COUNT(DISTINCT s.token) AS distinct_tokens,
               CAST(SUM(s.pos * LENGTH(s.token)) AS BIGINT) AS poslen_sum
        FROM {_VIEW} d, LATERAL pos_tokens(d.text) s
        GROUP BY d.source
        ORDER BY d.source
    """)
