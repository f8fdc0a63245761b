"""Deep nested-struct navigation (F19/F20 beyond JSON) + the full Porter
stemmer (N4) as registered correctness queries.

q67 exercises the 3-level struct/array shape of the reference's Reddit
submissions table — ``preview.images[].variants.*`` walked in
project_eda.ipynb cell 7 and flattened with explode + dotted access.
The testdata has no natively-nested parquet, so the query BUILDS the
nested document from orders+lineitem with native struct/array/collect_list
constructors, then navigates it back down with explode and getItem — both
directions of the F19/F20 surface. The DuckDB oracle computes the same
answer from the flat tables directly: the oracle pins semantics, not plan
shape, so a construction bug and a navigation bug cannot cancel out (the
flat twin never builds the struct at all).

q68 applies `operators/porter.porter_stem` with the dictionary-stemming
pattern (stem distinct vocabulary in one Arrow batch, broadcast-join back)
— reference Stemmer annotator, code/nlp/NFL_Processing.py:411-413. The
corpus vocabulary is a fixed generator wordlist, so the oracle pins a
hand-verified golden mapping of every non-identity stem (custom/kei/queri/
tabl/merg/valu — each checked against Porter 1980 by hand, independent of
the Python implementation) with an identity fallback: an unexpected
surface form would surface as a hash mismatch, never silently pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.porter import stem_vocabulary
from reddit_big_data_spark.operators.text import tokenize
from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q67 — build order "documents" shaped like the reference submissions rows:
#   doc: struct<meta: struct<priority, status>,
#               lines: array<struct<line_no,
#                            charges: array<struct<kind, amount>>>>>
# then navigate 3 levels back down: doc.meta.priority (dotted struct
# access), explode(doc.lines) (level 2), explode(line.charges) (level 3),
# plus positional getItem for the first line's tax charge.
# Scale shape: collect_list groups lines per order (bounded fan-in — max 7
# lineitems per order in TPC-H), one shuffle on l_orderkey shared by the
# groupBy and the orders join; the unwind is explode (no shuffle).
# --------------------------------------------------------------------------
@register(
    "q67_nested_struct",
    oracle="""
    WITH tax AS (
      SELECT o_orderpriority AS priority,
             l_extendedprice * l_tax AS amount,
             -- l_linenumber is NOT unique per order in the testdata; the
             -- tie-break mirrors sort_array's struct comparison on the
             -- Spark side: (line_no, tax amount, discount amount).
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber,
                                         l_extendedprice * l_tax,
                                         l_extendedprice * l_discount) AS rn
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )
    SELECT priority,
           COUNT(*) AS n_tax_charges,
           ROUND(SUM(amount), 2) AS sum_tax,
           ROUND(SUM(CASE WHEN rn = 1 THEN amount ELSE 0 END), 2)
             AS first_line_tax
    FROM tax
    GROUP BY priority
    ORDER BY priority
    """,
    doc="3-level struct/array build + explode/getItem navigation (F19/F20)",
)
def q67_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")

    # -- build: lineitem rows -> per-line struct with a charges array ----
    line_struct = F.struct(
        F.col("l_linenumber").alias("line_no"),
        F.array(
            F.struct(
                F.lit("tax").alias("kind"),
                (F.col("l_extendedprice") * F.col("l_tax")).alias("amount"),
            ),
            F.struct(
                F.lit("discount").alias("kind"),
                (F.col("l_extendedprice") * F.col("l_discount")).alias("amount"),
            ),
        ).alias("charges"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        # sort_array orders the struct array by line_no (first field), so
        # positional getItem below is deterministic despite collect_list's
        # arbitrary arrival order.
        F.sort_array(F.collect_list(line_struct)).alias("lines")
    )
    docs = per_order.join(
        orders, per_order["l_orderkey"] == orders["o_orderkey"]
    ).select(
        F.col("o_orderkey").alias("order_id"),
        F.struct(
            F.struct(
                F.col("o_orderpriority").alias("priority"),
                F.col("o_orderstatus").alias("status"),
            ).alias("meta"),
            F.col("lines"),
        ).alias("doc"),
    )

    # -- navigate: dotted access + positional getItem + 2 explodes -------
    # Positional getItem down all 3 levels (F20)...
    first_tax = (
        F.col("doc.lines").getItem(0).getField("charges").getItem(0)
        .getField("amount")
    )
    # ...and posexplode (F19) — pos==0 marks exactly one row per order
    # (line_no alone could not: it duplicates within orders in the
    # testdata), so the first-line sum counts each order exactly once.
    lines = docs.select(
        F.col("doc.meta.priority").alias("priority"),
        first_tax.alias("first_tax"),
        F.posexplode("doc.lines").alias("pos", "line"),
    )
    charges = lines.select(
        "priority",
        "first_tax",
        "pos",
        F.explode("line.charges").alias("ch"),
    )
    return (
        charges.filter(F.col("ch.kind") == "tax")
        .groupBy("priority")
        .agg(
            F.count("*").alias("n_tax_charges"),
            F.round(F.sum(F.col("ch.amount")), 2).alias("sum_tax"),
            F.round(
                F.sum(F.when(F.col("pos") == 0, F.col("first_tax"))),
                2,
            ).alias("first_line_tax"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# q68 — full Porter stemmer over the corpus via dictionary stemming.
# --------------------------------------------------------------------------
@register(
    "q68_porter_stems",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
                 lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')),
                 ' ')) AS token
      FROM documents
    ),
    stemmed AS (
      SELECT token,
             CASE token
               WHEN 'customer' THEN 'custom'
               WHEN 'key'      THEN 'kei'
               WHEN 'query'    THEN 'queri'
               WHEN 'table'    THEN 'tabl'
               WHEN 'merge'    THEN 'merg'
               WHEN 'value'    THEN 'valu'
               ELSE token
             END AS stem
      FROM toks WHERE token <> ''
    )
    SELECT stem,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT token) AS n_forms
    FROM stemmed
    GROUP BY stem
    ORDER BY stem
    """,
    doc="full Porter stemmer (N4), dictionary-stemmed + broadcast-joined",
)
def q68_porter_stems(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(tokenize("text")).alias("token"))
        .filter(F.col("token") != "")
    )
    dictionary = stem_vocabulary(toks, "token")
    return (
        toks.join(F.broadcast(dictionary), "token")
        .groupBy("stem")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("token").alias("n_forms"),
        )
        .orderBy("stem")
    )
