"""Training-corpus cleaning queries: PII redaction, a C4/Gopher-style
document-quality filter funnel, and cross-document boilerplate detection.

Not present in the reference (its Reddit dumps arrive pre-cleaned); this
is the LLM-pipeline extension from the builder brief, and the natural
upstream of the dedup family (queries/dedup.py): redact -> quality-filter
-> de-boilerplate -> dedup is the canonical pretraining sequence.

Everything is native Spark SQL expressions — regexp_count/regexp_replace
for redaction (JVM codegen, no Python in the hot path), one explode +
two-level aggregate for per-doc token statistics, and the existing
word-shingle transform for boilerplate — so each query carries a full
DuckDB oracle. Regex patterns are restricted to the syntax Java's
regex engine and DuckDB's RE2 interpret identically (character classes,
bounded repetition, \\b, \\d — no lookaround, no backrefs).

The synthetic corpus contains no actual PII, so q75 injects a
deterministic doc_id-derived email/phone/IP suffix IN BOTH ENGINES and
then proves the redactor strips it (residual_pii = 0) — the redaction
logic is exercised end-to-end with non-trivial counts and the check
stays honestly reproducible from the shipped testdata alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.dedup import word_shingles
from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table, spread

_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_ANY_PII = f"{_EMAIL}|{_PHONE}|{_IP}"


# --------------------------------------------------------------------------
# q75 — PII redaction: count + strip emails/phones/IPs with native regex
# (scan -> narrow projection, no shuffle until the per-lang rollup).
# residual_pii re-scans the REDACTED text and must be 0 — the oracle
# check therefore pins both the counting and the replacement semantics.
# --------------------------------------------------------------------------
@register(
    "q75_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, lang,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  || CASE WHEN doc_id % 3 = 0
                     THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                          || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
                  || CASE WHEN doc_id % 2 = 0
                     THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                          || CAST((doc_id * 3) % 256 AS VARCHAR)
                     ELSE '' END AS t
      FROM documents
    ),
    red AS (
      SELECT lang,
             len(regexp_extract_all(t, '{_EMAIL}')) AS n_emails,
             len(regexp_extract_all(t, '{_PHONE}')) AS n_phones,
             len(regexp_extract_all(t, '{_IP}')) AS n_ips,
             regexp_replace(regexp_replace(regexp_replace(t,
                 '{_EMAIL}', '<EMAIL>', 'g'),
                 '{_IP}', '<IP>', 'g'),
                 '{_PHONE}', '<PHONE>', 'g') AS clean
      FROM aug
    )
    SELECT lang, COUNT(*) AS docs,
           CAST(SUM(n_emails) AS BIGINT) AS emails,
           CAST(SUM(n_phones) AS BIGINT) AS phones,
           CAST(SUM(n_ips) AS BIGINT) AS ips,
           CAST(SUM(len(regexp_extract_all(clean, '{_ANY_PII}'))) AS BIGINT)
             AS residual_pii,
           CAST(SUM(length(clean)) AS BIGINT) AS clean_chars
    FROM red GROUP BY lang ORDER BY lang
    """,
    doc="PII redaction: regex count + strip, residual re-scan proves clean",
)
def q75_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    aug = docs.select(
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-"),
                    F.lpad((F.col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0."),
                    (F.col("doc_id") * 3 % 256).cast("string"),
                ),
            ).otherwise(""),
        ).alias("t"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL, "<EMAIL>"), _IP, "<IP>"
        ),
        _PHONE,
        "<PHONE>",
    )
    red = aug.select(
        "lang",
        F.regexp_count(F.col("t"), F.lit(_EMAIL)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE)).alias("n_phones"),
        F.regexp_count(F.col("t"), F.lit(_IP)).alias("n_ips"),
        clean.alias("clean"),
    )
    return (
        red.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_emails").alias("emails"),
            F.sum("n_phones").alias("phones"),
            F.sum("n_ips").alias("ips"),
            F.sum(F.regexp_count(F.col("clean"), F.lit(_ANY_PII))).alias(
                "residual_pii"
            ),
            F.sum(F.length("clean")).alias("clean_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q76 — quality filter funnel (C4 length/word filters + Gopher mean-word-
# length, stopword-ratio, and repetition bounds): how many documents
# survive each successive stage. Per-doc stats come from ONE explode and
# a two-level aggregate (token counts, then doc rollup) — the same
# map-side-combinable shape as q37; the funnel itself is a single-row
# aggregate unpivoted to (stage, survivors) rows.
# --------------------------------------------------------------------------
_STOPS = ("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")


@register(
    "q76_quality_funnel",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tc AS (
      SELECT doc_id, ANY_VALUE(n_chars) AS n_chars, w, COUNT(*) AS c,
             SUM(length(w)) AS wchars,
             SUM(CASE WHEN w IN {_STOPS} THEN 1 ELSE 0 END) AS stops
      FROM toks GROUP BY doc_id, w
    ),
    per_doc AS (
      SELECT doc_id, ANY_VALUE(n_chars) AS n_chars,
             CAST(SUM(c) AS BIGINT) AS n_words,
             CAST(SUM(wchars) AS DOUBLE) / SUM(c) AS mean_wlen,
             CAST(SUM(stops) AS DOUBLE) / SUM(c) AS stop_ratio,
             CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_tok_frac
      FROM tc GROUP BY doc_id
    )
    SELECT 's0_all' AS stage, COUNT(*) AS survivors FROM per_doc
    UNION ALL SELECT 's1_len', COUNT(*) FROM per_doc
      WHERE n_chars BETWEEN 100 AND 400
    UNION ALL SELECT 's2_words', COUNT(*) FROM per_doc
      WHERE n_chars BETWEEN 100 AND 400 AND n_words >= 30
    UNION ALL SELECT 's3_wordlen', COUNT(*) FROM per_doc
      WHERE n_chars BETWEEN 100 AND 400 AND n_words >= 30
        AND mean_wlen BETWEEN 3.0 AND 4.6
    UNION ALL SELECT 's4_stopwords', COUNT(*) FROM per_doc
      WHERE n_chars BETWEEN 100 AND 400 AND n_words >= 30
        AND mean_wlen BETWEEN 3.0 AND 4.6 AND stop_ratio >= 0.03
    UNION ALL SELECT 's5_repetition', COUNT(*) FROM per_doc
      WHERE n_chars BETWEEN 100 AND 400 AND n_words >= 30
        AND mean_wlen BETWEEN 3.0 AND 4.6 AND stop_ratio >= 0.03
        AND top_tok_frac <= 0.11
    ORDER BY stage
    """,
    doc="C4/Gopher quality-filter funnel: cumulative survivors per stage",
)
def q76_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "n_chars", F.explode(F.split("text", " ")).alias("w")
    )
    tc = toks.groupBy("doc_id", "w").agg(
        F.first("n_chars").alias("n_chars"),
        F.count("*").alias("c"),
        F.sum(F.length("w")).alias("wchars"),
        F.sum(F.when(F.col("w").isin(*_STOPS), 1).otherwise(0)).alias("stops"),
    )
    per_doc = tc.groupBy("doc_id").agg(
        F.first("n_chars").alias("n_chars"),
        F.sum("c").alias("n_words"),
        (F.sum("wchars").cast("double") / F.sum("c")).alias("mean_wlen"),
        (F.sum("stops").cast("double") / F.sum("c")).alias("stop_ratio"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_tok_frac"),
    )
    s1 = F.col("n_chars").between(100, 400)
    s2 = s1 & (F.col("n_words") >= 30)
    s3 = s2 & F.col("mean_wlen").between(3.0, 4.6)
    s4 = s3 & (F.col("stop_ratio") >= 0.03)
    s5 = s4 & (F.col("top_tok_frac") <= 0.11)
    cnt = lambda c: F.sum(c.cast("long"))  # noqa: E731
    wide = per_doc.agg(
        F.count("*").alias("s0_all"),
        cnt(s1).alias("s1_len"),
        cnt(s2).alias("s2_words"),
        cnt(s3).alias("s3_wordlen"),
        cnt(s4).alias("s4_stopwords"),
        cnt(s5).alias("s5_repetition"),
    )
    stages = ["s0_all", "s1_len", "s2_words", "s3_wordlen", "s4_stopwords", "s5_repetition"]
    stack = ", ".join(f"'{s}', {s}" for s in stages)
    return wide.selectExpr(
        f"stack({len(stages)}, {stack}) AS (stage, survivors)"
    ).orderBy("stage")


# --------------------------------------------------------------------------
# q77 — cross-document boilerplate: 5-gram shingles appearing in the most
# documents (the "same footer on every page" detector). Distinct shingles
# per doc via the shared word_shingles transform (operators/dedup.py:34),
# then one groupBy — never a doc-x-doc join. Deterministic top-15 under
# the (n_docs DESC, gram) total order.
# --------------------------------------------------------------------------
@register(
    "q77_boilerplate_shingles",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                     for i in generate_series(1, len(t)-4)])) AS gram
      FROM toks WHERE len(t) >= 5
    ),
    cov AS (SELECT gram, COUNT(*) AS n_docs FROM sh GROUP BY gram)
    SELECT gram, n_docs,
           ROUND(CAST(n_docs AS DOUBLE)
                 / (SELECT COUNT(*) FROM documents), 4) AS coverage
    FROM cov
    ORDER BY n_docs DESC, gram LIMIT 15
    """,
    doc="cross-doc 5-gram coverage: boilerplate candidates, top-15",
)
def q77_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_table(spark, sf_dir, "documents"))
    total = docs.count()  # scalar metadata-size count, not a driver loop
    # bind the token array BEFORE shingling: word_shingles references its
    # argument per position, and a raw split(text) argument re-inlines the
    # split into every one (the q105 trap; see memory / queries/dedup.py)
    sh = docs.select(F.split("text", " ").alias("toks")).select(
        F.explode(word_shingles(F.col("toks"), k=5)).alias("gram")
    )
    return (
        sh.groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "gram",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.lit(total), 4).alias(
                "coverage"
            ),
        )
        .orderBy(F.desc("n_docs"), "gram")
        .limit(15)
    )


# --------------------------------------------------------------------------
# q96 — fuzzy entity matching (blocked edit-distance join) at the
# DICTIONARY level: the block -> verify pattern every entity-resolution
# pipeline uses, with the quadratic levenshtein verify running over
# DISTINCT (brand, name) groups, never part rows — pair counts between
# groups multiply back (cnt_a * cnt_b), exact-duplicate pairs are
# C(cnt, 2) per group. Same |rows| -> |vocabulary| collapse as q09's
# dictionary stemming: at 100 TB the name vocabulary, not the row count,
# bounds the verify (measured 7.1s -> sub-second at sf0.1).
# --------------------------------------------------------------------------
@register(
    "q96_fuzzy_name_match",
    oracle="""
    WITH ng AS (
      SELECT p_brand, p_name, COUNT(*) AS cnt FROM part GROUP BY 1, 2
    ),
    np AS (
      SELECT a.p_brand, a.p_name AS na, b.p_name AS nb,
             a.cnt * b.cnt AS cross_cnt
      FROM ng a JOIN ng b
        ON a.p_brand = b.p_brand AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
    ),
    paired_names AS (
      SELECT DISTINCT p_brand, na AS p_name FROM np
      UNION
      SELECT DISTINCT p_brand, nb AS p_name FROM np
    ),
    per_brand_np AS (
      SELECT p_brand, CAST(SUM(cross_cnt) AS BIGINT) AS near_pairs
      FROM np GROUP BY p_brand
    ),
    per_brand AS (
      SELECT ng.p_brand,
             CAST(SUM(ng.cnt * (ng.cnt - 1) / 2) AS BIGINT) AS exact_dup_pairs,
             CAST(SUM(CASE WHEN ng.cnt >= 2 OR pn.p_name IS NOT NULL
                      THEN ng.cnt ELSE 0 END) AS BIGINT) AS parts_in_pairs
      FROM ng LEFT JOIN paired_names pn
        ON pn.p_brand = ng.p_brand AND pn.p_name = ng.p_name
      GROUP BY ng.p_brand
    )
    SELECT p_brand, exact_dup_pairs,
           COALESCE(near_pairs, 0) AS near_pairs, parts_in_pairs
    FROM per_brand LEFT JOIN per_brand_np USING (p_brand)
    ORDER BY p_brand
    """,
    doc="blocked fuzzy join on the name dictionary: levenshtein over groups",
)
def q96_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").select("p_brand", "p_name")
    # Materialize the name dictionary once (distinct names — dictionary-
    # sized): it feeds both levenshtein-join branches and the per-brand
    # probe, each of which would otherwise re-run the scan+groupBy.
    ng = (
        part.groupBy("p_brand", "p_name")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    a = ng.select(
        "p_brand", F.col("p_name").alias("na"), F.col("cnt").alias("cnt_a")
    )
    b = ng.select(
        "p_brand", F.col("p_name").alias("nb"), F.col("cnt").alias("cnt_b")
    )
    # ... and the near-pair result once (tiny): both arms of the paired-
    # names union plus the per-brand rollup read it, and each would
    # otherwise re-run the blocked levenshtein join — the expensive stage.
    np_ = (
        a.join(b, "p_brand")
        .filter(F.col("na") < F.col("nb"))
        .filter(F.levenshtein("na", "nb").between(1, 2))
        .select("p_brand", "na", "nb", (F.col("cnt_a") * F.col("cnt_b")).alias("cross_cnt"))
        .localCheckpoint()
    )
    paired = (
        np_.select("p_brand", F.col("na").alias("p_name"))
        .union(np_.select("p_brand", F.col("nb").alias("p_name")))
        .distinct()
        .withColumn("__paired", F.lit(True))
    )
    per_brand = (
        ng.join(paired, ["p_brand", "p_name"], "left")
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2)
            .cast("long")
            .alias("exact_dup_pairs"),
            F.sum(
                F.when(
                    (F.col("cnt") >= 2) | F.col("__paired").isNotNull(),
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("parts_in_pairs"),
        )
    )
    near = np_.groupBy("p_brand").agg(
        F.sum("cross_cnt").cast("long").alias("near_pairs")
    )
    return (
        per_brand.join(near, "p_brand", "left")
        .select(
            "p_brand",
            "exact_dup_pairs",
            F.coalesce("near_pairs", F.lit(0)).alias("near_pairs"),
            "parts_in_pairs",
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q110 — data-quality constraint audit (the expectations-style validation
# pass every production pipeline runs before publishing a table): five
# constraint classes over the warehouse tables — primary-key uniqueness,
# foreign-key integrity, not-null, value range, accepted values — each
# reported as (check_name, n_checked, n_violations, passed). One
# aggregate or one anti-join per check, unioned; counts are exact
# integers so the oracle matches with no float discipline.
#
# Scale shape: uniqueness is COUNT - COUNT(DISTINCT) (two map-side-
# combined aggregates, no self-join); FK integrity is a LEFT ANTI join
# shuffling only the key columns; the rest are single-pass conditional
# counts. Nothing here reads a column the check doesn't need.
# --------------------------------------------------------------------------
@register(
    "q110_constraint_audit",
    oracle="""
    WITH checks AS (
      SELECT 'accepted_values_o_orderstatus' AS check_name,
             COUNT(*) AS n_checked,
             SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'fk_lineitem_orderkey', COUNT(*),
             SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'not_null_o_custkey', COUNT(*),
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'range_l_quantity_1_50', COUNT(*),
             SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END)
      FROM lineitem
      UNION ALL
      SELECT 'unique_o_orderkey', COUNT(*),
             COUNT(*) - COUNT(DISTINCT o_orderkey)
      FROM orders
    )
    SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM checks
    ORDER BY check_name
    """,
    doc="expectations-style constraint audit: pk/fk/null/range/values checks",
)
def q110_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    def row(name, n_checked, n_violations):
        return F.struct(
            F.lit(name).alias("check_name"),
            n_checked.cast("long").alias("n_checked"),
            n_violations.cast("long").alias("n_violations"),
        )

    accepted = orders.agg(
        row(
            "accepted_values_o_orderstatus",
            F.count("*"),
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
            ),
        ).alias("r")
    )
    fk = (
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            row(
                "fk_lineitem_orderkey",
                F.count("*"),
                F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
            ).alias("r")
        )
    )
    not_null = orders.agg(
        row(
            "not_null_o_custkey",
            F.count("*"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
        ).alias("r")
    )
    rng = lineitem.agg(
        row(
            "range_l_quantity_1_50",
            F.count("*"),
            F.sum(
                F.when(
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
                ).otherwise(0)
            ),
        ).alias("r")
    )
    unique = orders.agg(
        row(
            "unique_o_orderkey",
            F.count("*"),
            F.count("*") - F.countDistinct("o_orderkey"),
        ).alias("r")
    )
    out = accepted.unionAll(fk).unionAll(not_null).unionAll(rng).unionAll(unique)
    return (
        out.select("r.check_name", "r.n_checked", "r.n_violations")
        .withColumn("passed", F.col("n_violations") == 0)
        .orderBy("check_name")
    )
