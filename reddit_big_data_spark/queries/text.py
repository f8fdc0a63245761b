"""Text/NLP queries (N1-N9, P8-P10, P13, F9/F13/F14/F15) over `documents`.

The reference's text stack: regex working-set filters
(code/nlp/Data_Gathering.py:45; code/eda/project_eda.py:252-253,1122),
regex dummy variables (code/nlp/Sentiment_Analysis.py:225-233),
tokenize/normalize/stopword/stem (code/nlp/NFL_Processing.py:143-167),
hand-rolled RDD TF-IDF (code/nlp/NFL_Processing.py:477-494) and per-doc
top-k terms (code/nlp/NFL_Processing.py:502-506).

Engine-alignment notes:
- Spark regexp_replace group refs are `$1`; DuckDB's are `\\1`.
- DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
- TF-IDF values are rounded to 6dp on BOTH sides and the top-k window
  orders by the ROUNDED score (+ term tie-break) so ordering is identical
  across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.text import (
    STOPWORDS,
    dictionary_stemmed_tf,
    normalize,
    tf_idf_from_tf,
    top_k_terms,
)
from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import local_df, read_table, spread

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# Shared normalize+tokenize+stopword+stem chain in DuckDB SQL (the oracle
# twin of operators/text.py). \\s escapes survive the f-string.
_ORACLE_TOKENS = f"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                                 '\\s+', ' ', 'g')) AS text_norm
      FROM documents
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text_norm, ' ')) AS term FROM norm
    ),
    stemmed AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(term, 'ies$', 'y'),
                            'sses$', 'ss'), '([^su])s$', '\\1') AS term
      FROM toks
      WHERE term <> '' AND term NOT IN ({_STOP_SQL})
    )
"""


# --------------------------------------------------------------------------
# q09 — THE FLAGSHIP: DataFrame-native TF-IDF + per-doc top-3 terms,
# replacing the reference's RDD chain (code/nlp/NFL_Processing.py:477-506)
# with explode/groupBy/join — one codegen'd shuffle chain, zero Python
# round-trips, corpus size N computed (the reference hard-codes 7511).
# --------------------------------------------------------------------------
@register(
    "q09_tfidf_topk",
    oracle=_ORACLE_TOKENS
    + f""",
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM stemmed GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             ROUND(tf.tf * log10(n.n_docs / dfreq.dfc), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    WHERE rn <= 3
    ORDER BY doc_id, rn
    """,
    doc="DataFrame-native TF-IDF + per-doc top-k (N7+N8+J4+F19+F21+F22+W3+W4)",
)
def q09_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dictionary-stemmed TF (operators/text.py): the stemmer regex chain
    # runs over the DISTINCT vocabulary, not every occurrence — identical
    # output, ~|corpus|/|vocab| less regex work (and this oracle is what
    # proves the equivalence).
    raw = read_table(spark, sf_dir, "documents")
    docs = spread(raw)
    tf = dictionary_stemmed_tf(docs, "doc_id", "text")
    # count the RAW scan (r17): counting above the spread exchange pays
    # the repartition shuffle for a scalar
    n_docs = raw.count()
    scored = tf_idf_from_tf(tf, "doc_id", n_docs).withColumn(
        "tfidf", F.round(F.col("tf_idf"), 6)
    )
    top = top_k_terms(scored.drop("tf_idf").withColumnRenamed("tfidf", "tf_idf"),
                      "doc_id", k=3)
    return (
        top.select(
            "doc_id",
            "term",
            "tf",
            F.col("tf_idf").alias("tfidf"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("doc_id", "rn")
    )


# --------------------------------------------------------------------------
# q37 — within-doc repetition signals (the Gopher/Dolma repetition quality
# filters a pretraining pipeline runs before training): per-doc fraction of
# word-bigram occurrences taken by the single most frequent bigram, and the
# fraction that are repeats of an earlier bigram. Docs where either ratio
# spikes are boilerplate/spam. Bigrams are NON-distinct (zip_with over two
# shifted slices) — repetition is exactly what distinct would erase.
# --------------------------------------------------------------------------
@register(
    "q37_repetition_signals",
    oracle="""
    WITH norm AS (
      SELECT doc_id, lang,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             unnest([toks[i] || ' ' || toks[i+1]
                     for i in generate_series(1, len(toks)-1)]) AS gram
      FROM norm
      WHERE len(toks) >= 2
    ),
    gc AS (
      SELECT doc_id, lang, gram, COUNT(*) AS cnt
      FROM grams GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT doc_id, lang,
             CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_gram_frac,
             1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS dup_gram_frac
      FROM gc GROUP BY 1, 2
    )
    SELECT lang,
           COUNT(*) AS docs,
           ROUND(AVG(top_gram_frac), 4) AS avg_top_gram_frac,
           ROUND(AVG(dup_gram_frac), 4) AS avg_dup_gram_frac,
           CAST(SUM(CASE WHEN top_gram_frac > 0.1 OR dup_gram_frac > 0.3
                    THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Gopher-style repetition filters: top-bigram and duplicate-bigram fractions",
)
def q37_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(read_table(spark, sf_dir, "documents"))
    # bind the token array first: the gram expression references it five
    # times (two slices, two sizes, the filter), and an inline
    # split(normalize(text)) would re-run the regex chain per reference
    bound = docs.select(
        "doc_id", "lang", F.split(normalize("text"), " ").alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    gc = (
        bound.filter(n >= 2)
        .select("doc_id", "lang", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "lang", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = gc.groupBy("doc_id", "lang").agg(
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_gram_frac"),
        (F.lit(1.0) - F.count("*").cast("double") / F.sum("cnt")).alias(
            "dup_gram_frac"
        ),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("top_gram_frac"), 4).alias("avg_top_gram_frac"),
            F.round(F.avg("dup_gram_frac"), 4).alias("avg_dup_gram_frac"),
            F.sum(
                F.when(
                    (F.col("top_gram_frac") > 0.1) | (F.col("dup_gram_frac") > 0.3),
                    1,
                ).otherwise(0)
            ).alias("flagged_docs"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q38 — BM25 keyword retrieval (Okapi k1=1.2 b=0.75): the lexical half of
# every retrieval pipeline. Inverted-index shape: tf over (doc, term) for
# the query terms only (filter BEFORE the tf aggregation — the scan never
# aggregates non-query terms), df per term, document length norm. N and
# avgdl are two driver scalars (one 1-row agg), same pattern as tf_idf's
# computed N. Top-10 by rounded score with doc_id tie-break.
# --------------------------------------------------------------------------
_BM25_TERMS = ("spark", "query", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "q38_bm25_topk",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM norm
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM norm)
      WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    dl AS (SELECT doc_id, len(toks) AS dl FROM norm),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                        + {_BM25_B} * dl.dl / stats.avgdl))
             ) AS score,
             COUNT(*) AS terms_hit
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, ROUND(score, 6) AS bm25, CAST(terms_hit AS BIGINT) AS terms_hit
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
    doc="Okapi BM25 top-k retrieval over an inverted-index-shaped plan",
)
def q38_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25 rounded 6dp, terms_hit) for every doc matching any
    _BM25_TERMS term — shared by q38 (top-k) and q49 (hybrid fusion)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split(normalize("text"), " ").alias("toks"))
    # ONE corpus pass (r9 live-scan audit: the regex-normalize subtree
    # used to run three times — corpus stats, doc lengths, and the term
    # explosion). Doc length AND the query-term hits are ROW-LOCAL, so
    # a single narrow table carries everything downstream: (doc_id, dl,
    # hits) where hits keeps only occurrences of the _BM25_TERMS query
    # terms — |docs| rows with a tiny array, cheap to checkpoint at any
    # scale. Stats, tf, and the length norm all derive from it.
    base = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.filter(
            F.col("toks"), lambda t: t.isin(*_BM25_TERMS)
        ).alias("hits"),
    ).localCheckpoint()
    stats = base.select(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).first()
    if stats["n_docs"] == 0:
        # avg over zero rows is NULL; float(None) below would surface as
        # an opaque TypeError instead of naming the actual problem
        raise ValueError("BM25 scoring requires a non-empty corpus")
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    tf = (
        base.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm_len = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / avgdl
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1.0) / norm_len
    return (
        tf.join(F.broadcast(dfreq), "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count("*").alias("terms_hit"),
        )
    )


# --------------------------------------------------------------------------
# q39 — sequence packing (the training-example assembly step of an LLM data
# pipeline): concatenate documents in a stable order and cut fixed
# token-budget bins; each doc lands in the bin where its span STARTS
# (contiguous streaming packing). One windowed cumsum per source
# partition — at 100 TB the source key becomes (source, shard) so no
# partition exceeds a worker, same plan shape. Output: per-bin document
# count, token load, and fill ratio vs the budget.
# --------------------------------------------------------------------------
_PACK_BUDGET = 2048


@register(
    "q39_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(FLOOR(CAST(SUM(n_tokens) OVER (PARTITION BY source
                      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
                      AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS bin
      FROM toks
    )
    SELECT source, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / {_PACK_BUDGET}, 4) AS fill_ratio
    FROM packed
    GROUP BY source, bin
    ORDER BY source, bin
    """,
    doc="LLM sequence packing: windowed cumsum -> fixed token-budget bins",
)
def q39_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.select(
        "source", "doc_id", n_tokens.alias("n_tokens")
    ).withColumn(
        "bin",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double")
            / _PACK_BUDGET
        ),
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / _PACK_BUDGET, 4
            ).alias("fill_ratio"),
        )
        .orderBy("source", "bin")
    )


# --------------------------------------------------------------------------
# q47 — deterministic stratified sampling: per-stratum rates applied via
# content-stable hash assignment (md5(doc_id) mod 100), NOT rand() — the
# sampling a production pipeline actually ships because it is reproducible
# across reruns, backfills, and engines (which also makes it fully
# oracle-checkable, unlike rand()/sampleBy). Upsampled strata would take
# rate > 100 with repeat; here rates downsample per lang.
# --------------------------------------------------------------------------
_SAMPLE_RATES = {"de": 25, "en": 100, "es": 50, "fr": 75, "zh": 10}  # pct


@register(
    "q47_stratified_sample",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             length(text) AS n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents
    ),
    rates AS (
      SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(_SAMPLE_RATES.items()))})
      AS t(lang, rate)
    )
    SELECT a.lang,
           COUNT(*) AS total_docs,
           CAST(SUM(CASE WHEN a.bucket < r.rate THEN 1 ELSE 0 END) AS BIGINT)
             AS sampled_docs,
           CAST(SUM(CASE WHEN a.bucket < r.rate THEN a.n_chars ELSE 0 END)
             AS BIGINT) AS sampled_chars
    FROM assigned a JOIN rates r USING (lang)
    GROUP BY a.lang
    ORDER BY a.lang
    """,
    doc="deterministic hash-stratified sampling (reproducible, oracle-checkable)",
)
def q47_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    rates = local_df(
        spark, sorted(_SAMPLE_RATES.items()), "lang: string, rate: int"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    assigned = docs.select(
        "lang", F.length("text").alias("n_chars"), bucket.alias("bucket")
    )
    keep = (F.col("bucket") < F.col("rate")).cast("long")
    return (
        assigned.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("total_docs"),
            F.sum(keep).alias("sampled_docs"),
            F.sum(F.col("n_chars") * keep).alias("sampled_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q49 — hybrid retrieval via reciprocal rank fusion: BM25 lexical ranking
# (q38's scorer) fused with dense cosine ranking against a query vector
# (embeddings.vec_id aligns with documents.doc_id) — the standard RAG
# retrieval shape. Each ranking is cut to a top-50 pool FIRST (TakeOrdered,
# no corpus-wide window); rank assignment then windows over 50 rows. RRF
# score = sum over rankings of 1/(60 + rank); absent ranks contribute 0
# and surface as -1 (never NULL — nullable ints float-launder in pandas).
# --------------------------------------------------------------------------
_RRF_K = 60
_RRF_POOL = 50


@register(
    "q49_hybrid_rrf",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM norm),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM norm)
      WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    dl AS (SELECT doc_id, len(toks) AS dl FROM norm),
    bm AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                        + {_BM25_B} * dl.dl / stats.avgdl))
             ), 6) AS bm25
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY 1
    ),
    lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_RRF_POOL}
    ),
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    qv AS (SELECT * FROM v WHERE vec_id = 0),
    cosd AS (
      SELECT v.vec_id AS doc_id,
             ROUND(list_sum(list_transform(generate_series(1, len(qv.e)),
                                           i -> qv.e[i] * v.e[i]))
                   / (qv.nrm * v.nrm), 6) AS c
      FROM v CROSS JOIN qv
      WHERE v.vec_id <> qv.vec_id
    ),
    den AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r
      FROM cosd ORDER BY c DESC, doc_id LIMIT {_RRF_POOL}
    )
    SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({_RRF_K} + lex.r), 0)
                 + COALESCE(1.0 / ({_RRF_K} + den.r), 0), 6) AS rrf,
           CAST(COALESCE(lex.r, -1) AS BIGINT) AS lex_rank,
           CAST(COALESCE(den.r, -1) AS BIGINT) AS dense_rank
    FROM lex FULL OUTER JOIN den USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
    doc="hybrid retrieval: BM25 + dense cosine fused by reciprocal rank fusion",
)
def q49_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from reddit_big_data_spark.operators.similarity import dot

    # lexical pool: cut to top-N via TakeOrdered, THEN rank 50 rows
    lex_pool = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_POOL)
    )
    lex = lex_pool.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
    ).select("doc_id", "r")

    emb = read_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("e")
    ).first()
    if qrow is None or qrow["e"] is None:
        # subscripting the absent row would raise an opaque TypeError;
        # name the contract instead (vec_id 0 is the query vector)
        raise ValueError("hybrid RRF needs a query embedding at vec_id = 0")
    qe = F.array(*[F.lit(float(x)) for x in qrow["e"]])
    v = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("e"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    cosd = v.select(
        "doc_id",
        F.round(dot(qe, F.col("e")) / (F.sqrt(dot(qe, qe)) * F.col("nrm")), 6).alias("c"),
    )
    den_pool = cosd.orderBy(F.col("c").desc(), "doc_id").limit(_RRF_POOL)
    den = den_pool.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("c").desc(), "doc_id"))
    ).select("doc_id", F.col("r").alias("rd"))

    fused = lex.join(den, "doc_id", "full_outer")
    rrf = F.coalesce(1.0 / (_RRF_K + F.col("r")), F.lit(0.0)) + F.coalesce(
        1.0 / (_RRF_K + F.col("rd")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.round(rrf, 6).alias("rrf"),
            F.coalesce("r", F.lit(-1)).cast("long").alias("lex_rank"),
            F.coalesce("rd", F.lit(-1)).cast("long").alias("dense_rank"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q26 — token counting two ways (the LLM-pipeline budget estimator):
# whitespace tokens vs a BPE-style pre-tokenizer count (letter runs /
# digit runs / punctuation singletons — the GPT-2 pre-tokenizer shape,
# minus unicode classes). Native regexp_count on both engines.
# --------------------------------------------------------------------------
@register(
    "q26_token_counts",
    oracle="""
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
             AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
             AS BIGINT) AS bpe_tokens,
           ROUND(AVG(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                     AS DOUBLE)
                     / len(string_split_regex(trim(text), '\\s+'))), 6)
             AS bpe_per_ws
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="whitespace vs BPE-style pre-tokenizer token counts (LLM budget estimate)",
)
def q26_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum(ws).alias("ws_tokens"),
            F.sum(bpe).alias("bpe_tokens"),
            F.round(F.avg(bpe.cast("double") / ws), 6).alias("bpe_per_ws"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q20 — text quality scoring + n-gram-free language-ID heuristic: token
# counts, lexical diversity, stopword ratio, chars/token, and a
# stopword-overlap English detector — the LLM-pipeline quality gates, all
# as native expressions over one scan.
# --------------------------------------------------------------------------
@register(
    "q20_text_quality",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, lang,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS toks,
             length(text) AS n_chars_raw
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS n_stop,
             n_chars_raw
      FROM norm
    )
    SELECT lang,
           COUNT(*) AS docs,
           ROUND(AVG(n_tokens), 4) AS avg_tokens,
           ROUND(AVG(CAST(n_distinct AS DOUBLE) / n_tokens), 4) AS avg_diversity,
           ROUND(AVG(CAST(n_stop AS DOUBLE) / n_tokens), 4) AS avg_stop_ratio,
           ROUND(AVG(CAST(n_chars_raw AS DOUBLE) / n_tokens), 4) AS avg_chars_per_token,
           CAST(SUM(CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.02
                    THEN 1 ELSE 0 END) AS BIGINT) AS pred_english
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
    doc="quality scores (token count/diversity/stopword ratio) + lang-ID heuristic",
)
def q20_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # bind the token array in its own projection: four references to the
    # raw split(normalize(text)) expression would re-inline the regex
    # normalize four times per row (the q105/q77 trap)
    bound = docs.select(
        "lang",
        F.length("text").alias("n_chars_raw"),
        F.split(normalize("text"), " ").alias("toks"),
    )
    per_doc = bound.select(
        "lang",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
        "n_chars_raw",
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(
                F.avg(F.col("n_distinct").cast("double") / F.col("n_tokens")), 4
            ).alias("avg_diversity"),
            F.round(F.avg(stop_ratio), 4).alias("avg_stop_ratio"),
            F.round(
                F.avg(F.col("n_chars_raw").cast("double") / F.col("n_tokens")), 4
            ).alias("avg_chars_per_token"),
            F.sum(F.when(stop_ratio > 0.02, 1).otherwise(0)).alias("pred_english"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q03 — regex working-set filter + regex-derived dummy flags: the pattern the
# reference uses to find its corpus at all (game-thread rlike at
# code/nlp/Data_Gathering.py:45) and to build mention-dummies
# (code/nlp/Sentiment_Analysis.py:225-233), plus the length-threshold filter
# (code/eda/project_eda.py:1012) and regexp_replace cleanup
# (code/ml/Cleaning&Prepping_Data_ML.py:47). P8 P9 P10 P13 F9 F14 F15.
# --------------------------------------------------------------------------
@register(
    "q03_regex_flags",
    oracle="""
    SELECT lang,
           COUNT(*) AS cnt,
           CAST(SUM(CASE WHEN regexp_matches(text, 'spark\\s+\\w+\\s+agg') THEN 1 ELSE 0 END) AS BIGINT) AS spark_agg_hits,
           CAST(SUM(CASE WHEN regexp_matches(text, '(join|merge)') OR source = 'src0'
                    THEN 1 ELSE 0 END) AS BIGINT) AS join_or_src0,
           CAST(SUM(length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT) AS consonant_chars,
           ROUND(AVG(length(text)), 4) AS avg_len
    FROM documents
    WHERE regexp_matches(text, '\\bquery\\b') AND length(text) > 120
    GROUP BY lang
    ORDER BY lang
    """,
    doc="rlike filter + regex dummies + length threshold (P8+P9+P10+P13+F9+F14+F15)",
)
def q03_regex_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        docs.filter(t.rlike(r"\bquery\b") & (F.length(t) > 120))
        .withColumn("spark_agg_hit", t.rlike(r"spark\s+\w+\s+agg").cast("long"))
        .withColumn(
            "join_flag",
            (t.rlike("(join|merge)") | (F.col("source") == "src0")).cast("long"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("spark_agg_hit").alias("spark_agg_hits"),
            F.sum("join_flag").alias("join_or_src0"),
            F.sum(F.length(F.regexp_replace(t, "[aeiou]", ""))).alias("consonant_chars"),
            F.round(F.avg(F.length(t)), 4).alias("avg_len"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q19 — corpus word counts, top-20 (N9): the reference builds one giant
# driver-side string for its wordcloud (code/nlp/NFL_Processing.py:206-215);
# here only (word, count) pairs exist, distributed end to end.
# --------------------------------------------------------------------------
@register(
    "q19_wordcount_top20",
    oracle=_ORACLE_TOKENS
    + """
    SELECT term AS word, COUNT(*) AS cnt
    FROM stemmed
    GROUP BY term
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
    doc="corpus word count + top-N (N9+O1+O2)",
)
def q19_wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same dictionary-stemming shortcut as q09: corpus counts per stem =
    # sum of raw-vocabulary counts mapping to it.
    docs = spread(read_table(spark, sf_dir, "documents"))
    tf = dictionary_stemmed_tf(docs, "doc_id", "text")
    return (
        tf.groupBy(F.col("term").alias("word"))
        .agg(F.sum("tf").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q100 — context-window chunking (operators/text.py chunk_documents): the
# unit-of-work split feeding a pretraining tokenizer or RAG embedder —
# 200-char windows every 150 chars (50 overlap), final chunk truncated,
# every doc >= 1 chunk. Emitted with md5 content digests so the oracle
# checks chunk CONTENT, not just offsets; the plan is scan -> sequence ->
# posexplode, shuffle-free until the trailing oracle-stability sort.
# --------------------------------------------------------------------------
@register(
    "q100_doc_chunking",
    oracle="""
    WITH n AS (
      SELECT doc_id, text,
             1 + CAST(CEIL(GREATEST(length(text) - 200, 0) / 150.0) AS INTEGER)
               AS n_chunks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(i AS INTEGER) AS chunk_idx,
             CAST(i * 150 + 1 AS INTEGER) AS chunk_start,
             substr(text, CAST(i * 150 + 1 AS INTEGER), 200) AS chunk
      FROM (
        SELECT doc_id, text,
               unnest([j for j in generate_series(0, n_chunks - 1)]) AS i
        FROM n
      )
    )
    SELECT doc_id, chunk_idx, chunk_start,
           CAST(length(chunk) AS INTEGER) AS chunk_len,
           md5(chunk) AS chunk_md5
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
    doc="context-window document chunking (size 200 / stride 150), "
    "content-digest oracle",
)
def q100_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.text import chunk_documents

    docs = spread(read_table(spark, sf_dir, "documents"))
    ch = chunk_documents(docs, "doc_id", "text", size=200, stride=150)
    return ch.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        "chunk_len",
        F.md5("chunk").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# q111 — char-n-gram language ID (the Cavnar-Trenkle shape, simplified to
# deterministic integer overlap): build a top-50 char-trigram profile per
# language from the labeled corpus, classify every document by the size
# of its distinct-trigram intersection with each profile (ties to the
# alphabetically first language), and report the confusion matrix. This
# is the n-gram language-ID heuristic itself — q20's stopword ratio is
# the cheap single-language proxy; this is the multi-class classifier a
# cleaning pipeline actually routes on.
#
# All counts and scores are integers, so the oracle matches exactly; the
# per-doc argmax replays identically (ROW_NUMBER over score DESC, lang).
#
# Scale shape: trigram extraction is one transform+explode; profiles are
# a map-side-combined (lang, gram) count cut to 50 rows/lang (broadcast
# size by construction); scoring joins each doc's DISTINCT trigrams
# against the broadcast profile set and counts matches per (doc, lang) —
# no corpus-side shuffle except the per-doc aggregate.
# --------------------------------------------------------------------------
@register(
    "q111_langid_ngram",
    oracle="""
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             unnest([substr(t, CAST(i AS INTEGER), 3)
                     for i in generate_series(1, length(t) - 2)]) AS g
      FROM norm WHERE length(t) >= 3
    ),
    profile AS (
      SELECT lang, g FROM (
        SELECT lang, g, ROW_NUMBER() OVER (
          PARTITION BY lang ORDER BY COUNT(*) DESC, g) AS rn
        FROM grams GROUP BY lang, g
      ) WHERE rn <= 50
    ),
    doc_grams AS (SELECT DISTINCT doc_id, lang AS true_lang, g FROM grams),
    scores AS (
      SELECT d.doc_id, d.true_lang, p.lang AS cand_lang, COUNT(*) AS score
      FROM doc_grams d JOIN profile p ON d.g = p.g
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, true_lang, cand_lang AS pred_lang FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn
        FROM scores
      ) WHERE rn = 1
    )
    SELECT true_lang, pred_lang, COUNT(*) AS n_docs
    FROM pred
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="char-trigram language-ID profiles + overlap classify + confusion matrix",
)
def q111_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(read_table(spark, sf_dir, "documents"))
    nrm = docs.select("doc_id", "lang", normalize("text").alias("t"))
    grams = (
        nrm.filter(F.length("t") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("t") - 2),
                    lambda i: F.substr("t", i, F.lit(3)),
                )
            ).alias("g"),
        )
    )
    # ONE explosion serves both consumers (r9 scan audit; the q101
    # one-counting-pass pattern): group the gram stream to per-doc gram
    # counts once — that table IS the distinct doc-gram set scoring
    # needs, and the language profiles derive from it by summing the
    # per-doc counts (identical totals to counting raw occurrences).
    # Without this, profile-build and doc_grams each re-ran the corpus
    # scan + explosion (measured ~3.0s -> ~2.3s at sf0.1).
    doc_gram_counts = (
        grams.groupBy("doc_id", "lang", "g")
        .agg(F.count("*").alias("__c"))
        .localCheckpoint()
    )
    wp = Window.partitionBy("lang").orderBy(F.desc("__c"), "g")
    profile = (
        doc_gram_counts.groupBy("lang", "g")
        .agg(F.sum("__c").alias("__c"))
        .withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= 50)
        .select(F.col("lang").alias("cand_lang"), "g")
    )
    doc_grams = doc_gram_counts.select(
        "doc_id", F.col("lang").alias("true_lang"), "g"
    )
    scores = (
        doc_grams.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.count("*").alias("score"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand_lang")
    pred = (
        scores.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .select("true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# q141 — Zipf-slope vocabulary power-law fit per source (corpus-health
# QA: natural text follows freq ∝ rank^-s with s ≈ 1; a slope far from
# -1 flags word-soup, boilerplate floods, or over-deduplicated shards —
# the vocabulary-distribution twin of q20's per-doc quality screens).
# Least-squares slope of ln(freq) vs ln(rank) over each source's top-200
# terms (the head of the distribution, where Zipf fits are quoted).
#
# Float discipline (q101's recipe): ln(rank)/ln(freq) are logs of exact
# INTEGERS rounded to 9dp, the four regression sums fold in canonical
# rank order on both engines (<= 200 addends per source — no bucketing
# needed), and the slope divides bit-equal sums before the 4dp output
# round.
#
# Scale shape: token counts are one map-side-combined groupBy; the rank
# window partitions BY SOURCE over the distinct-vocab counts (never the
# corpus); everything after the top-200 filter is bounded at 200 rows
# per source.
# --------------------------------------------------------------------------
@register(
    "q141_zipf_slope",
    oracle="""
    WITH toks AS (
      SELECT source,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    counts AS (
      SELECT source, w, COUNT(*) AS freq
      FROM (SELECT source, unnest(t) AS w FROM toks)
      WHERE w <> '' GROUP BY source, w
    ),
    ranked AS (
      SELECT source, w, freq,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY freq DESC, w) AS rnk
      FROM counts
    ),
    head AS (
      SELECT source, rnk,
             ROUND(LN(rnk), 9) AS x, ROUND(LN(freq), 9) AS y
      FROM ranked WHERE rnk <= 200
    ),
    sums AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             list_sum(list(x ORDER BY rnk)) AS sx,
             list_sum(list(y ORDER BY rnk)) AS sy,
             list_sum(list(x * y ORDER BY rnk)) AS sxy,
             list_sum(list(x * x ORDER BY rnk)) AS sxx
      FROM head GROUP BY source
    )
    SELECT source, n_terms,
           ROUND((n_terms * sxy - sx * sy)
                 / (n_terms * sxx - sx * sx), 4) AS zipf_slope
    FROM sums
    WHERE n_terms >= 2
    ORDER BY source
    """,
    doc="Zipf power-law slope of the top-200 rank-frequency curve per "
    "source (corpus vocabulary-health QA)",
)
def q141_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(read_table(spark, sf_dir, "documents"))
    counts = (
        docs.select(
            "source", F.explode(F.split(normalize("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("freq"), "w")
    head = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 200)
        .select(
            "source",
            "rnk",
            F.round(F.log("rnk"), 9).alias("x"),
            F.round(F.log("freq"), 9).alias("y"),
        )
    )

    def _fold(expr):
        # canonical rank-ordered fold: <= 200 addends, same order as the
        # oracle's list(... ORDER BY rnk) -> list_sum
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct("rnk", expr.alias("v")))),
            F.lit(0.0),
            lambda a, s: a + s["v"],
        )

    sums = head.groupBy("source").agg(
        F.count("*").alias("n_terms"),
        _fold(F.col("x")).alias("sx"),
        _fold(F.col("y")).alias("sy"),
        _fold(F.col("x") * F.col("y")).alias("sxy"),
        _fold(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (
        sums.filter(F.col("n_terms") >= 2)
        .select("source", "n_terms", F.round(slope, 4).alias("zipf_slope"))
        .orderBy("source")
    )
