"""Training-data curation queries: PII redaction, repetition-based quality
metrics, and stratified sampling (north-star LLM-pipeline ops; the reference
has no curation surface at all — its only quality gates are the null/sentinel
drops at transform/execute.py:80-94).

All three run at scan speed or with one bounded shuffle, and each DuckDB
oracle replicates the identical expression tree, so the value-hash gate
proves both formulations agree bit-for-bit (division and subtraction on
doubles are correctly rounded and deterministic in both engines; the only
hash primitive is md5, identical everywhere).

The documents testdata is synthetic word-salad with no natural PII, so
q56 *injects* deterministic PII (derived from doc_id) before detecting and
redacting it — the same plant-then-recover pattern the near-dup suite uses
for twins (plans/dedup_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table

# Simple, dialect-portable patterns (Java regex and RE2 agree on character
# classes and bounded repetition; no \d, no lookaround). The injected PII is
# lowercase, so the classes stay tight.
EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+"
PHONE_RE = r"[0-9]{3}-555-[0-9]{4}"


@query(
    "q56_pii_redaction",
    oracle=f"""
    WITH planted AS (
        SELECT doc_id,
               CASE
                 WHEN doc_id % 4 = 0 THEN
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or call '
                        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 WHEN doc_id % 4 = 1 THEN
                   text || ' mail user' || CAST(doc_id AS VARCHAR)
                        || '@example.com'
                 WHEN doc_id % 4 = 2 THEN
                   text || ' call '
                        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE text
               END AS text2
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text2, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text2, '{PHONE_RE}')) AS n_phones,
           md5(regexp_replace(
                   regexp_replace(text2, '{EMAIL_RE}', '[EMAIL]', 'g'),
                   '{PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
    FROM planted
    """,
)
def q56_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count and mask emails/phones per document.

    Plants deterministic synthetic PII in 3 of every 4 docs (the corpus has
    none naturally), then detects with regexp_count and redacts with chained
    regexp_replace. Everything is a narrow codegen'd projection — no
    shuffle, no Python — so at 100 TB this runs at parquet-scan speed; the
    patterns are plan-time literals that Catalyst compiles once per stage.
    (Spark replaces all occurrences by default; the DuckDB oracle needs the
    explicit 'g' flag.)
    """
    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    phone = F.concat(
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email = F.concat(F.lit("user"), sid, F.lit("@example.com"))
    text2 = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"), F.lit(" contact "), email,
                F.lit(" or call "), phone,
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.col("text"), F.lit(" mail "), email),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.col("text"), F.lit(" call "), phone),
        )
        .otherwise(F.col("text"))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(text2, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(text2, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text2, F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "q57_repetition_metrics",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    stats AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_uniq,
               len(list_distinct(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1]))) AS n2_dist
        FROM t
    ),
    topc AS (
        SELECT doc_id, max(c) AS top_cnt
        FROM (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY doc_id, tok
        )
        GROUP BY doc_id
    )
    SELECT s.doc_id,
           s.n_tokens,
           1.0 - CAST(n_uniq AS DOUBLE) / n_tokens AS dup_token_frac,
           CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_frac,
           CASE WHEN n_tokens > 1
                THEN 1.0 - CAST(n2_dist AS DOUBLE) / (n_tokens - 1)
                ELSE 0.0 END AS dup_2gram_frac,
           (CAST(top_cnt AS DOUBLE) / n_tokens > 0.1
            OR (CASE WHEN n_tokens > 1
                     THEN 1.0 - CAST(n2_dist AS DOUBLE) / (n_tokens - 1)
                     ELSE 0.0 END) > 0.6) AS is_repetitive
    FROM stats s JOIN topc USING (doc_id)
    """,
)
def q57_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher/RefinedWeb-style
    quality filters): duplicated-token fraction, most-common-token fraction,
    duplicated-2-gram fraction, and a composite is_repetitive flag.

    Scale shape: the set-size stats (n_tokens/n_uniq/n2_dist) are narrow
    scan-stage work; the top-token count is explode → two-level hash
    aggregation keyed on (doc_id, token) then (doc_id) — both map-side
    combined, keys are doc-scoped so there is no global hot key — and one
    equi-join on doc_id reunites the two branches. Nothing is quadratic in
    document length except the 2-gram distinct, which is linear after
    zip_with shingling.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # 2-grams via zip_with against the array's own tail (the shingling trick
    # from operators/neardup.word_shingles, inlined for k=2)
    grams2 = F.zip_with(
        toks,
        F.slice(toks, 2, F.size(toks)),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n2_dist = F.size(
        F.array_distinct(F.filter(grams2, lambda x: x.isNotNull()))
    )
    stats = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        n2_dist.alias("n2_dist"),
    )
    topc = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    j = stats.join(topc, "doc_id")
    n = F.col("n_tokens")
    dup_token_frac = F.lit(1.0) - F.col("n_uniq").cast("double") / n
    top_token_frac = F.col("top_cnt").cast("double") / n
    dup_2gram_frac = F.when(
        n > 1, F.lit(1.0) - F.col("n2_dist").cast("double") / (n - 1)
    ).otherwise(F.lit(0.0))
    return j.select(
        "doc_id",
        "n_tokens",
        dup_token_frac.alias("dup_token_frac"),
        top_token_frac.alias("top_token_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
        ((top_token_frac > 0.1) | (dup_2gram_frac > 0.6)).alias(
            "is_repetitive"
        ),
    )


# Per-stratum sample size, and the pre-filter over-admission factor: the
# cheap scan-stage filter admits ~OVERSAMPLE×TARGET rows per stratum before
# the exact window runs, so the window's shuffle is O(strata × oversample ×
# target) however large the corpus is.
STRATUM_TARGET = 25
OVERSAMPLE = 4
# mixture arm: admission rate K/sqrt(n_domain) — unnormalized temperature
# sampling at alpha = 0.5 (expected domain count K*sqrt(n_d)); K=4.0 keeps
# every synthetic lang domain under rate 1.0 at sf>=0.001
MIXTURE_K = 4.0

def md5_hex8_long(col, salt: str | None = None):
    """Spark twin of _sql_hex8_to_bigint ∘ md5: the leading 8 hex digits of
    md5(CAST(col AS STRING)) as a BIGINT in [0, 2^32) — the engine's
    deterministic, engine-portable uniform key (q58 sampling arms, q77
    packing order). ``salt`` prefixes the hashed string to decorrelate
    independent variates over the same ids. Keep this and the SQL twin in
    lockstep: every keying-scheme change must hit both."""
    s = (F.col(col) if isinstance(col, str) else col).cast("string")
    if salt:
        s = F.concat(F.lit(salt), s)
    return F.conv(F.md5(s).substr(1, 8), 16, 10).cast("long")


def _sql_hex8_to_bigint(hex_expr: str) -> str:
    """DuckDB SQL: parse the leading 8 hex digits of ``hex_expr`` as a
    BIGINT (DuckDB has no conv(x, 16, 10)) by folding positions 1..8
    through the hex alphabet."""
    return (
        "list_reduce(list_transform(range(1, 9), i -> "
        f"CAST(strpos('0123456789abcdef', substring({hex_expr}, i, 1)) - 1 "
        "AS BIGINT)), (acc, x) -> acc * 16 + x)"
    )


@query(
    "q58_sampling_suite",
    oracle=f"""
    WITH u AS (
        SELECT doc_id, lang,
               CAST({_sql_hex8_to_bigint("md5(CAST(doc_id AS VARCHAR))")}
                    AS DOUBLE) / 4294967296.0 AS unif
        FROM documents
    ),
    counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    admitted AS (
        SELECT u.doc_id, u.lang, u.unif
        FROM u JOIN counts USING (lang)
        WHERE u.unif < least(1.0,
              CAST({OVERSAMPLE * STRATUM_TARGET} AS DOUBLE) / counts.n)
    )
    SELECT 'stratified' AS method, doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY unif, doc_id) AS rk
        FROM admitted
    )
    WHERE rk <= {STRATUM_TARGET}
    UNION ALL
    SELECT 'hash_mod' AS method, doc_id, lang, CAST(NULL AS BIGINT) AS rk
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    UNION ALL
    SELECT 'mixture' AS method, m.doc_id, m.lang, CAST(NULL AS BIGINT) AS rk
    FROM (
        SELECT doc_id, lang,
               CAST({_sql_hex8_to_bigint(
                   "md5('mx:' || CAST(doc_id AS VARCHAR))")}
                    AS DOUBLE) / 4294967296.0 AS unif_mx
        FROM documents
    ) m JOIN counts USING (lang)
    WHERE m.unif_mx < least(1.0, {MIXTURE_K} / sqrt(CAST(counts.n AS DOUBLE)))
    UNION ALL
    SELECT 'weighted' AS method, doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY es_key DESC, doc_id
               ) AS rk
        FROM (
            SELECT doc_id, lang,
                   POWER(
                       CAST({_sql_hex8_to_bigint(
                           "md5('ws:' || CAST(doc_id AS VARCHAR))")}
                            AS DOUBLE) / 4294967296.0,
                       1.0 / CAST(greatest(n_chars, 1) AS DOUBLE)
                   ) AS es_key
            FROM documents
        )
    )
    WHERE rk <= {STRATUM_TARGET}
    """,
)
def q58_sampling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling suite (r7 consolidation: absorbed
    q55_hash_mod_sample as the ``hash_mod`` arm — both are md5-keyed
    rerun-stable samplers over the same table, discriminated by the
    ``method`` column).

    Arm ``stratified``: exactly min(n, 25) docs per lang,
    chosen by md5 order — rerun-stable, engine-independent, no rand().

    Two-phase for scale: a naive `row_number over (partition by stratum)`
    shuffles the WHOLE corpus into one reducer per stratum — with
    low-cardinality strata (the realistic case: a handful of languages over
    100 TB) that is a straggler by construction. Instead (1) a broadcast
    join against the tiny per-stratum counts sets an admission threshold of
    ~{OVERSAMPLE}x the target on the md5-uniform variate — a scan-stage
    filter that passes ~100 rows per stratum — and (2) the exact window
    runs on the admitted survivors only. The result is IDENTICAL to the
    naive form whenever every stratum admits >= target rows (admission is
    by the same key the window orders by, so the top-{STRATUM_TARGET}
    always survive; with {OVERSAMPLE}x oversampling the shortfall
    probability is Chernoff-negligible, and any stratum smaller than the
    target is admitted whole by the least(1, ...) clamp).

    Arm ``hash_mod``: deterministic 2/16 sample by first hex digit of
    md5(doc_id) — the reproducible-sampling primitive a training-data
    pipeline needs (rerun the pipeline, get the SAME sample — unlike
    rand()-based sampling, which depends on partitioning). Pure scan-stage
    filter: no shuffle, and the sampling predicate rides along with any
    pushed filters.

    Arm ``mixture`` (r7): temperature data-mixture sampling at alpha=0.5
    over lang domains — admission rate K/sqrt(n_domain), the standard LLM
    pre-training mix that upweights rare domains relative to proportional
    sampling. See the inline comment for why the rate is unnormalized.

    Arm ``weighted`` (r13): WEIGHTED sampling without replacement —
    Efraimidis–Spirakis one-pass reservoir (Inf. Proc. Letters 97(5),
    2006): each row draws priority u^(1/w) (u = deterministic md5
    uniform, fresh 'ws:' salt; w = n_chars, the narrow length column, so
    the suite's no-text-scan plan pin holds) and the k largest
    priorities per stratum ARE a size-k sample where selection
    probability tilts ∝ weight — the quality/length-weighted corpus
    sampler an LLM data pipeline uses when longer or higher-scoring docs
    should be proportionally likelier, still rerun-stable and
    engine-independent. Scale shape (r14): the stratified arm's
    admission-threshold trick does NOT transfer (the threshold becomes
    weight-distribution-dependent: admit key > t needs t with
    Σ(1-t^{w_i}) ≈ oversample·k), and a naive
    ``row_number() OVER (PARTITION BY lang)`` over the full corpus is a
    straggler by construction — a window partition cannot be split (AQE
    skew handling splits *join* partitions only), so a handful of
    languages over 100 TB means one reducer per language. Instead the
    weight-AGNOSTIC exact fix: two-stage top-k
    (operators/topk.grouped_top_k_two_stage) — stage 1 windows over
    (lang × 64 hash-salt cells) keeping each cell's local top-k, stage 2
    re-ranks the ≤ 64·k survivors per lang. Output-identical for any
    weights (a global top-k row is top-k in its own cell), so the naive
    DuckDB window oracle still hash-matches.
    Determinism note: priorities cross engines via IEEE pow — not
    correctly rounded in either libm, but a rank flip needs TWO
    priorities within ~1 ulp, vanishing at any realistic stratum size
    (and exact-key ties break by doc_id).
    """
    docs = load_table(spark, sf_dir, "documents")
    unif = md5_hex8_long("doc_id").cast("double") / F.lit(4294967296.0)
    u = docs.select("doc_id", "lang", unif.alias("unif"))
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    admitted = u.join(F.broadcast(counts), "lang").filter(
        F.col("unif")
        < F.least(
            F.lit(1.0),
            F.lit(float(OVERSAMPLE * STRATUM_TARGET))
            / F.col("n").cast("double"),
        )
    )
    w = W.partitionBy("lang").orderBy("unif", "doc_id")
    stratified = (
        admitted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_TARGET)
        .select(
            F.lit("stratified").alias("method"), "doc_id", "lang", "rk"
        )
    )
    hash_mod = docs.filter(
        F.md5(F.col("doc_id").cast("string")).substr(1, 1).isin("0", "1")
    ).select(
        F.lit("hash_mod").alias("method"),
        "doc_id",
        "lang",
        F.lit(None).cast("int").alias("rk"),
    )
    # mixture arm: temperature sampling over lang domains at alpha = 0.5 —
    # the LLM data-mixing primitive (upweight small domains, damp huge
    # ones). Unnormalized (rate depends only on the domain's own count):
    # no cross-domain double sum exists, so every admission decision is
    # IEEE-exact sqrt + division and hash-matches the oracle. A fresh md5
    # salt ('mx:') decorrelates this arm's variate from the stratified
    # arm's. Same scale shape: broadcast counts join, scan-stage filter.
    unif_mx = md5_hex8_long("doc_id", salt="mx:").cast("double") / F.lit(
        4294967296.0
    )
    mixture = (
        docs.select("doc_id", "lang", unif_mx.alias("unif_mx"))
        .join(F.broadcast(counts), "lang")
        .filter(
            F.col("unif_mx")
            < F.least(
                F.lit(1.0),
                F.lit(MIXTURE_K) / F.sqrt(F.col("n").cast("double")),
            )
        )
        .select(
            F.lit("mixture").alias("method"),
            "doc_id",
            "lang",
            F.lit(None).cast("int").alias("rk"),
        )
    )
    # weighted arm: Efraimidis-Spirakis priorities over the narrow
    # n_chars column — see the docstring for the semantics, the
    # cross-engine pow determinism note, and why the two-stage top-k
    # (NOT a full-corpus per-lang window) is the scale shape here
    from movie_recommendation_etl_spark.operators.topk import (
        grouped_top_k_two_stage,
    )

    u_ws = md5_hex8_long("doc_id", salt="ws:").cast("double") / F.lit(
        4294967296.0
    )
    es_key = F.pow(
        u_ws, F.lit(1.0) / F.greatest("n_chars", F.lit(1)).cast("double")
    )
    weighted = (
        grouped_top_k_two_stage(
            docs.select("doc_id", "lang", es_key.alias("es_key")),
            ["lang"],
            [F.col("es_key").desc(), F.col("doc_id")],
            STRATUM_TARGET,
            salt_cols=["doc_id"],
            rank_col="rk",
        )
        .select(F.lit("weighted").alias("method"), "doc_id", "lang", "rk")
    )
    return (
        stratified.unionByName(hash_mod)
        .unionByName(mixture)
        .unionByName(weighted)
    )
