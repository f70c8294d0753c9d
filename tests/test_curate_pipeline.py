"""curate_documents composition: each stage's effect is visible on planted
rows, the pipeline is deterministic, and stages compose in the documented
order (filters -> redact -> dedup -> sample)."""

from __future__ import annotations

from pyspark.sql import types as T

from movie_recommendation_etl_spark.operators.curate import curate_documents

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

GOOD = (
    "the researchers published their findings in the journal and the "
    "results were confirmed by several independent laboratories around "
    "the world with remarkable consistency"
)
PII = (
    "the committee announced that the contact address is Alice.Smith+tag@Example.ORG "
    "and the support line is 415-555-0123 for all further questions about "
    "the published schedule"
)
NON_EN = (
    "zvonimir krakatoa umbrage flotsam quixotic zephyr brouhaha "
    "kerfuffle snollygoster widdershins cattywampus absquatulate"
)
REPETITIVE = "buy now " * 40


def _rows():
    return [
        (1, GOOD),
        (2, PII),
        (3, NON_EN),
        (4, REPETITIVE.strip()),
        (5, GOOD),  # exact dup of 1 (different id) -> dedup survivor is id 1
    ]


def test_curate_stages(spark):
    docs = spark.createDataFrame(_rows(), SCHEMA)
    out = curate_documents(docs, min_quality=0.25).collect()
    by_id = {r["doc_id"]: r for r in out}

    # non-English and repetitive docs are gone; dup of GOOD collapsed to id 1
    assert set(by_id) == {1, 2}
    # PII is masked in place
    assert "[EMAIL]" in by_id[2]["text"]
    assert "[PHONE]" in by_id[2]["text"]
    # mixed-case address with +tag must be caught (real-text pattern, not
    # the lowercase-only q56 oracle pattern)
    assert "Example.ORG" not in by_id[2]["text"]
    assert "415-555-0123" not in by_id[2]["text"]
    # metadata columns survive for routing
    assert by_id[1]["lang"] == "en"
    assert by_id[1]["quality"] >= 0.25
    assert by_id[1]["n_tokens"] > 10


def test_curate_deterministic_and_sampling(spark):
    docs = spark.createDataFrame(_rows(), SCHEMA)
    a = sorted(map(tuple, curate_documents(docs, min_quality=0.25).collect()))
    b = sorted(
        map(
            tuple,
            curate_documents(
                docs.repartition(7), min_quality=0.25
            ).collect(),
        )
    )
    assert a == b  # partitioning-independent (deterministic survivor)

    full = curate_documents(docs, min_quality=0.25, dedup=False)
    half = curate_documents(
        docs, min_quality=0.25, dedup=False, sample_fraction=0.5
    )
    # the sample is a subset of the unsampled result, decided by id hash
    assert set(r["doc_id"] for r in half.collect()) <= set(
        r["doc_id"] for r in full.collect()
    )


def test_curate_runs_on_documents_table(spark, sf_dir):
    from movie_recommendation_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    # synthetic word-salad corpus: language gate off, quality gate loose
    out = curate_documents(docs, langs=None, min_quality=0.0)
    assert out.count() > 0
    assert {"lang", "quality", "n_tokens"} <= set(out.columns)


def test_ngram_contamination_semantics(spark):
    from movie_recommendation_etl_spark.operators.decontaminate import (
        ngram_contamination,
    )

    ev = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (10, "a b c d e f g h"),       # full overlap: 4 of 4 grams
            (11, "x y a b c d e z w q"),   # one shared gram (a b c d e)
            (12, "p q r s t u v w"),       # disjoint: 0 of 4
            (13, "too short"),             # no 5-gram at all
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in ngram_contamination(
            train, ev, n=5, ratio_threshold=0.5
        ).collect()
    }
    assert len(rows) == 4
    assert rows[10]["n_grams"] == 4 and rows[10]["n_overlap"] == 4
    assert rows[10]["is_contaminated"]
    assert rows[11]["n_grams"] == 6 and rows[11]["n_overlap"] == 1
    assert not rows[11]["is_contaminated"]
    assert rows[12]["n_overlap"] == 0 and not rows[12]["is_contaminated"]
    assert rows[13]["n_grams"] == 0
    assert rows[13]["overlap_ratio"] == 0.0
    assert not rows[13]["is_contaminated"]


def test_curate_with_model_quality_gate(spark):
    """extra_filter composes a fitted classifier's Catalyst score into the
    curation scan: planted spam that passes the heuristics is dropped by
    the model gate, and the plan stays Python-free."""
    from movie_recommendation_etl_spark.operators.curate import (
        curate_documents,
    )
    from movie_recommendation_etl_spark.operators.quality_model import (
        fit_quality_classifier,
        scoring_expr,
    )

    def good(i):
        return " ".join(
            f"the goodword{i}x{j} of nicetoken{i}y{j}" for j in range(40)
        )

    # borderline spam: enough unique tokens and stopwords to slip past the
    # heuristic dup/lang filters, but short-token-heavy
    def spam(i):
        return " ".join(f"zz the q{i}a{j} w" for j in range(40))

    labeled = spark.createDataFrame(
        [(i, good(i), 1.0) for i in range(25)]
        + [(100 + i, spam(i), 0.0) for i in range(25)],
        "doc_id long, text string, label double",
    )
    model = fit_quality_classifier(labeled)

    corpus = labeled.drop("label")
    gated = curate_documents(
        corpus,
        langs=None,
        min_quality=0.0,
        max_dup_token_frac=1.0,
        max_dup_2gram_frac=1.0,
        redact_pii=False,
        dedup=False,
        extra_filter=scoring_expr(model) >= 0.5,
    )
    kept = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert kept == set(range(25))
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_decontamination_shuffled_join_matches_broadcast(spark):
    """ngram_contamination's degrade-to-shuffle path (broadcast_eval=False,
    for eval sets too large to broadcast) must produce identical verdicts —
    the docstring's 'same plan, different physical strategy' claim,
    asserted."""
    from movie_recommendation_etl_spark.operators.decontaminate import (
        ngram_contamination,
    )

    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta epsilon zeta eta theta"),
            (2, "nothing shared here with the benchmark text at all ok"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    rows = lambda bc: {  # noqa: E731
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["is_contaminated"])
        for r in ngram_contamination(
            train, ev, n=5, ratio_threshold=0.3, broadcast_eval=bc
        ).collect()
    }
    assert rows(True) == rows(False)


def test_bloom_decontamination_matches_exact_on_corpus(spark, sf_dir):
    """The Bloom tier's contract: IDENTICAL output to the broadcast-exact
    operator on the real documents table (which carries planted q76
    contamination), because the bitmap has no false negatives and the
    confirm join scrubs the false positives."""
    from movie_recommendation_etl_spark.operators.decontaminate import (
        ngram_contamination,
        ngram_contamination_bloom,
    )
    from movie_recommendation_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.filter("doc_id % 17 = 0").select("text")

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    exact = key(ngram_contamination(docs, ev, n=5, ratio_threshold=0.05))
    bloom = key(
        ngram_contamination_bloom(docs, ev, n=5, ratio_threshold=0.05)
    )
    assert bloom == exact and len(exact) == docs.count()


def test_bloom_decontamination_survives_saturated_bitmap(spark):
    """Deliberately undersized bitmap (256 bits for ~hundreds of grams →
    false positives everywhere): the confirm join must still scrub every
    one of them — correctness may never depend on the FP rate."""
    from movie_recommendation_etl_spark.operators.decontaminate import (
        ngram_contamination,
        ngram_contamination_bloom,
    )

    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta epsilon zeta eta theta"),
            (2, " ".join(f"tok{i} word{i}" for i in range(60))),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    exact = key(ngram_contamination(train, ev, n=5, ratio_threshold=0.3))
    tiny = key(
        ngram_contamination_bloom(
            train, ev, n=5, ratio_threshold=0.3, num_bits=256
        )
    )
    assert tiny == exact


def test_bloom_probe_fp_rate_and_python_free_plan(spark):
    """Probe quality + plan shape: (a) every eval gram passes its own
    bloom (zero false negatives, the structural guarantee the equality
    tests lean on); (b) on a DISJOINT vocabulary the candidate fraction
    stays near the design FP rate (sized ~1%, asserted < 5%); (c) the
    candidate-scan stage carries no Python."""
    from movie_recommendation_etl_spark.operators.decontaminate import (
        bloom_might_contain,
        build_gram_bloom,
    )
    from movie_recommendation_etl_spark.operators.neardup import (
        word_shingles,
    )
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(i, " ".join(f"ev{i}w{j}" for j in range(30))) for i in range(20)],
        "doc_id long, text string",
    )
    other = spark.createDataFrame(
        [(i, " ".join(f"tr{i}w{j}" for j in range(30))) for i in range(40)],
        "doc_id long, text string",
    )
    num_bits, k = 1 << 13, 5
    bitmap = build_gram_bloom(ev, n=5, num_bits=num_bits, num_hashes=k)
    bm_df = spark.createDataFrame([(bitmap,)], "bm: array<long>")

    def probe_frac(src):
        grams = src.select(
            F.explode(
                word_shingles(F.split("text", " "), 5)
            ).alias("gram")
        ).crossJoin(F.broadcast(bm_df))
        flagged = grams.select(
            bloom_might_contain(
                F.col("gram"), F.col("bm"), num_bits=num_bits, num_hashes=k
            )
            .cast("int")
            .alias("hit")
        )
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
        row = flagged.agg(
            F.sum("hit").alias("h"), F.count("*").alias("n")
        ).first()
        return row["h"] / row["n"]

    assert probe_frac(ev) == 1.0  # no false negatives, ever
    assert probe_frac(other) < 0.05  # FP trickle near the ~1% design point


def test_bloom_no_false_negatives_on_random_strings(spark):
    """Structural guarantee under fuzzing: 300 random-junk eval docs
    (unicode, punctuation, long tokens) — every one of their grams must
    pass the bloom built from them. One batched Spark job, not one per
    example."""
    import random
    import string

    from pyspark.sql import functions as F

    from movie_recommendation_etl_spark.operators.decontaminate import (
        bloom_might_contain,
        build_gram_bloom,
    )
    from movie_recommendation_etl_spark.operators.neardup import (
        word_shingles,
    )

    rng = random.Random(13)
    alphabet = string.ascii_letters + string.digits + "äöüßé€#@!?.,;:'-_/"

    def junk_word():
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 14))
        )

    docs = [
        (i, " ".join(junk_word() for _ in range(rng.randint(5, 30))))
        for i in range(300)
    ]
    ev = spark.createDataFrame(docs, "doc_id long, text string")
    num_bits, k = 1 << 16, 5
    bitmap = build_gram_bloom(ev, n=3, num_bits=num_bits, num_hashes=k)
    bm_df = spark.createDataFrame([(bitmap,)], "bm: array<long>")
    missed = (
        ev.select(
            F.explode(word_shingles(F.split("text", " "), 3)).alias("gram")
        )
        .crossJoin(F.broadcast(bm_df))
        .filter(
            ~bloom_might_contain(
                F.col("gram"), F.col("bm"), num_bits=num_bits, num_hashes=k
            )
        )
        .count()
    )
    assert missed == 0


def test_bloom_probe_null_propagates(spark):
    """A NULL gram must probe NULL, not a definite boolean: xxhash64
    SKIPS null inputs (hashing just the seed), so an unguarded probe
    would give every NULL gram the same arbitrary answer. The operator's
    consumer (``when(probe, gram)`` under ``collect_list``) then drops
    NULLs as not-candidates."""
    from pyspark.sql import functions as F

    from movie_recommendation_etl_spark.operators.decontaminate import (
        bloom_might_contain,
        build_gram_bloom,
    )

    ev = spark.createDataFrame(
        [(0, "a b c d e f g")], "doc_id long, text string"
    )
    num_bits, k = 1 << 10, 3
    bitmap = build_gram_bloom(ev, n=3, num_bits=num_bits, num_hashes=k)
    bm_df = spark.createDataFrame([(bitmap,)], "bm: array<long>")
    probe = bloom_might_contain(
        F.col("gram"), F.col("bm"), num_bits=num_bits, num_hashes=k
    )
    rows = (
        spark.createDataFrame(
            [("a b c",), (None,)], "gram string"
        )
        .crossJoin(F.broadcast(bm_df))
        .select(probe.alias("hit"), F.col("gram"))
        .collect()
    )
    by_gram = {r["gram"]: r["hit"] for r in rows}
    assert by_gram["a b c"] is True
    assert by_gram[None] is None
