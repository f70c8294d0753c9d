"""End-to-end pipeline test on the reference-shaped movies_raw fixture
(FIXTURES.md §B): cleaning semantics, feature HOFs, sink schemas, and the
franchise-retrieval golden check (the reference's only correctness checks,
notebook cells 74-86)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.pipeline import (
    MOVIES_RAW_SCHEMA,
    build_features,
    clean,
    combine_features,
    get_recommendations,
    load_movies_csv,
    save_outputs,
)
from movie_recommendation_etl_spark.sources.writers import write_csv


def _franchise_row(mid, title, words, year=2001):
    kw = "[" + ",".join(f'"{w}"' for w in words) + "]"
    return (
        mid,
        title,
        10_000_000 + mid,
        5_000_000,
        f"a story about {' '.join(words)}, and more",
        f"/poster/{mid}.jpg",
        "Big Studio",
        float(year),
        "Some Director",
        "Tom Hanks",
        "Star Two",
        "Star Three",
        '["Drama"]',
        kw,
    )


WIZARD = ["wizard", "school", "magic", "wand", "spell", "potion"]
HERO = ["superhero", "team", "battle", "villain", "powers", "city"]


@pytest.fixture(scope="module")
def movies_fixture(spark, tmp_path_factory):
    rows = []
    # franchise clusters (5 each) for the retrieval golden
    for i in range(5):
        rows.append(_franchise_row(100 + i, f"Wizard School {i}", WIZARD))
        rows.append(_franchise_row(200 + i, f"Hero Team {i}", HERO))
    # filler movies with distinct vocabularies
    fillers = [
        ["space", "voyage", "alien", "ship"],
        ["ocean", "storm", "sailor", "island"],
        ["desert", "gold", "bandit", "horse"],
        ["castle", "king", "crown", "war"],
        ["robot", "future", "machine", "lab"],
    ]
    for i, words in enumerate(fillers):
        rows.append(_franchise_row(300 + i, f"Filler {i}", words))
    # pathological rows (FIXTURES.md §B "required pathological rows")
    rows.append(_franchise_row(100, "Wizard School 0 DUPLICATE", WIZARD))  # dup id
    null_title = list(_franchise_row(400, None, ["whatever", "words"]))
    rows.append(tuple(null_title))  # na.drop victim
    sentinel = list(_franchise_row(401, "Sentinel Movie", ["x"]))
    sentinel[13] = "[]"  # the '[]' sentinel string
    rows.append(tuple(sentinel))
    malformed = list(_franchise_row(402, "Malformed JSON", ["y"]))
    malformed[13] = "not [ valid json"
    rows.append(tuple(malformed))
    multiline = list(
        _franchise_row(403, 'Quoted "Movie"', ["quoted", "line", "words"])
    )
    multiline[4] = "line one\nline two, with comma"
    rows.append(tuple(multiline))

    df = spark.createDataFrame(rows, MOVIES_RAW_SCHEMA)
    path = str(tmp_path_factory.mktemp("movies") / "movies_csv")
    write_csv(df, path)
    return path


def test_clean_semantics(spark, movies_fixture):
    raw = load_movies_csv(spark, movies_fixture)
    cleaned = clean(raw)
    ids = [r["id"] for r in cleaned.select("id").collect()]
    assert len(ids) == len(set(ids))  # dedup on id
    assert 400 not in ids  # null title dropped
    assert 401 not in ids  # '[]' sentinel dropped
    assert 402 not in ids  # malformed JSON -> null -> dropped
    assert 403 in ids  # multiline quoted row survives the CSV round-trip
    survivor = cleaned.filter(F.col("id") == 100).collect()
    assert len(survivor) == 1
    # deterministic survivor: lowest title alphabetically
    assert survivor[0]["title"] == "Wizard School 0"
    assert dict(cleaned.dtypes)["release_year"] == "int"
    assert dict(cleaned.dtypes)["genres_list"] == "array<string>"


def test_feature_combination_hof(spark, movies_fixture):
    feats = combine_features(clean(load_movies_csv(spark, movies_fixture)))
    row = feats.filter(F.col("id") == 101).collect()[0]
    # whitespace-strip HOF: "Tom Hanks" became one token (reference
    # transform/execute.py:144-156)
    assert "TomHanks" in row["tags"]
    assert "Tom Hanks" not in row["tags"]
    assert "wizard" in row["combined"]
    assert isinstance(row["combined"], str)


def test_end_to_end_recommend_and_sinks(spark, movies_fixture, tmp_path):
    feats = combine_features(clean(load_movies_csv(spark, movies_fixture)))
    vecs, model = build_features(feats, min_df=3)
    out_dir = str(tmp_path / "out")
    save_outputs(vecs, model, out_dir)

    meta = spark.read.parquet(f"{out_dir}/movie_metadata")
    assert set(meta.columns) == {"id", "title", "poster_path", "release_year"}
    master = spark.read.parquet(f"{out_dir}/master_table")
    assert set(master.columns) == {
        "id", "title", "poster_path", "revenue", "budget",
        "release_year", "genres_list",
    }
    vec_sink = spark.read.parquet(f"{out_dir}/vector")
    assert set(vec_sink.columns) == {"id", "norm_features"}
    assert meta.count() == vecs.count()

    # franchise retrieval golden (reference cells 74-86): a wizard movie's
    # neighbors must be dominated by wizard siblings
    recs = get_recommendations(vecs, model, 100, top_k=4)
    assert 100 not in recs
    wizard_ids = {101, 102, 103, 104}
    assert len(set(recs) & wizard_ids) >= 3
    # unknown id -> empty list (reference :1649-1651)
    assert get_recommendations(vecs, model, 999999) == []
