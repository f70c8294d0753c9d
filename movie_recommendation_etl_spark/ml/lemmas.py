"""Lemma dictionaries at AntBNC scale from public English morphology.

The reference lemmatizes with Spark-NLP's pretrained AntBNC dictionary
(~100k inflected→lemma entries; transform/execute.py:198-202). That
artifact is a packaged download, not vendorable here — so this module
closes M4 (SURVEY §2.10) with the two public ingredients a dictionary
lemmatizer actually needs:

1. **Regular English inflectional morphology** (standard orthographic
   rules — sibilant ``-es``, ``y→ies/ied``, ``e``-drop before ``-ing``,
   final-consonant doubling, CVC heuristics): ``expand_inflections``
   generates inflected→lemma pairs *forward* from any base lexicon, and
   the reverse rules generate candidate lemmas for an observed token.
2. **Corpus-driven induction** (``induce_lemma_map``): over any corpus,
   pair each vocabulary token with its highest-priority rule-derived
   candidate *that itself occurs in the corpus vocabulary*. The
   vocabulary-membership filter is what makes heuristic rules safe:
   "walking"→"walk" only materializes when "walk" is attested, and junk
   strips ("gas"→"ga") never are. Irregular forms come from the shipped
   irregular fixture (ml/lemmas_en_small.json), exactly the split a
   published lemma list encodes.

Scale shape: induction is two vocabulary-sized aggregations and one
equi-join on token strings — O(|vocab|), never O(corpus tokens) past the
first tokenize+count, and every step is built-in Catalyst (the candidate
generator is one SQL expression, no Python). The final dict collects to
the driver bounded by ``max_entries`` — the same driver-resident bound the
reference accepts by broadcasting AntBNC into its transform closures
(SURVEY §4 broadcast row); past ~1M entries prefer a map-side join against
a lemma table over a broadcast dict.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# Final CVC (consonant-vowel-consonant, last consonant not w/x/y): the
# standard orthographic trigger for consonant doubling ("stop"→"stopped")
# and, reversed, for preferring the e-restored base ("hoping"→"hope", since
# a bare "hop" would have doubled to "hopping").
_CVC = r"[^aeiou][aeiou][^aeiouwxy]"


def expand_inflections(lemmas: Iterable[str]) -> dict[str, str]:
    """Forward regular morphology: {inflected: lemma} for the 3rd-person
    singular / plural ``-s``, past ``-ed`` and gerund ``-ing`` families of
    every base word, with standard orthography (sibilant ``-es``,
    ``y→ies/ied``, ``e``-drop, monosyllabic CVC doubling). Irregular forms
    are a *dictionary's* job, not a rule's — union the result with the
    irregular fixture. ~4 entries per base word, so a 15k-word lexicon
    yields an AntBNC-order dictionary."""
    out: dict[str, str] = {}
    for w in lemmas:
        if len(w) < 2 or not w.isalpha() or not w.islower():
            continue
        forms: set[str] = set()
        if re.search(r"(s|x|z|ch|sh)$", w):
            forms.add(w + "es")
        elif re.search(r"[^aeiou]y$", w):
            forms.add(w[:-1] + "ies")
        else:
            forms.add(w + "s")
        double = re.search(_CVC + "$", w) is not None and len(w) <= 4
        if w.endswith("e"):
            forms.add(w + "d")
        elif re.search(r"[^aeiou]y$", w):
            forms.add(w[:-1] + "ied")
        elif double:
            forms.add(w + w[-1] + "ed")
        else:
            forms.add(w + "ed")
        if w.endswith("ie"):
            forms.add(w[:-2] + "ying")
        elif w.endswith("e") and not w.endswith("ee"):
            forms.add(w[:-1] + "ing")
        elif double:
            forms.add(w + w[-1] + "ing")
        else:
            forms.add(w + "ing")
        for f in forms:
            if f != w:
                out.setdefault(f, w)
    return out


def candidate_lemmas_sql(tok: str = "tok") -> str:
    """SQL expression: array of candidate lemmas for column ``tok``, best
    candidate first, NULL slots for rules that do not apply (callers strip
    them). Reverse of :func:`expand_inflections`, with the CVC heuristic
    ordering the ``-ed``/``-ing`` ambiguity (e-restored base first exactly
    when a bare base would have doubled: "hoping"→hope before hop, but
    "walking"→walk before walke). One Catalyst expression — assembled as a
    SQL string like operators/neardup.py:srp_bands, and for the same
    reason: it runs per *vocabulary entry*, so plan-time assembly beats
    Py4J-built trees."""
    t = f"`{tok}`"
    L = f"length({t})"

    def strip(k: int, add: str = "") -> str:
        s = f"substring({t}, 1, {L} - {k})"
        return f"concat({s}, '{add}')" if add else s

    def when(cond: str, val: str) -> str:
        return f"(CASE WHEN {cond} THEN {val} END)"

    ed_cvc = f"{t} RLIKE '{_CVC}ed$'"
    ing_cvc = f"{t} RLIKE '{_CVC}ing$'"
    cands = [
        # -s family (most specific first)
        when(f"{t} RLIKE '..ies$'", strip(3, "y")),
        when(f"{t} RLIKE '(ch|sh|s|x|z)es$'", strip(2)),
        when(f"{t} RLIKE '[^siu]s$'", strip(1)),
        # -ed family: doubled-consonant undouble, then the CVC-ordered
        # e-restored / bare-strip pair
        when(
            f"{t} RLIKE '..ed$' AND substring({t}, {L} - 2, 1) = "
            f"substring({t}, {L} - 3, 1) AND "
            f"substring({t}, {L} - 2, 1) NOT RLIKE '[aeiou]'",
            strip(3),
        ),
        when(f"{t} RLIKE '..ied$'", strip(3, "y")),
        when(f"{t} RLIKE '..ed$' AND {ed_cvc}", strip(1)),
        when(f"{t} RLIKE '..ed$'", strip(2)),
        when(f"{t} RLIKE '..ed$' AND NOT {ed_cvc}", strip(1)),
        # -ing family, same shape
        when(f"{t} RLIKE '..ying$'", strip(4, "ie")),
        when(
            f"{t} RLIKE '..ing$' AND substring({t}, {L} - 3, 1) = "
            f"substring({t}, {L} - 4, 1) AND "
            f"substring({t}, {L} - 3, 1) NOT RLIKE '[aeiou]'",
            strip(4),
        ),
        when(f"{t} RLIKE '..ing$' AND {ing_cvc}", strip(3, "e")),
        when(f"{t} RLIKE '..ing$'", strip(3)),
        when(f"{t} RLIKE '..ing$' AND NOT {ing_cvc}", strip(3, "e")),
    ]
    return "array(" + ", ".join(cands) + ")"


def induce_lemma_map(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 1,
    max_entries: int = 500_000,
) -> dict[str, str]:
    """Corpus-driven lemma induction: {inflected: lemma} for every
    vocabulary token whose best rule-derived candidate is itself an
    attested vocabulary word (count >= ``min_count``). Tokenization
    matches the TF-IDF pipeline's RegexTokenizer (lowercase, split on
    \\W+), so induced keys align with the tokens the lemma stage will see.

    Distributed end-to-end: tokenize→count (one shuffle on token),
    candidate explode (vocab-sized), one equi-join back onto the
    vocabulary, a per-token min-priority window — then one bounded driver
    collect (``max_entries``) for the broadcast dictionary."""
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\W+")).alias("tok")
        )
        .filter(F.col("tok").rlike("^[a-z]{2,}$"))
        .groupBy("tok")
        .count()
    )
    cands = (
        toks.select(
            "tok",
            F.posexplode(F.expr(candidate_lemmas_sql("tok"))).alias(
                "pri", "cand"
            ),
        )
        .filter(F.col("cand").isNotNull() & (F.length("cand") >= 2))
        .filter(F.col("cand") != F.col("tok"))
    )
    attested = toks.filter(F.col("count") >= min_count).select(
        F.col("tok").alias("cand")
    )
    best = (
        cands.join(attested, "cand")
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("tok").orderBy("pri", "cand")),
        )
        .filter(F.col("rn") == 1)
        .select("tok", "cand")
        .limit(max_entries)
    )
    return {r["tok"]: r["cand"] for r in best.collect()}
