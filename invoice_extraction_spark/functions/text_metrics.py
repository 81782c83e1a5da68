"""Text-analysis operators as pure Column expressions (JVM-side, codegen'd).

The training-data-pipeline extras the task calls for: language-ID (n-gram /
script heuristic), quality scoring (length/punct/stopword ratios), token
counting, document fingerprinting. Each builder returns a Column over a text
column, so these compose into any query and never leave WholeStageCodegen.

Every expression here is deliberately writable in ANSI SQL too (DuckDB
oracle parity — __spark_entry__.oracle_sql builds the mirror query).
"""

from __future__ import annotations

from typing import Iterator  # noqa: UP035 — the pandas_udf hint parser
# resolves annotations against MODULE globals; typing.Iterator here makes
# repetition_stats_fast's Iterator[pd.Series] signature recognizable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic stopword set for quality scoring / language evidence
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

_PUNCT_RE = r"[^.,;:!?]"  # everything that is NOT punctuation, for ratio


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization — split on single spaces (inputs are already
    whitespace-collapsed by the extraction contract)."""
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(tokens(c)))


# GPT-style pre-tokenizer approximation, kept RE2/Java-portable (no
# lookarounds): letter runs, SINGLE digits (GPT-4 style), or one non-space
# symbol — each match is one proto-token before BPE merges.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column | str) -> Column:
    """Task-brief 'BPE-ish regex' token counter: counts pre-tokenizer matches
    (letter runs / single digits / single symbols) — the standard quick
    estimate of LLM token cost before running a real BPE."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))


def stopword_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(tokens(F.lower(c)), lambda t: t.isin(STOPWORDS_EN)))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality score from length / punctuation / stopword
    evidence — the boilerplate-vs-content scoring idea (reference vision-
    heuristics, vision.py:126-273) lifted to corpus-quality filtering.

    score = 0.4*min(1, n_tokens/100) + 0.3*min(1, 10*stopword_ratio)
          + 0.3*(1 - min(1, 20*punct_ratio_excess)) rounded to 4.
    """
    c = F.col(text) if isinstance(text, str) else text
    ntok = token_count(c).cast("double")
    nchars = F.greatest(F.length(c).cast("double"), F.lit(1.0))
    stop_ratio = stopword_count(c).cast("double") / F.greatest(ntok, F.lit(1.0))
    punct_ratio = punct_count(c).cast("double") / nchars
    return F.round(
        0.4 * F.least(F.lit(1.0), ntok / 100.0)
        + 0.3 * F.least(F.lit(1.0), 10.0 * stop_ratio)
        + 0.3 * (1.0 - F.least(F.lit(1.0), 20.0 * punct_ratio)),
        4,
    )


def lang_guess(text: Column | str) -> Column:
    """Script/n-gram heuristic language ID (reference EDA ``detect_language``:
    Devanagari presence -> Hindi/Mixed; here extended with CJK/Cyrillic and an
    English-stopword majority rule)."""
    c = F.col(text) if isinstance(text, str) else text
    en_evidence = stopword_count(c)
    return (
        F.when(c.rlike("[\\u0900-\\u097F]"), F.lit("hi"))
        .when(c.rlike("[\\u4E00-\\u9FFF]"), F.lit("zh"))
        .when(c.rlike("[\\u0400-\\u04FF]"), F.lit("ru"))
        .when(en_evidence >= 3, F.lit("en"))
        .otherwise(F.lit("und"))
    )


def dup_token_fraction(text: Column | str) -> Column:
    """Fraction of tokens that are repeats of an earlier token — the
    Gopher-style 'duplicate content within a document' repetition signal
    (Rae et al. 2021 §A1.1 use duplicate line/paragraph fractions; this
    corpus is single-line word text, so the token is the repetition unit).
    Rounded to 4 for oracle parity."""
    t = tokens(text)
    n = F.greatest(F.size(t), F.lit(1)).cast("double")
    return F.round(F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n, 4)


def _bigrams(t: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.try_element_at(t, i), F.try_element_at(t, i + 1)),
    )


def max_bigram_count(text: Column | str) -> Column:
    """Multiplicity of the document's most frequent word bigram. Computed as
    the longest run in the SORTED bigram array (one linear fold — no O(n^2)
    pairwise compare; stays a Column expression, no Python). NULL text ->
    NULL (SQL convention; without the guard the bigram fallback slot made
    this 1 on NULL while dup_token_fraction was NULL — inconsistent, and it
    diverged from the Arrow kernel, which nulls the whole stats row)."""
    c = F.col(text) if isinstance(text, str) else text
    b = F.array_sort(_bigrams(tokens(text)))
    run = F.aggregate(
        F.sequence(F.lit(2), F.greatest(F.size(b), F.lit(2))),
        F.struct(F.lit(1).alias("cur"), F.lit(1).alias("best")),
        lambda acc, i: F.when(
            F.try_element_at(b, i).isNotNull()
            & (F.try_element_at(b, i) == F.try_element_at(b, i - 1)),
            F.struct(
                (acc["cur"] + 1).alias("cur"),
                F.greatest(acc["best"], acc["cur"] + 1).alias("best"),
            ),
        ).otherwise(F.struct(F.lit(1).alias("cur"), acc["best"].alias("best"))),
    )
    return F.when(c.isNotNull(), run["best"])


def top_bigram_fraction(text: Column | str) -> Column:
    """Fraction of bigram slots taken by the single most frequent bigram —
    the Gopher 'top n-gram character fraction' adapted to token counts
    (§A1.1 drops docs whose top 2-gram exceeds 0.20 of characters)."""
    t = tokens(text)
    nb = F.greatest(F.size(t) - 1, F.lit(1)).cast("double")
    return F.round(max_bigram_count(text).cast("double") / nb, 4)


def repetition_keep(text: Column | str, max_dup_tokens: float = 0.6, max_top_bigram: float = 0.08) -> Column:
    """Gopher-style repetition gate. Thresholds sit at ~p60/p92 of this
    corpus's measured distributions (dup-token p50=0.54 max=0.72; top-bigram
    p90=0.069 max=0.167) so the gate genuinely splits the data; the RULE —
    drop documents dominated by repeated units — is the published one
    (Rae et al. 2021 §A1.1). A bigram seen once is never 'repetition' —
    without the multiplicity guard, any short document fails the fraction
    test purely by having few bigram slots."""
    return (dup_token_fraction(text) <= max_dup_tokens) & (
        (max_bigram_count(text) < 2) | (top_bigram_fraction(text) <= max_top_bigram)
    )


def repetition_stats_fast(text: Column | str) -> Column:
    """Arrow fast path for the Gopher repetition signals: ONE pandas batch
    pass returning ``struct(dup_token_frac, top_bigram_frac, max_bigram_n)``.

    The Column forms above are the oracle-parity reference, but
    ``max_bigram_count``'s sorted-run fold is an INTERPRETED HOF evaluated
    per element (and ``repetition_keep`` evaluates it twice) — measured
    ~40 ms/doc, which turned a 50k-doc corpus-wide gate into a 30+ minute
    single-stage crawl at the sf1 rehearsal. Same trap as the HOF MinHash
    (45x, round 1) — per-element loops belong in Arrow kernels. This
    kernel is equality-asserted against the Column forms (including the
    half-up 4-dp rounding) in test_repetition."""
    import math
    from collections import Counter

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("dup_token_frac", DoubleType()),
            StructField("top_bigram_frac", DoubleType()),
            StructField("max_bigram_n", IntegerType()),
        ]
    )

    def _r4(x: float) -> float:  # Spark ROUND = HALF_UP (non-negative here)
        return math.floor(x * 10000 + 0.5) / 10000

    def _one(s):
        if not isinstance(s, str):
            return None, None, None
        toks = s.split(" ")  # == F.split(text, " ") incl. empty tokens
        n = len(toks)
        dup = _r4(1.0 - len(set(toks)) / max(n, 1))
        # bigram list mirrors _bigrams: i in 1..max(n-1, 1), concat_ws
        # skips the null second element of the final/short slot
        if n >= 2:
            bigrams = [f"{toks[i]} {toks[i + 1]}" for i in range(n - 1)]
        else:
            bigrams = toks[:1] or [""]
        best = max(Counter(bigrams).values())
        top = _r4(best / max(n - 1, 1))
        return dup, top, best

    @pandas_udf(schema)
    def _stats(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in batches:
            yield pd.DataFrame(
                [_one(s) for s in texts],
                columns=["dup_token_frac", "top_bigram_frac", "max_bigram_n"],
            )

    return _stats(F.col(text) if isinstance(text, str) else text)


def repetition_keep_fast(
    stats: Column, max_dup_tokens: float = 0.6, max_top_bigram: float = 0.08
) -> Column:
    """The ``repetition_keep`` decision read from a ``repetition_stats_fast``
    struct — same thresholds, one kernel pass instead of two HOF folds."""
    return (stats["dup_token_frac"] <= max_dup_tokens) & (
        (stats["max_bigram_n"] < 2) | (stats["top_bigram_frac"] <= max_top_bigram)
    )


def blocklist_hit(text: Column | str, terms: list[str]) -> Column:
    """True when any blocklisted token appears (C4's badwords filter shape:
    exact token membership against a small list, evaluated as a literal
    in-expression set — no join, no shuffle, stays in codegen). Case-
    insensitive. For 100k+ term lists switch to a broadcast semi-join on
    exploded tokens instead of a literal."""
    c = _c_(text)
    lowered = [t.lower() for t in terms]
    return F.exists(tokens(F.lower(c)), lambda t: t.isin(lowered))


def _c_(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def fingerprint(text: Column | str, prefix_len: int = 64) -> Column:
    """Cheap stable document fingerprint: md5 over (length, head, tail) —
    the rolling-hash idea collapsed to a portable expression."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(
        F.concat_ws(
            "|",
            F.length(c).cast("string"),
            F.substring(c, 1, prefix_len),
            F.substring(F.reverse(c), 1, prefix_len),
        )
    )
