"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace + a
BPE-ish regex), and document fingerprinting (position-weighted rolling
hash). Everything is a pure Catalyst column expression — regexes,
higher-order array functions, and md5-derived hashes — so the hot path
is whole-stage-codegen JVM work with zero Python per row, and an
external SQL engine reproduces results bit-for-bit (oracle parity).

Scale notes (100 TB): all of these are embarrassingly parallel map-only
transforms — no shuffle at all; the only cost is the scan, so they
pipeline into whatever aggregation follows and scale linearly with
executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kaskada_spark.operators.dedup import words

# Tiny deterministic stopword profiles (language-ID heuristic — the
# point is the distributed plan shape, not linguistic accuracy).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "que", "los", "una", "por", "con", "para", "las", "es"],
}

# BPE-ish pre-tokenizer regex (GPT-2 style, lookahead-free so Java
# regex and RE2 agree): word pieces, number runs, punctuation runs,
# whitespace runs.
BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n]+"


def stopword_hits(text: Column, lang: str) -> Column:
    """Non-distinct count of stopword occurrences for one language."""
    vocab = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda w: F.array_contains(vocab, w)))


def detect_language(text: Column) -> Column:
    """argmax over per-language stopword hit counts; 'und' (undetermined)
    when no stopwords match at all. Deterministic tie-break by language
    order en > de > fr > es (strict > comparison keeps the earlier).

    Single-pass form: ONE fold over ONE words() array builds all four
    hit counts, then a second fold takes the argmax — words(text) (the
    expensive regexp extraction) appears exactly once in the expression
    tree, instead of once per language and hoping Catalyst subexpression
    elimination rescues the duplicates."""
    langs = list(STOPWORDS)
    vocabs = [F.array(*[F.lit(s) for s in STOPWORDS[l]]) for l in langs]
    counts = F.aggregate(
        words(text),
        F.array(*[F.lit(0)] * len(langs)),
        lambda acc, w: F.array(*[
            acc[i] + F.when(F.array_contains(vocabs[i], w), 1).otherwise(0)
            for i in range(len(langs))
        ]),
    )
    entries = F.zip_with(
        counts,
        F.array(*[F.lit(l) for l in langs]),
        lambda c, l: F.struct(c.alias("c"), l.alias("l")),
    )
    winner = F.aggregate(
        entries,
        F.struct(F.lit(0).alias("c"), F.lit("und").alias("l")),
        lambda acc, e: F.when(e["c"] > acc["c"], e).otherwise(acc),
    )
    return winner["l"]


def word_count(text: Column) -> Column:
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokenizer pieces (regex matches)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


def quality_features(text: Column, w: Column | None = None) -> dict[str, Column]:
    """Quality-scoring feature set. All ratios are double divisions of
    integer counts — bitwise reproducible in any engine.

    ``w`` (optional): a pre-projected ``words(text)`` array column.
    The words() regexp extraction is the expensive part and lambda
    bodies are NOT common-subexpression-eliminated, so callers that
    also compute ``quality_score`` should project the array once and
    pass it here (Catalyst keeps the intermediate projection: it only
    collapses projects whose producer expressions are cheap or used
    once)."""
    if w is None:
        w = words(text)
    n_chars = F.length(text).cast("double")
    wc = F.size(w)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    digits = F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 \\t\\n]", "")).cast("double")
    upper = F.length(F.regexp_replace(text, "[^A-Z]", "")).cast("double")
    vocab = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    sw = F.size(F.filter(w, lambda x: F.array_contains(vocab, x)))
    total_word_chars = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return {
        "n_chars": n_chars.cast("long"),
        "word_cnt": wc.cast("long"),
        "mean_word_len": F.when(
            wc > 0, total_word_chars.cast("double") / wc.cast("double")
        ),
        "alpha_ratio": F.when(n_chars > 0, alpha / n_chars),
        "digit_ratio": F.when(n_chars > 0, digits / n_chars),
        "punct_ratio": F.when(n_chars > 0, punct / n_chars),
        "upper_ratio": F.when(alpha > 0, upper / alpha),
        "stopword_ratio": F.when(wc > 0, sw.cast("double") / wc.cast("double")),
    }


def quality_score(
    text: Column, feats: dict[str, Column] | None = None
) -> Column:
    """Composite [0,1] quality heuristic: reward stopword presence and
    sane word lengths, penalize punctuation/digit-heavy content.

    Pass ``feats`` (a ``quality_features`` result) to reuse already-
    projected feature expressions instead of re-deriving the whole set
    — the score is then pure arithmetic over the shared columns."""
    f = feats if feats is not None else quality_features(text)
    sw = F.coalesce(f["stopword_ratio"], F.lit(0.0))
    mwl = F.coalesce(f["mean_word_len"], F.lit(0.0))
    punct = F.coalesce(f["punct_ratio"], F.lit(0.0))
    digit = F.coalesce(f["digit_ratio"], F.lit(0.0))
    len_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        F.least(sw * F.lit(2.5), F.lit(1.0)) * F.lit(0.4)
        + len_ok * F.lit(0.3)
        + F.greatest(F.lit(1.0) - punct * F.lit(4.0), F.lit(0.0)) * F.lit(0.2)
        + F.greatest(F.lit(1.0) - digit * F.lit(2.0), F.lit(0.0)) * F.lit(0.1)
    )
    return score


def _bigrams(text: Column) -> Column:
    """NON-distinct word bigrams (repetition analysis needs counts;
    dedup's shingles() dedups). Same zip_with-over-slices shape so the
    words() regexp runs a constant number of times, never per element."""
    return _bigrams_of(words(text))


def _bigrams_of(w: Column) -> Column:
    """Bigrams from an already-computed word array (staging form)."""
    n = F.greatest(F.size(w) - 1, F.lit(0))
    return F.zip_with(
        F.slice(w, 1, n), F.slice(w, 2, n), lambda a, b: F.concat_ws(" ", a, b)
    )


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    string array = max multiplicity of any element. Single O(L)
    ``aggregate`` fold carrying (prev, current-run, best) — one lambda,
    no intermediate position arrays. (The previous position-array
    formulation — zip/filter/transform over ``sequence(1, size)`` —
    allocated ~6 arrays per row and measured >10x slower at sf0.1.)"""
    st = F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(F.size(sorted_arr) > 0, st)


def repetition_signals(df, id_col: str, text_col: str):
    """Gopher-style repetition quality signals, one row per document —
    the filters a web-scale corpus applies before training (Rae et al.,
    "Scaling Language Models: ... Gopher", §A1.1 repetition filters):

    - ``dup_word_frac``   — excess word occurrences: (n - distinct)/n
    - ``top_bigram_frac`` — occurrences of the most frequent word bigram
      over total bigrams (boilerplate detector)
    - ``dup_line_frac``   — excess duplicate lines over non-empty lines
    - ``dup_line_char_frac`` — fraction of characters living in lines
      that occur 2+ times (ALL occurrences counted, per the reference
      implementations)

    Ratios are null when the denominator is 0 (ANSI mode raises on
    division by zero). Everything is a pure Catalyst column expression:
    sort the token array once, then derive multiplicities from
    adjacent-equality — O(L log L) per row, map-only, zero shuffle, so
    the operator pipelines into the scan at any corpus size. A SQL
    engine reproduces each number exactly (integer counts divided as
    doubles).

    The heavy arrays are STAGED through projections (words -> bigrams
    -> sorted lines) because every one of them is referenced several
    times below and Catalyst's subexpression elimination skips any
    expression containing a lambda — unstaged, the line array's
    split+filter+sort ran ~6x per row (measured ~2x slower at sf0.1).
    """
    text = F.col(text_col)
    # stage 1: one words() regexp + one line split/filter/sort per row
    df = df.select(
        F.col(id_col).alias("__id"),
        words(text).alias("__w"),
        F.array_sort(
            F.filter(F.split(text, "\n"), lambda l: F.length(l) > 0)
        ).alias("__ls"),
    )
    # stage 2: bigrams from the staged word array
    df = df.select(
        "__id", "__w", "__ls", F.array_sort(_bigrams_of(F.col("__w"))).alias("__bg")
    )
    w = F.col("__w")
    wc = F.size(w)
    uniq = F.size(F.array_distinct(w))
    bg = F.col("__bg")
    n_bg = F.size(bg)

    ls = F.col("__ls")
    n_lines = F.size(ls)
    uniq_lines = F.size(F.array_distinct(ls))
    nl1 = F.greatest(n_lines - 1, F.lit(0))
    # line i sits in a duplicated group iff it equals a sorted neighbor
    eq = F.zip_with(F.slice(ls, 1, nl1), F.slice(ls, 2, nl1), lambda a, b: a == b)
    mask = F.zip_with(
        F.concat(F.array(F.lit(False)), eq),
        F.concat(eq, F.array(F.lit(False))),
        lambda a, b: a | b,
    )
    dup_chars = F.aggregate(
        F.zip_with(mask, ls, lambda m, l: F.when(m, F.length(l)).otherwise(F.lit(0))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    total_chars = F.aggregate(ls, F.lit(0), lambda acc, l: acc + F.length(l))

    return df.select(
        F.col("__id").cast("long").alias("doc"),
        wc.cast("long").alias("n_words"),
        uniq.cast("long").alias("uniq_words"),
        F.when(wc > 0, (wc - uniq).cast("double") / wc.cast("double")).alias(
            "dup_word_frac"
        ),
        F.when(
            n_bg > 0, _max_run(bg).cast("double") / n_bg.cast("double")
        ).alias("top_bigram_frac"),
        n_lines.cast("long").alias("n_lines"),
        F.when(
            n_lines > 0,
            (n_lines - uniq_lines).cast("double") / n_lines.cast("double"),
        ).alias("dup_line_frac"),
        F.when(
            total_chars > 0, dup_chars.cast("double") / total_chars.cast("double")
        ).alias("dup_line_char_frac"),
    )


def _word_hash28(w: Column) -> Column:
    return F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long")


def fingerprint(text: Column) -> Column:
    """Position-weighted rolling fingerprint: sum_i (i * hash28(w_i)),
    i 1-based. Order-sensitive (anagram texts differ) yet closed-form —
    no fold needed, so both Spark (`transform(x, i)`) and a SQL oracle
    (`generate_series` + element index) produce identical int64s. Bound:
    28-bit hash x 1e6 positions x 1e6 words < 2^63, no overflow."""
    w = words(text)
    weighted = F.transform(w, lambda x, i: (i.cast("long") + 1) * _word_hash28(x))
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)


# ---------------------------------------------------------------------
# PII scrubbing (training-data hygiene; map-only Catalyst)
# ---------------------------------------------------------------------
#: Patterns are kept to the Java-regex / RE2 common subset (no
#: lookaround, no backrefs, \b and bounded quantifiers only) so a SQL
#: oracle matches byte-for-byte.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(text: Column) -> dict[str, Column]:
    """Detect-and-redact common PII shapes (emails, NANP-style phone
    numbers, IPv4 addresses). Returns count columns (over the original
    text) plus ``clean_text`` with matches replaced by typed tags.

    Redaction order matters only across overlapping classes: emails are
    replaced first so their digit runs can't be re-matched; the phone
    pattern's hyphens and the IP pattern's dots are mutually exclusive.
    Pure whole-stage-codegen regex work — zero shuffles, zero Python —
    so it runs at scan speed on the 100 TB corpus.
    """
    clean = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IP, "<IP>")
    clean = F.regexp_replace(clean, PII_PHONE, "<PHONE>")
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).cast("long"),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).cast("long"),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(PII_IP), 0)).cast("long"),
        "clean_text": clean,
    }
