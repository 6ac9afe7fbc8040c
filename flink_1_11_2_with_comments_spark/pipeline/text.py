"""Text-analysis operators over the documents table.

All pure Column expressions: tokenization, quality scoring,
language-ID and fingerprinting run inside whole-stage codegen — at
100 TB these are a single scan with no shuffle and no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic, replayable in any SQL engine (see pipeline/__init__)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "fr": ["le", "la", "les", "des", "est", "une"],
}


def tokens(text: Column | str, sep: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def token_stats(text: Column | str) -> dict[str, Column]:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (chars/4 heuristic, the common rule of thumb) + char classes."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    return {
        "n_tokens": F.size(toks).cast("bigint"),
        "n_chars": F.length(c).cast("bigint"),
        "est_bpe_tokens": F.ceil(F.length(c) / 4).cast("bigint"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
        "avg_token_len": ((F.length(c) - F.size(toks) + 1)
                          / F.size(toks)).cast("double"),
    }


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality scoring: length / punctuation / stopword / repetition
    ratios — the standard web-scale corpus filters."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return {
        "len_chars": F.length(c).cast("bigint"),
        "punct_ratio": (n_punct / F.length(c)).cast("double"),
        "stopword_ratio": (n_stop / n_tok).cast("double"),
        "dup_token_ratio": ((n_tok - F.size(F.array_distinct(toks)))
                            / n_tok).cast("double"),
        "quality_ok": ((F.length(c) >= 50) & (n_tok >= 10)
                       & ((n_stop / n_tok) < 0.5)),
    }


def language_id(text: Column | str) -> Column:
    """Language-ID: stopword-marker scoring, argmax with deterministic
    tie-break (lexicographic), 'und' (undetermined) when all zero."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    scores = []
    for lang in sorted(STOPWORDS):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append((lang, score))
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate descending-lexicographic so earlier langs win ties with >
    for lang, score in reversed(scores):
        take = score > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return best


def fingerprint(text: Column | str, mod: int = 1_000_000_007) -> Column:
    """Document fingerprint: polynomial rolling hash over tokens.

    h = fold(h * 31 + md5_int(token) % 1000003) % mod — md5-based so
    the DuckDB oracle replays it exactly; order-sensitive (a true
    sequence fingerprint, not a bag hash).
    """
    from .dedup import md5_int_expr
    c = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        tokens(c),
        F.lit(0).cast("bigint"),
        lambda acc, tok: (acc * 31 + md5_int_expr(tok) % 1000003) % mod)


def ngrams(text: Column | str, n: int, sep: str = " ") -> Column:
    """Word n-grams WITH duplicates (order-preserving) — the unit for
    repetition analysis (Gopher-style duplicate-n-gram filters), as
    opposed to dedup.shingles which distincts for set semantics.

    Documents with fewer than n tokens yield an EMPTY list — guarded
    explicitly because F.sequence(1, 0) produces the DESCENDING
    [1, 0] (Spark infers step -1 when start > stop), which would
    index element_at out of bounds."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, sep)
    count = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(
            sep, *[F.element_at(toks, i + j) for j in range(n)]))
    return F.when(count >= 1, grams) \
        .otherwise(F.array().cast("array<string>"))


def repetition_features(text: Column | str) -> dict[str, Column]:
    """Within-document repetition: fraction of word 2-/3-grams that are
    duplicates. High values flag boilerplate/looping text — the
    duplicate-n-gram fraction rule from large-corpus quality filtering.
    Pure array expressions: single scan, zero shuffle."""
    g2, g3 = ngrams(text, 2), ngrams(text, 3)

    def dup_ratio(g: Column) -> Column:
        return F.when(F.size(g) > 0,
                      ((F.size(g) - F.size(F.array_distinct(g)))
                       / F.size(g)).cast("double")).otherwise(F.lit(0.0))

    return {
        "n_2grams": F.size(g2).cast("bigint"),
        "dup_2gram_ratio": dup_ratio(g2),
        "n_3grams": F.size(g3).cast("bigint"),
        "dup_3gram_ratio": dup_ratio(g3),
    }


def token_entropy(text: Column | str) -> Column:
    """Shannon entropy (nats) of the document's unigram distribution.

    Computed entirely map-side over the token array: for each DISTINCT
    token, count occurrences with a filter over the array, then fold
    -(p ln p) terms. O(distinct x n_tokens) per document but ZERO
    shuffle — at 100 TB this beats the explode + two-groupBy form by
    the full width of the corpus. Each term is rounded to 12 dp and
    accumulated in DECIMAL so the sum is order-independent and
    engine-exact (see queries/_util.py numeric-determinism note).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n = F.size(toks)
    # count each distinct token ONCE, then fold over the counts —
    # evaluating the filter inside both factors of -(p ln p) would
    # double the dominant O(distinct x tokens) scan
    counts = F.transform(
        F.array_distinct(toks),
        lambda t: F.size(F.filter(toks, lambda x: x == t)))
    terms = F.transform(
        counts,
        lambda cnt: F.round(-(cnt / n) * F.log(cnt / n),
                            12).cast("decimal(30,14)"))
    return F.round(
        F.aggregate(terms, F.lit(0).cast("decimal(30,14)"),
                    # decimal + widens to (31,14); re-cast to keep the
                    # accumulator type fixed (entropy ≤ ln(n) << 10^16,
                    # so the narrowing never truncates)
                    lambda acc, x: (acc + x).cast("decimal(30,14)")),
        6).cast("double")


GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def gopher_rules(text: Column | str,
                 min_words: int = 25, max_words: int = 90,
                 min_mean_wlen: float = 4.2, max_mean_wlen: float = 10.0,
                 max_top_share: float = 0.11,
                 min_stopwords: int = 2) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): word-count bounds, mean-word-length
    bounds, repetition (most-frequent-token share) cap, and
    stopword containment. Thresholds are calibrated to the test
    corpus; the production values from the paper (50..100k words,
    mean length 3..10, etc.) drop in unchanged.

    Everything is a per-row expression over ONE scan — the
    most-frequent-token share, which naively needs a groupBy per
    document, is a sorted-run fold (sort_array + aggregate) entirely
    JVM-side, so the whole filter is map-only with zero shuffles at
    any corpus size.
    """
    toks = tokens(text)
    nw = F.size(toks).cast("bigint")
    mean_wlen = F.round(
        (F.length(text) - nw + 1) / nw, 6).cast("double")
    # longest run in the sorted token array == max per-token count
    best = F.aggregate(
        F.sort_array(toks),
        F.struct(F.lit("").alias("prev"),
                 F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(acc["best"],
                       F.when(x == acc["prev"], acc["run"] + 1)
                       .otherwise(F.lit(1))).alias("best")),
        lambda acc: acc["best"])
    top_share = F.round(best / nw, 6).cast("double")
    n_stop = F.size(F.array_intersect(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        toks)).cast("bigint")
    r_wordcount = (nw >= min_words) & (nw <= max_words)
    r_meanlen = ((mean_wlen >= min_mean_wlen)
                 & (mean_wlen <= max_mean_wlen))
    r_repetition = top_share <= max_top_share
    r_stopword = n_stop >= min_stopwords
    return {
        "n_words": nw, "mean_wlen": mean_wlen,
        "top_share": top_share, "n_stop": n_stop,
        "r_wordcount": r_wordcount, "r_meanlen": r_meanlen,
        "r_repetition": r_repetition, "r_stopword": r_stopword,
        "keep": (r_wordcount & r_meanlen & r_repetition & r_stopword),
    }
