"""Distributed BPE (byte-pair-encoding) vocabulary learning.

The tokenizer-training step of an LLM data pipeline: count corpus
word frequencies once, then iteratively (a) count adjacent symbol
pairs weighted by word frequency, (b) pick the most frequent pair,
(c) merge that pair everywhere it occurs. Sennrich et al. 2016
("Neural Machine Translation of Rare Words with Subword Units") is
the published algorithm; this is its Spark formulation.

Scale design: the corpus is touched EXACTLY ONCE (the word-frequency
aggregate — one map-side-combinable shuffle over words). Every merge
iteration then runs over the DISTINCT-WORD vocabulary, which is
orders of magnitude smaller than a 100 TB corpus (vocabulary grows
~log-like with corpus size). The per-iteration winner is selected
with orderBy+limit(1) and applied via a broadcast 1-row cross join —
no driver-side collect — and the greedy left-to-right merge is a
higher-order `aggregate` fold over each word's symbol array, fully
JVM-side. Each superstep is pinned with localCheckpoint (the same
iteration discipline as operators/graph.py) so the plan does not
grow exponentially across rounds.

Reference parity: Flink would express this as a DataSet bulk
iteration (flink-java/.../DataSet.java iterate(), reference
flink-examples' iterative wordcount family); the per-round
pair-count/merge semantics here are pinned against a pure-Python
reference implementation in tests/test_pipeline.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Greedy non-overlapping left-to-right merge of the (ml, mr) symbol
# pair inside one word's symbol array: fold carrying (out, prev).
# When prev==ml and the next symbol==mr the merged token is emitted
# and prev cleared (so "aaa" with pair (a,a) becomes ["aa","a"], the
# standard BPE greedy scan); otherwise prev is flushed and the next
# symbol becomes prev.
_MERGE_FOLD = """
aggregate(
  syms,
  struct(CAST(array() AS array<string>) AS out, CAST(NULL AS string) AS prev),
  (acc, x) -> CASE
      WHEN acc.prev IS NOT NULL AND acc.prev = ml AND x = mr
        THEN struct(concat(acc.out, array(concat(ml, mr))) AS out,
                    CAST(NULL AS string) AS prev)
      ELSE struct(CASE WHEN acc.prev IS NULL THEN acc.out
                       ELSE concat(acc.out, array(acc.prev)) END AS out,
                  x AS prev) END,
  acc -> CASE WHEN acc.prev IS NULL THEN acc.out
              ELSE concat(acc.out, array(acc.prev)) END)
"""

_ADJ_PAIRS = """
CASE WHEN size(syms) > 1
     THEN transform(sequence(0, size(syms) - 2),
                    i -> struct(syms[i] AS l, syms[i + 1] AS r))
     ELSE CAST(array() AS array<struct<l: string, r: string>>) END
"""


def word_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, wf): the single corpus-sized aggregate of BPE training."""
    return (docs.select(F.explode(F.split(text_col, " ")).alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word")
            .agg(F.count("*").cast("bigint").alias("wf")))


def _learn_tops(docs: DataFrame, text_col: str,
                n_merges: int) -> list[DataFrame]:
    """The shared merge-learning loop: returns one 1-row DataFrame
    (rank, ml, mr, pair_count) per round, each localCheckpointed."""
    vocab = (word_frequencies(docs, text_col)
             .select("wf",
                     F.expr("transform(sequence(1, length(word)), "
                            "i -> substring(word, i, 1))").alias("syms"))
             .localCheckpoint())
    tops: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        pairs = vocab.select("wf", F.explode(F.expr(_ADJ_PAIRS)).alias("p"))
        top = (pairs.groupBy(F.col("p.l").alias("ml"),
                             F.col("p.r").alias("mr"))
               .agg(F.sum("wf").alias("pair_count"))
               .orderBy(F.desc("pair_count"), "ml", "mr")
               .limit(1)
               .localCheckpoint())
        tops.append(top.select(F.lit(rank).alias("rank"),
                               "ml", "mr", "pair_count"))
        vocab = (vocab.crossJoin(F.broadcast(top.select("ml", "mr")))
                 .select("wf", F.expr(_MERGE_FOLD).alias("syms"))
                 .localCheckpoint())
    return tops


def bpe_learn(docs: DataFrame, text_col: str,
              n_merges: int = 8) -> DataFrame:
    """Learn the first n_merges BPE merges over whitespace words.

    Returns (merge_rank, pair, pair_count): rank-r row is the r-th
    merge chosen — the concatenated symbol pair and its weighted
    occurrence count at selection time. Ties break lexicographically
    on (left, right) so the result is deterministic and replayable
    by the pytest reference implementation.
    """
    return (reduce(DataFrame.unionAll, _learn_tops(docs, text_col, n_merges))
            .select(F.col("rank").alias("merge_rank"),
                    F.concat("ml", "mr").alias("pair"),
                    "pair_count"))


def bpe_pair_counts(docs: DataFrame, text_col: str,
                    top_n: int = 50) -> DataFrame:
    """The first pair-count round alone (SQL-expressible, oracled):
    (pair, pair_count) for the top_n adjacent character pairs across
    the corpus, weighted by word frequency."""
    wf = word_frequencies(docs, text_col)
    return (wf.where(F.length("word") > 1)
            .select("wf",
                    F.explode(F.expr(
                        "transform(sequence(1, length(word) - 1), "
                        "i -> substring(word, i, 2))")).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("wf").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "pair")
            .limit(top_n))


# Apply every learned merge, in rank order, to one word: the outer
# fold walks the broadcast merges array<struct<l,r>>, the inner fold
# is the same greedy left-to-right scan as _MERGE_FOLD (distinct
# lambda variable names — Spark scopes higher-order lambdas
# lexically, so nesting requires unique names).
_APPLY_MERGES = """
aggregate(
  merges,
  transform(sequence(1, length(w)), i -> substring(w, i, 1)),
  (cur, m) -> aggregate(
      cur,
      struct(CAST(array() AS array<string>) AS out,
             CAST(NULL AS string) AS prev),
      (acc2, y) -> CASE
          WHEN acc2.prev IS NOT NULL AND acc2.prev = m.l AND y = m.r
            THEN struct(concat(acc2.out, array(concat(m.l, m.r))) AS out,
                        CAST(NULL AS string) AS prev)
          ELSE struct(CASE WHEN acc2.prev IS NULL THEN acc2.out
                           ELSE concat(acc2.out, array(acc2.prev)) END
                        AS out,
                      y AS prev) END,
      acc2 -> CASE WHEN acc2.prev IS NULL THEN acc2.out
                   ELSE concat(acc2.out, array(acc2.prev)) END))
"""


def bpe_encode(docs: DataFrame, text_col: str,
               n_merges: int = 8) -> DataFrame:
    """Tokenize the corpus with the learned BPE merges: per document,
    the whitespace words are each re-segmented by applying the
    n_merges merges in rank order, and the document's BPE token
    count, word count and compression ratio are reported.

    Scale design: learning touches only the vocabulary (bpe_learn);
    encoding is then a SINGLE map-only pass over the corpus — the
    merge table is ONE broadcast row (array<struct<l,r>> in rank
    order) and the per-word segmentation is a nested JVM-side fold,
    so a 100 TB encode has zero shuffles and no Python in the loop.
    """
    tops = [t_.select("rank", F.col("ml").alias("l"),
                      F.col("mr").alias("r"))
            for t_ in _learn_tops(docs, text_col, n_merges)]
    mrow = (reduce(DataFrame.unionAll, tops)
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("rank", "l", "r"))),
                lambda s: F.struct(s["l"].alias("l"), s["r"].alias("r")))
                .alias("merges")))
    per_word_len = F.expr(
        f"aggregate(split({text_col}, ' '), CAST(0 AS BIGINT), "
        f"(acc, w) -> acc + CASE WHEN length(w) = 0 THEN 0 "
        f"ELSE size({_APPLY_MERGES}) END)")
    return (docs.crossJoin(F.broadcast(mrow))
            .select("doc_id",
                    F.length(text_col).cast("bigint").alias("n_chars"),
                    F.size(F.filter(F.split(text_col, " "),
                                    lambda w: F.length(w) > 0))
                    .cast("bigint").alias("n_words"),
                    per_word_len.alias("n_bpe_tokens"))
            .withColumn("compression",
                        F.round(F.col("n_chars")
                                / F.col("n_bpe_tokens"), 6)
                        .cast("double")))
