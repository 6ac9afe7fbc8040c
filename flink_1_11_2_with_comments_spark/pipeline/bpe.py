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


def bpe_learn(docs: DataFrame, text_col: str,
              n_merges: int = 8) -> DataFrame:
    """Learn the first n_merges BPE merges over whitespace words.

    Returns (merge_rank, pair, pair_count): rank-r row is the r-th
    merge chosen — the concatenated symbol pair and its weighted
    occurrence count at selection time. Ties break lexicographically
    on (left, right) so the result is deterministic and replayable
    by the pytest reference implementation.
    """
    vocab = (word_frequencies(docs, text_col)
             .select("wf",
                     F.expr("transform(sequence(1, length(word)), "
                            "i -> substring(word, i, 1))").alias("syms"))
             .localCheckpoint())
    merges: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        pairs = vocab.select("wf", F.explode(F.expr(_ADJ_PAIRS)).alias("p"))
        top = (pairs.groupBy(F.col("p.l").alias("ml"),
                             F.col("p.r").alias("mr"))
               .agg(F.sum("wf").alias("pair_count"))
               .orderBy(F.desc("pair_count"), "ml", "mr")
               .limit(1)
               .localCheckpoint())
        merges.append(top.select(
            F.lit(rank).alias("merge_rank"),
            F.concat("ml", "mr").alias("pair"),
            F.col("pair_count")))
        vocab = (vocab.crossJoin(F.broadcast(top.select("ml", "mr")))
                 .select("wf", F.expr(_MERGE_FOLD).alias("syms"))
                 .localCheckpoint())
    return reduce(DataFrame.unionAll, merges)


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
