"""Streaming vocabulary-coverage (OOV-rate) scoring — the incremental
twin of the batch `corpus_vocab_coverage` query (pipeline_ops.py).

Same broadcast-state shape as streaming/dsir.py
(BroadcastProcessFunction, BroadcastProcessFunction.java:49): the
top-K vocabulary is fitted OFFLINE on the reference corpus and rides
along as broadcast state; the document stream scores map-only in
Arrow batches — no shuffle, no keyed state, trivially incremental.
The tokenizer-compatibility screen a training-data intake runs on
every incoming shard before admission.

Exactness: tokens split on single spaces exactly like F.split(text,
' '); the OOV rate mirrors ROUND(x, 9) with decimal HALF_UP (Python's
round() is banker's and would diverge). Bit-equality with the batch
query pinned at two micro-batchings by
tests/test_stateful.py::test_streaming_vocab_parity.

Scale: vocabulary K~10^5 in production — still broadcast-sized;
documents never shuffle.
"""

from __future__ import annotations

import decimal
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q9 = decimal.Decimal("1e-9")


def vocab_fit(docs: DataFrame, k: int = 10) -> frozenset[str]:
    """Top-K corpus vocabulary by frequency, ties broken
    lexicographically — identical selection to the batch query's
    TakeOrdered (deterministic on any cluster). K rows driver-side:
    the broadcast-state control table."""
    tok = docs.select(F.explode(F.split("text", " ")).alias("tokn"))
    wc = tok.groupBy("tokn").agg(F.count("*").alias("c"))
    top = wc.orderBy(F.desc("c"), "tokn").limit(k).toPandas()
    return frozenset(top.tokn)


def vocab_score_stream(docs: DataFrame, vocab: frozenset[str],
                       doc_id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Score a document stream against the broadcast vocabulary.
    Map-only (mapInPandas): works identically on batch and streaming
    DataFrames."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                toks = text.split(" ")
                n_oov = sum(1 for tk in toks if tk not in vocab)
                # IEEE double division first (as the batch plan),
                # THEN round the exact binary quotient HALF_UP at 9dp
                rate = float(
                    decimal.Decimal(n_oov / len(toks))
                    .quantize(_Q9, rounding=decimal.ROUND_HALF_UP))
                out.append((doc_id, len(toks), n_oov, rate))
            yield pd.DataFrame(
                out, columns=[doc_id_col, "n_tokens", "n_oov",
                              "oov_rate"])

    return docs.mapInPandas(
        score, f"{doc_id_col} bigint, n_tokens bigint, "
               f"n_oov bigint, oov_rate double")
