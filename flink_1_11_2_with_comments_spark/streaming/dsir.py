"""Streaming DSIR importance scoring — the incremental twin of the
batch `corpus_dsir_weights` query (queries/pipeline_ops.py).

Reference shape: Flink's broadcast-state pattern
(BroadcastProcessFunction, flink-streaming-java/.../co/
BroadcastProcessFunction.java:49) — a small control table (here the
64-bucket log-probability-ratio table fitted OFFLINE on the reference
corpus, per Xie et al. 2023 DSIR) broadcasts to every task, and the
document stream is scored map-only against it: no shuffle, no state,
trivially incremental.

Exactness: the scorer mirrors the batch query's arithmetic op for op —
md5-bucket tokens (same 60-bit hash), count per bucket, term =
CAST(c * lr AS DECIMAL(30,14)) (exact binary double -> 14 dp HALF_UP,
the same quantize moments.py pins against Spark's cast), decimal sum,
ROUND(..., 6) -> double — so a streamed document's (n_tokens,
dsir_logw) is bit-equal to the batch row
(tests/test_stateful.py::test_streaming_dsir_parity, two batchings).

Scale: the ratio table is 64 rows (production B~10^4 — still tiny);
documents never shuffle; Arrow batches keep the Python hop amortized.
"""

from __future__ import annotations

import decimal
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q14 = decimal.Decimal("1e-14")
_Q6 = decimal.Decimal("1e-6")


def dsir_fit(docs: DataFrame, target_lang: str = "en",
             n_buckets: int = 64) -> dict[int, float]:
    """Fit the bucket log-ratio table on a BOUNDED reference corpus —
    identical expressions to the batch query, so the returned lr
    doubles are the exact values the batch plan broadcasts. The
    result is n_buckets rows (64 here) — the one legitimately
    driver-sized artifact in this pipeline, the analogue of the
    broadcast-state control stream's content."""
    from ..pipeline.dedup import md5_int_expr

    tb = (docs.select("lang",
                      F.explode(F.split("text", " ")).alias("tokn"))
          .withColumn("b", md5_int_expr(F.col("tokn")) % n_buckets)
          .groupBy("b")
          .agg(F.count("*").cast("bigint").alias("n_r"),
               F.sum(F.when(F.col("lang") == target_lang, 1)
                     .otherwise(0)).cast("bigint").alias("n_t")))
    tot = tb.agg(F.sum("n_r").cast("bigint").alias("nr_tot"),
                 F.sum("n_t").cast("bigint").alias("nt_tot"))
    r = (tb.crossJoin(F.broadcast(tot))
         .select("b", F.round(F.log(
             ((F.col("n_t") + 1) * (F.col("nr_tot") + n_buckets)
              * F.lit(1.0))
             / ((F.col("n_r") + 1) * (F.col("nt_tot") + n_buckets))),
             12).alias("lr"), "nr_tot", "nt_tot"))
    pdf = r.toPandas()
    out = {int(row.b): float(row.lr) for row in pdf.itertuples()}
    # buckets unseen in the reference corpus still get their add-1
    # smoothed ratio (n_r = n_t = 0) so a stream token hashing there
    # scores instead of erroring — DSIR's smoothing exists for this
    if len(pdf) == 0:
        # empty reference corpus: fail at fit time with a clear error
        # instead of handing dsir_score_stream an empty ratio table
        # that KeyErrors per scored document (round-9 advisor fix)
        raise ValueError(
            "dsir_fit: reference corpus produced no tokens — cannot "
            "fit importance ratios (check lang filter / text column)")
    if len(out) < n_buckets:
        import math
        nr_tot = int(pdf.nr_tot.iloc[0])
        nt_tot = int(pdf.nt_tot.iloc[0])
        default = round(math.log((nr_tot + n_buckets)
                                 / (nt_tot + n_buckets)), 12)
        for b in range(n_buckets):
            out.setdefault(b, default)
    return out


def _bucket(token: str, n_buckets: int) -> int:
    # mirror md5_int_expr: first 60 bits of md5 as bigint
    return int(hashlib.md5(token.encode()).hexdigest()[:15],
               16) % n_buckets


def dsir_score_stream(docs: DataFrame, ratios: dict[int, float],
                      doc_id_col: str = "doc_id",
                      text_col: str = "text",
                      n_buckets: int = 64) -> DataFrame:
    """Score a document stream against the broadcast ratio table.
    Works identically on batch and streaming DataFrames (map-only:
    mapInPandas carries no state and needs no watermark)."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                toks = text.split(" ")
                counts: dict[int, int] = {}
                for tk in toks:
                    b = _bucket(tk, n_buckets)
                    counts[b] = counts.get(b, 0) + 1
                total = decimal.Decimal(0)
                for b, c in counts.items():
                    term = c * ratios[b]  # double product, as batch
                    total += decimal.Decimal(term).quantize(
                        _Q14, rounding=decimal.ROUND_HALF_UP)
                out.append((doc_id, len(toks),
                            float(total.quantize(
                                _Q6,
                                rounding=decimal.ROUND_HALF_UP))))
            yield pd.DataFrame(
                out, columns=[doc_id_col, "n_tokens", "dsir_logw"])

    return docs.mapInPandas(
        score, f"{doc_id_col} bigint, n_tokens bigint, "
               f"dsir_logw double")
