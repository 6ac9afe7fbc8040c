"""Streaming embedding near-duplicate filter — keyed-state cosine
dedup, the INGEST-TIME variant of pipeline/similarity.py's batch
`cosine_dedup_bucketed`.

A 100 TB/day training-data ingest cannot re-run batch dedup over the
whole corpus per delivery; it needs an online filter: each arriving
vector is admitted iff it is not a near-duplicate of anything already
admitted. Exact online dedup needs an all-history index; the standard
scalable form is the same hyperplane-LSH bucketing the batch path
uses — a vector only competes with prior survivors in ITS OWN bucket,
so per-key state stays bucket-sized and lookups are local.

Design (one keyed stateful stage, no cross-key coordination):
- bucket assignment is row-local JVM compute (`_bucket_expr`, the
  identical md5-derived hyperplanes as batch — stream and batch
  bucket bit-identically);
- `applyInPandasWithState` keyed by bucket keeps the admitted
  exemplars' UNIT vectors in state; each row does one numpy
  matrix-vector product against them;
- admission order is (order_col, id) within each micro-batch and
  batch arrival order across micro-batches — the keep-FIRST contract
  of streaming/dedup.py, extended from exact keys to near-dups;
- every input row emits exactly one output row (append mode, no
  retractions): (id, bucket, is_dup, dup_of, cosine).

Like all LSH dedup, recall is per-bucket: near-dups that land in
different buckets are missed (the measured tradeoff of the batch op;
SCALE.md records recall numbers). State per bucket grows with its
SURVIVOR count only — duplicates are dropped from state, which is
what bounds it in heavy-dup ingest streams.

Reference shape: KeyedProcessFunction + ValueState
(flink-streaming-java/src/main/java/org/apache/flink/streaming/api/
functions/KeyedProcessFunction.java:48), the operator Flink users
write for exactly this filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.similarity import _bucket_expr
from .state import keyed_process


def streaming_cosine_dedup(df: DataFrame, id_col: str, vec_col: str,
                           order_col: str, threshold: float = 0.9,
                           n_planes: int = 8) -> DataFrame:
    """Online keep-first near-dup filter. Emits one append-mode row
    per input: (id, bucket, is_dup, dup_of, cosine) where cosine is
    the best match against prior survivors in the bucket (null when
    the bucket had no exemplars)."""
    import numpy as np
    import pandas as pd

    keyed = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(order_col).alias("ord"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        _bucket_expr(vec_col, n_planes).alias("bucket"))

    out_schema = ("bucket bigint, id bigint, is_dup boolean, "
                  "dup_of bigint, cosine double")

    def fn(key, rows: pd.DataFrame | None, state):
        if rows is None:
            return None
        ex_ids: list = state.get("ex_ids", [])
        ex_vecs: list = state.get("ex_vecs", [])
        mat = (np.array(ex_vecs, dtype=np.float64)
               if ex_vecs else np.empty((0, 0)))
        out = []
        for _, r in rows.sort_values(["ord", "id"]).iterrows():
            v = np.asarray(r["vec"], dtype=np.float64)
            nrm = float(np.sqrt(v @ v))
            best_cos, best_id = None, None
            if nrm > 0.0 and mat.size:
                cos = np.round(mat @ (v / nrm), 9)
                k = int(np.argmax(cos))
                best_cos, best_id = float(cos[k]), ex_ids[k]
            dup = best_cos is not None and best_cos >= threshold
            out.append({"bucket": int(key[0]), "id": int(r["id"]),
                        "is_dup": dup,
                        "dup_of": best_id if dup else None,
                        "cosine": best_cos})
            if not dup and nrm > 0.0:
                u = (v / nrm).tolist()
                ex_ids.append(int(r["id"]))
                ex_vecs.append(u)
                mat = np.array(ex_vecs, dtype=np.float64)
        state.put("ex_ids", ex_ids)
        state.put("ex_vecs", ex_vecs)
        return pd.DataFrame(out, columns=["bucket", "id", "is_dup",
                                          "dup_of", "cosine"])

    return keyed_process(keyed, ["bucket"], fn, out_schema,
                         output_mode="append")
