"""Video fingerprinting — per-frame perceptual hashes over a real
container/codec pipeline (MJPEG-AVI walk + in-repo JPEG decode +
DCT pHash), temporally aggregated into a duration-invariant clip
signature — completing the dedup family's modality QUARTET: text
(minhash/simhash), image (pHash), audio (constellation), VIDEO
(this file).

Scheme (the standard frame-hash sequence design of video copy
detection — per-frame perceptual hashes + temporal aggregation /
offset voting, as in the classic CBCD literature, e.g. TRECVID
content-based copy detection):
  1. walk the AVI container (pipeline/mjpeg_avi.py) — the frame
     COUNT is free (index/chunk walk, no codec work),
  2. JPEG-decode ONLY the first SIGNATURE_FRAMES frames (MJPEG
     frames are independent, so a prefix decode costs its share —
     the selective-decode access pattern the container exists for),
  3. DCT pHash of each decoded frame's luma (pipeline/phash.py),
  4. a clip's SIGNATURE is the md5 of that frame-hash prefix — the
     shared prefix of encodes of the same footage that differ only
     in duration/trailing frames, so "same clip, different length"
     collapses to one signature (the closed form a SQL oracle can
     state),
  5. the pairwise matcher (tests) is the offset-voting shape: frame
     rows equi-join on the 64-bit frame hash and vote on the index
     DELTA — a subclip of a longer video wins its true offset with
     one vote per shared frame, and candidates only ever come from
     hash collisions (never a cross product). Rescaled re-encodes
     land within Hamming <= 3 per frame, so the banded pigeonhole
     lookup (phash_bands) still finds them — pinned in tests.

Scale shape: fingerprinting is map-only Arrow-batched Python over
the video corpus (clips never shuffle; skipped frames cost only the
container walk); signature clustering shuffles one 8-byte key per
clip. At 100 TB the frame-level matcher is an equi-join on the
frame hash (or its 16-bit bands), the same bucket-join discipline
as every other dedup operator in this package.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMMON_FRAMES = 6           # every synthesized clip has >= this many
SIGNATURE_FRAMES = 4        # decoded prefix the signature hashes —
#                             shorter than the clip minimum so every
#                             duration variant shares it, and the
#                             per-clip decode cost is bounded by it
#                             (the knob that sets the face's marginal
#                             cost: clips pay SIGNATURE_FRAMES JPEG
#                             decodes regardless of duration)
_MODES = ("4:4:4", "4:2:0", "4:2:2")


def video_tile(cid: int, f: int) -> np.ndarray:
    """Deterministic 32x32 luma tile for frame `f` of cluster `cid`
    — the _phash_tile family plus a frame-indexed ramp, tuned so the
    23 clusters' 6-frame hash tuples are pairwise distinct, frames
    WITHIN a cluster hash distinctly (the signature depends on the
    sequence), cross-cluster frame hashes sit >= 16 Hamming bits
    apart (clusters cannot merge), and a JPEG-roundtripped 2x/3x
    block upscale of the same frame stays within 2 bits (rescaled
    re-encodes remain banded-lookup near-dups). All pinned in
    tests/test_pipeline.py."""
    X, Y = np.meshgrid(np.arange(32), np.arange(32), indexing="xy")
    a, b = cid % 5 + 1, cid % 7 + 1
    c = (cid * 3 + f) % 4 + 1
    return (((X * a + Y * b) * 17 + X * Y * c
             + f * (X + 2 * Y) * 7) & 0xFF).astype(np.uint8)


_FRAME_MEMO: dict[tuple[int, int, int, str], bytes] = {}


def _encoded_frame(cid: int, f: int, s: int, m: str) -> bytes:
    """Encoded JPEG for frame `f` of cluster `cid` at scale `s`,
    mode `m` — MEMOIZED per executor: frame bytes depend only on
    these four values (23 clusters x <= 10 frame indices x one
    (s, m) each in the corpus, so the memo is bounded at a few
    hundred entries), and without the memo the CORPUS SYNTHESIS
    (6-10 encodes per document) dominated the measured operator
    (the per-document prefix DECODE) ~5x in the scale sweep."""
    key = (cid, f, s, m)
    enc = _FRAME_MEMO.get(key)
    if enc is None:
        from .jpeg import jpeg_encode_color

        t = np.repeat(np.repeat(video_tile(cid, f), s, 0), s, 1)
        h, w = t.shape
        rgb = np.dstack([t, t, t]).tobytes()
        enc = jpeg_encode_color(w, h, rgb, 90, subsampling=m)
        _FRAME_MEMO[key] = enc
    return enc


def synthesize_video_clip(cid: int, n_frames: int, fps: int = 10,
                          start: int = 0, scale: int | None = None,
                          mode: str | None = None) -> bytes:
    """MJPEG-AVI clip for cluster `cid`: frames start..start+n-1 of
    the cluster's tile sequence, rendered gray-replicated RGB at the
    cluster's block scale (32/64 px) and chroma subsampling mode.
    Scale and mode are CLUSTER properties (same within a cluster) so
    the prefix signature is bit-deterministic; `start` exists for
    the subclip-alignment matcher tests."""
    from .mjpeg_avi import avi_build

    s = (cid % 2 + 1) if scale is None else scale
    m = _MODES[(cid // 3) % 3] if mode is None else mode
    frames = [_encoded_frame(cid, f, s, m)
              for f in range(start, start + n_frames)]
    return avi_build(32 * s, 32 * s, frames, fps=fps)


def frame_phashes(avi: bytes, limit: int | None = None
                  ) -> tuple[list[int], int]:
    """([phash of frame 0..limit-1], total frame count). The count
    comes from the container walk alone; only the first `limit`
    frames pay a JPEG decode."""
    from .jpeg import jpeg_decode_any
    from .mjpeg_avi import avi_parse
    from .phash import phash64

    _w, _h, _fps, frames = avi_parse(avi)
    take = frames if limit is None else frames[:limit]
    hashes = []
    for blob in take:
        fw, fh, nc, px = jpeg_decode_any(blob)
        d = np.frombuffer(px, np.uint8).reshape(fh, fw, nc)
        d = d.astype(np.float64)
        luma = (0.299 * d[..., 0] + 0.587 * d[..., 1 % nc]
                + 0.114 * d[..., 2 % nc])
        hashes.append(phash64(luma))
    return hashes, len(frames)


def clip_signature(frame_hashes: list[int],
                   k: int = SIGNATURE_FRAMES) -> int:
    """Signed-64 signature of the first k frame hashes (the common
    prefix across durations of the same footage)."""
    digest = hashlib.md5(
        "|".join(map(str, frame_hashes[:k])).encode()).hexdigest()
    return int(digest[:15], 16) - (1 << 59)


def synthesize_video_corpus(documents: DataFrame) -> DataFrame:
    """Per-document MJPEG-AVI whose CONTENT depends only on
    doc_id % 23 (the cluster id) while its DURATION (6..10 frames)
    and header fps vary with the text length — the same footage
    published at different lengths/rates."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = COMMON_FRAMES + len(text) % 5
                fps = 8 + len(text) % 7
                rows.append({"doc_id": int(doc_id),
                             "media": synthesize_video_clip(
                                 int(doc_id) % 23, n, fps=fps)})
            yield pd.DataFrame(rows)

    par = documents.sparkSession.sparkContext.defaultParallelism
    return (documents.select("doc_id", "text").repartition(par)
            .mapInPandas(run, "doc_id bigint, media binary"))


def video_fingerprints(media: DataFrame,
                       media_col: str = "media") -> DataFrame:
    """(doc_id, media AVI) -> (doc_id, signature, n_frames):
    map-only Arrow-batched container walk + prefix frame decode +
    pHash — zero shuffle, the video corpus never moves."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs, counts = [], []
            for blob in pdf[media_col]:
                hashes, n = frame_phashes(bytes(blob),
                                          limit=SIGNATURE_FRAMES)
                sigs.append(clip_signature(hashes))
                counts.append(n)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "signature": pd.array(sigs, dtype="int64"),
                "n_frames": pd.array(counts, dtype="int32")})

    return (media.select("doc_id", media_col).mapInPandas(
        run, "doc_id bigint, signature bigint, n_frames int"))


def video_fp_cluster_check(documents: DataFrame) -> DataFrame:
    """Hash-enforced closed loop for fingerprint video dedup:
    synthesize the duration-varied corpus, fingerprint every clip
    executor-side (container walk + prefix JPEG decode + pHash),
    cluster on the signature — one 8-byte-key shuffle. Output
    (doc_id, cluster_size, is_canonical) must equal the oracle's
    doc_id % 23 grouping: any drift in the AVI walk, JPEG decode,
    luma transform, pHash or signature prefix splits or merges a
    cluster and fails the value-hash compare."""
    from pyspark.sql import Window

    fp = video_fingerprints(synthesize_video_corpus(documents))
    win = Window.partitionBy("signature")
    return fp.select(
        "doc_id",
        F.count("*").over(win).alias("cluster_size"),
        (F.col("doc_id") == F.min("doc_id").over(win))
        .alias("is_canonical"))


def frame_hash_rows(fp: DataFrame) -> DataFrame:
    """(doc_id, frame_hashes array<bigint>) -> one row per frame
    (doc_id, frame_ix, phash) — the exploded form the offset matcher
    and the banded Hamming lookup consume."""
    return (fp.select("doc_id", F.posexplode("frame_hashes")
                      .alias("frame_ix", "phash")))


def video_offset_match(frames_a: DataFrame,
                       frames_b: DataFrame) -> DataFrame:
    """The offset-voting matcher of video copy detection: frame rows
    equi-join on the 64-bit frame hash (candidates ONLY from hash
    collisions — never a cross product), each matched pair votes for
    its index delta, and the true temporal alignment of a duplicate
    or subclip wins with one vote per shared frame. Inputs:
    (doc_id, frame_ix, phash) rows; output one row per (a, b) pair:
    its best offset and that offset's votes."""
    ea = frames_a.select(F.col("doc_id").alias("a"),
                         F.col("frame_ix").alias("ai"), "phash")
    eb = frames_b.select(F.col("doc_id").alias("b"),
                         F.col("frame_ix").alias("bi"), "phash")
    votes = (ea.join(eb, "phash")
             .where(F.col("a") < F.col("b"))
             .groupBy("a", "b",
                      (F.col("bi") - F.col("ai")).alias("offset"))
             .agg(F.count("*").alias("votes")))
    best = (votes.groupBy("a", "b")
            .agg(F.max(F.struct("votes", "offset")).alias("m")))
    return best.select("a", "b", F.col("m.offset").alias("offset"),
                       F.col("m.votes").alias("votes"))
