"""MJPEG-in-AVI video — a REAL video format, pure stdlib + the
in-repo JPEG codec.

Round 13 closes the "video frame decode" gate for Motion-JPEG: an
AVI file (Microsoft RIFF container, the same chunk grammar as WAV)
whose video stream is a sequence of independently-coded baseline
JPEG frames ('MJPG' fourcc, '00dc' chunks). The container layout
follows the public AVI RIFF spec: RIFF('AVI ') → LIST('hdrl') with
an 'avih' main header and a LIST('strl') holding 'strh'/'strf'
(BITMAPINFOHEADER), then LIST('movi') carrying one '00dc' chunk per
frame (word-aligned, as RIFF requires), then an 'idx1' index. The
frame payloads are produced and consumed by pipeline/jpeg.py — so
every byte of the pipeline (container AND codec) is real.

What a 100 TB training pipeline does with this: videos live as one
binary column; frame-sampling (every k-th frame) is a pure container
walk — no codec work for skipped frames, since MJPEG frames are
independent — and only sampled frames pay the JPEG decode. That
access pattern (cheap index scan, selective decode) is exactly why
MJPEG remains the lab format for vision-data curation. Inter-coded
codecs (H.264/VP9/AV1) remain the documented env-gated boundary —
motion-compensated decode is not honestly implementable here.
"""

from __future__ import annotations

import struct

from .jpeg import jpeg_decode_any, jpeg_encode_color


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF word alignment
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_build(width: int, height: int, frames: list[bytes],
              fps: int = 10) -> bytes:
    """Assemble an MJPEG AVI from already-encoded JPEG frame blobs."""
    n = len(frames)
    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, max_bytes * fps, 0,
        0x10,                     # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0)
    # AVISTREAMHEADER (56 bytes): dwFlags, wPriority, wLanguage,
    # dwInitialFrames, dwScale, dwRate, dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality, dwSampleSize, rcFrame
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                          max_bytes, 0, 0)
            + struct.pack("<hhhh", 0, 0, width, height))
    # BITMAPINFOHEADER, biCompression = 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the 'movi' list
    # type fourcc (the convention players expect)
    idx, off = bytearray(), 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_parse(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Walk the RIFF tree → (width, height, fps, [jpeg frame bytes]).
    Rejects non-AVI RIFFs and non-MJPG video streams loudly."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI file")
    width = height = fps = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            payload_start = pos + 8
            if fourcc == b"LIST":
                walk(payload_start + 4, payload_start + size)
            elif fourcc == b"strh":
                if data[payload_start:payload_start + 4] == b"vids":
                    codec = data[payload_start + 4:payload_start + 8]
                    if codec != b"MJPG":
                        raise ValueError(
                            f"avi: video codec {codec!r} unsupported "
                            "— MJPG only (inter-coded codecs are the "
                            "documented env-gated boundary)")
                    scale, rate = struct.unpack(
                        "<II", data[payload_start + 20:
                                    payload_start + 28])
                    # AVI rate/scale encoding: fps = dwRate/dwScale
                    # (e.g. NTSC 30000/1001); in-repo clips write
                    # dwScale=1 but external files commonly don't
                    fps = rate // max(scale, 1)
            elif fourcc == b"strf" and size >= 24:
                w, h = struct.unpack(
                    "<ii", data[payload_start + 4:payload_start + 12])
                width, height = w, abs(h)
            elif fourcc == b"00dc":
                frames.append(data[payload_start:payload_start + size])
            pos = payload_start + size + (size % 2)

    walk(12, len(data))
    if width is None or not frames:
        raise ValueError("avi: missing video stream or frames")
    return width, height, fps or 0, frames


def mjpeg_synthesize(width: int, height: int, n_frames: int,
                     doc_id: int, quality: int = 90) -> bytes:
    """Deterministic test clip: frame f is the wrap-free RGB ramp
    shifted by 2f per channel (a 'pan'), each frame an independent
    baseline 4:2:0 JPEG."""
    base = doc_id % 64
    frames = []
    for f in range(n_frames):
        rgb = bytes(
            v for y in range(height) for x in range(width)
            for v in ((20 + base + 2 * f + 2 * x + y) & 0xFF,
                      (40 + base + 2 * f + x + 2 * y) & 0xFF,
                      (60 + base + 2 * f + x + y) & 0xFF))
        frames.append(jpeg_encode_color(width, height, rgb, quality,
                                        subsampling="4:2:0"))
    return avi_build(width, height, frames)


def mjpeg_sample_frames(data: bytes, every: int = 2
                        ) -> list[tuple[int, int, int, bytes]]:
    """Frame-sample WITHOUT decoding skipped frames (the container
    walk is the only cost for them): decode every `every`-th frame →
    [(frame_index, width, height, rgb bytes)]."""
    _w, _h, _fps, frames = avi_parse(data)
    out = []
    for ix in range(0, len(frames), max(every, 1)):
        fw, fh, ncomp, px = jpeg_decode_any(frames[ix])
        if ncomp != 3:
            raise ValueError("mjpeg: expected color frames")
        out.append((ix, fw, fh, px))
    return out
