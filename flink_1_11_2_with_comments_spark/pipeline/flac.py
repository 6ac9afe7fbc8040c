"""FLAC (Free Lossless Audio Codec, RFC 9639) — pure numpy/stdlib.

Audio corpora for large-scale training pipelines overwhelmingly ship
FLAC-compressed (LibriSpeech, MLS, People's Speech): it is THE
lossless interchange format, so "decode the corpus" means "decode
FLAC" the same way "decode the images" means JPEG/PNG. This module
implements the format from the public spec (RFC 9639 / the
xiph.org format document), both directions:

- `flac_encode`: 8/16-bit PCM, mono or stereo, fixed-blocksize
  frames; per-channel subframe choice between CONSTANT (flat
  blocks), VERBATIM (incompressible blocks), FIXED predictors of
  order 0-4 (residual = n-th finite difference — exact on integers,
  so low-frequency content prefers them) and quantized LPC
  (Levinson-Durbin analysis, 15-bit coefficients — the winner on
  mid/high-frequency content where differences AMPLIFY the signal),
  all chosen per block by exact rice-cost accounting; residuals
  rice-partitioned at the cost-minimizing partition order with
  per-partition parameters, STREAMINFO with the spec's MD5 of the
  unencoded PCM, CRC-8 frame headers and CRC-16 frame footers. The
  encoder is deliberately a clean SUBSET — everything it emits is
  spec-conformant and decodable by any FLAC decoder.
- `flac_decode`: the full frame-level format needed to read real
  streams: all blocksize/samplerate/samplesize header codings,
  UTF-8-style frame numbers, CONSTANT / VERBATIM / FIXED 0-4 / LPC
  subframes (LPC via the quantized-coefficient recurrence), all
  four channel assignments (independent, left/side, right/side,
  mid/side), rice + rice2 partitions at any partition order, the
  escape coding, wasted-bits shifts, and LOUD verification of every
  CRC-8, every CRC-16 and the stream MD5.

Both directions are vectorized where the format allows: fixed
predictors encode as `np.diff` and decode as seeded `np.cumsum`
chains (the recurrence of the n-th difference integrates, unlike
general LPC), rice emission scatters bits into one numpy bit array
per partition, and rice reading runs on a bulk big-int accumulator
with O(1) leading-zero unary via bit_length — the same
bulk-bit-reader shape as pipeline/jpeg's scan reader.

Reference parity: the reference ships no audio codecs at all (its
formats are table/stream connectors — flink-formats/); this module
belongs to the training-data-pipeline surface the 100 TB story
needs, alongside pipeline/jpeg.py and pipeline/audio_fp.py.

Scale: like every codec here, FLAC work is map-only executor-side
Python under mapInPandas — zero shuffle, no driver involvement; the
binary column stays columnar in parquet.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {          # RFC 9639 §10.2.2 fixed predictors
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    tab = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab.append(r & mask)
    return tab


_CRC8_TAB = _crc_table(0x07, 8)       # x^8 + x^2 + x + 1
_CRC16_TAB = _crc_table(0x8005, 16)   # x^16 + x^15 + x^2 + 1


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TAB[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16_TAB[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


def _utf8_number(n: int) -> bytes:
    """Frame/sample-number coding (RFC 9639 §9.1.5): UTF-8's
    byte-pattern extended beyond Unicode's range (up to 36 bits, 7
    bytes)."""
    if n < 0x80:
        return bytes((n,))
    nbytes = 2
    # k-byte coding carries 6*(k-1) + (7-k) payload bits
    while nbytes < 7 and n >= 1 << (6 * (nbytes - 1) + 7 - nbytes):
        nbytes += 1
    cont = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 1)]
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | (n >> (6 * (nbytes - 1)))
    return bytes([lead] + list(reversed(cont)))


def _read_utf8_number(data: bytes, pos: int) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    nbytes = 0
    m = b0
    while m & 0x80:
        nbytes += 1
        m = (m << 1) & 0xFF
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: invalid frame-number coding")
    n = b0 & (0x7F >> nbytes)
    for i in range(1, nbytes):
        b = data[pos + i]
        if b & 0xC0 != 0x80:
            raise ValueError("flac: invalid frame-number continuation")
        n = (n << 6) | (b & 0x3F)
    return n, pos + nbytes


# ---------------------------------------------------------------------------
# bit plumbing
# ---------------------------------------------------------------------------

class _Bits:
    """MSB-first bit assembler over a numpy uint8 BIT array (one
    element per bit) — small header fields append tiny arrays, rice
    partitions append one scattered array, packbits once per
    frame."""

    def __init__(self):
        self.parts: list[np.ndarray] = []

    def put(self, value: int, nbits: int) -> None:
        if nbits:
            self.parts.append(np.array(
                [(value >> i) & 1 for i in range(nbits - 1, -1, -1)],
                dtype=np.uint8))

    def put_bits(self, arr: np.ndarray) -> None:
        self.parts.append(arr)

    def tobytes(self) -> bytes:
        bits = (np.concatenate(self.parts) if self.parts
                else np.zeros(0, np.uint8))
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
        return np.packbits(bits).tobytes()


def _rice_cost(folded: np.ndarray, p: int) -> int:
    return int(np.sum(folded >> p)) + folded.size * (p + 1)


def _best_rice_param(folded: np.ndarray) -> tuple[int, int]:
    """(param, bits) minimizing the exact rice size, params 0..14
    (15 is the 4-bit escape) — all 15 exact costs in one
    broadcast."""
    costs = ((folded[None, :] >> np.arange(15)[:, None]).sum(axis=1)
             + folded.size * (np.arange(15) + 1))
    p = int(np.argmin(costs))
    return p, int(costs[p])


def _rice_bits(folded: np.ndarray, p: int) -> np.ndarray:
    """Rice-encode a folded (zigzag) residual partition into a bit
    array in one numpy scatter: per sample `q` 0-bits, a 1, then the
    p low bits."""
    q = (folded >> p).astype(np.int64)
    lens = q + 1 + p
    ends = np.cumsum(lens)
    starts = ends - lens
    total = int(ends[-1]) if lens.size else 0
    bits = np.zeros(total, np.uint8)
    bits[starts + q] = 1
    if p:
        weights = np.arange(p - 1, -1, -1, dtype=np.int64)
        vals = ((folded[:, None] >> weights[None, :]) & 1).astype(np.uint8)
        pos = (starts + q + 1)[:, None] + np.arange(p)[None, :]
        bits[pos.ravel()] = vals.ravel()
    return bits


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _lpc_models(sig: np.ndarray, max_order: int) -> list[np.ndarray]:
    """Levinson-Durbin over the block's autocorrelation → float LPC
    coefficient vectors for orders 1..max_order (the classic
    analysis real FLAC encoders run; RFC 9639 only standardizes the
    decode recurrence, so any coefficient choice is conformant)."""
    x = sig.astype(np.float64)
    n = x.size
    ac = np.array([np.dot(x[:n - k], x[k:])
                   for k in range(max_order + 1)])
    if ac[0] == 0:
        return []
    err = ac[0]
    a: list[float] = []
    models = []
    for m in range(1, max_order + 1):
        acc = ac[m] - sum(a[i] * ac[m - 1 - i] for i in range(m - 1))
        if err <= 0:
            break
        k = acc / err
        a = [a[i] - k * a[m - 2 - i] for i in range(m - 1)] + [k]
        err *= (1 - k * k)
        models.append(np.array(a))
    return models


def _quantize_lpc(coefs: np.ndarray,
                  precision: int = 15) -> tuple[list[int], int] | None:
    """(quantized coefficients, shift) with coefficients in
    `precision` signed bits and shift in [0, 15] (the 5-bit field)."""
    cmax = float(np.max(np.abs(coefs)))
    if cmax == 0:
        return None
    lim = 1 << (precision - 1)
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.clip(np.round(coefs * (1 << shift)), -lim, lim - 1)
    if not np.any(q):
        return None
    return [int(v) for v in q], shift


def _fold(res: np.ndarray) -> np.ndarray:
    return (np.abs(res) * 2 - (res < 0)).astype(np.int64)


def _residual_plan(folded: np.ndarray, n: int,
                   order: int) -> tuple[int, list[int], int]:
    """(partition_order, per-partition rice params, total bits) for
    the 4-bit-rice method: try every legal partition order (sizes
    must divide the block; partition 0 loses the warmup), exact-cost
    each partition's best parameter."""
    best = None
    po = 0
    while True:
        nparts = 1 << po
        if n % nparts or (n >> po) <= order or nparts > folded.size:
            if po:
                break
            po += 1
            continue
        psize = n >> po
        bounds = [0] + [psize * k - order for k in range(1, nparts)] \
            + [folded.size]
        params, total = [], 4
        for k in range(nparts):
            part = folded[bounds[k]:bounds[k + 1]]
            p, c = _best_rice_param(part)
            params.append(p)
            total += 4 + c
        if best is None or total < best[2]:
            best = (po, params, total)
        po += 1
        if po > 6:
            break
    return best


def _emit_residual(bw: _Bits, folded: np.ndarray, n: int,
                   order: int, plan) -> None:
    po, params, _total = plan
    bw.put(0b00, 2)                    # method: 4-bit rice
    bw.put(po, 4)
    psize = n >> po
    bounds = [0] + [psize * k - order for k in range(1, 1 << po)] \
        + [folded.size]
    for k, p in enumerate(params):
        bw.put(p, 4)
        bw.put_bits(_rice_bits(folded[bounds[k]:bounds[k + 1]], p))


def _encode_subframe(bw: _Bits, sig: np.ndarray, bps: int) -> None:
    """One channel of one frame: CONSTANT if flat, else the best of
    FIXED orders 0-4 and quantized-LPC orders (Levinson-Durbin, up
    to 8) by exact rice cost — residuals rice-partitioned at the
    cost-minimizing partition order — with VERBATIM when nothing
    beats raw."""
    n = sig.size
    if n > 1 and np.all(sig == sig[0]):
        bw.put(0, 1)                   # zero pad bit
        bw.put(0b000000, 6)            # CONSTANT
        bw.put(0, 1)                   # no wasted bits
        bw.put(int(sig[0]) & ((1 << bps) - 1), bps)
        return
    best = None    # (bits, kind, order, folded, extra)
    for order in range(0, min(5, n)):
        res = np.diff(sig, n=order) if order else sig.copy()
        folded = _fold(res)
        p, cost = _best_rice_param(folded)
        total = order * bps + 2 + 4 + 4 + cost
        if best is None or total < best[0]:
            best = (total, "fixed", order, folded, None)
    if n >= 64:                        # LPC pays off on real blocks
        prec = 15
        for coefs in _lpc_models(sig, min(8, n - 1))[1::2]:
            qz = _quantize_lpc(coefs, prec)
            if qz is None:
                continue
            qcoef, shift = qz
            order = len(qcoef)
            acc = np.convolve(sig, np.array(qcoef, dtype=np.int64))
            res = sig[order:] - (acc[order - 1:n - 1] >> shift)
            folded = _fold(res)
            _p, cost = _best_rice_param(folded)
            total = order * bps + 4 + 5 + order * prec + 2 + 4 + 4 \
                + cost
            if total < best[0]:
                best = (total, "lpc", order, folded, (qcoef, shift))
    if best[0] >= n * bps:
        bw.put(0, 1)
        bw.put(0b000001, 6)            # VERBATIM
        bw.put(0, 1)
        mask = (1 << bps) - 1
        for v in sig.tolist():
            bw.put(v & mask, bps)
        return
    _total, kind, order, folded, extra = best
    plan = _residual_plan(folded, n, order)
    mask = (1 << bps) - 1
    bw.put(0, 1)
    if kind == "fixed":
        bw.put(0b001000 | order, 6)    # FIXED, order in low bits
        bw.put(0, 1)                   # no wasted bits
        for v in sig[:order].tolist():
            bw.put(v & mask, bps)
    else:
        qcoef, shift = extra
        bw.put(0b100000 | (order - 1), 6)   # LPC, order-1 in low 5
        bw.put(0, 1)
        for v in sig[:order].tolist():
            bw.put(v & mask, bps)
        bw.put(15 - 1, 4)              # precision-1
        bw.put(shift, 5)
        pm = (1 << 15) - 1
        for c in qcoef:
            bw.put(c & pm, 15)
    _emit_residual(bw, folded, n, order, plan)


def flac_encode(pcm: bytes, sample_rate: int, channels: int = 1,
                bits_per_sample: int = 16,
                block_size: int = 4096) -> bytes:
    """Encode interleaved signed little-endian PCM as a FLAC stream
    (fLaC magic + STREAMINFO + fixed-blocksize frames)."""
    if channels not in (1, 2):
        raise ValueError("flac_encode: 1 or 2 channels")
    if bits_per_sample not in (8, 16):
        raise ValueError("flac_encode: 8- or 16-bit samples")
    bps = bits_per_sample
    dt = np.int8 if bps == 8 else np.dtype("<i2")
    samples = np.frombuffer(pcm, dtype=dt).astype(np.int64)
    if samples.size % channels:
        raise ValueError("flac_encode: PCM size not a multiple of "
                         "the channel count")
    frames_total = samples.size // channels
    chans = [samples[c::channels] for c in range(channels)]
    md5 = hashlib.md5(pcm).digest()

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2          # min/max frame size unknown
    packed = (sample_rate << 44) | ((channels - 1) << 41) \
        | ((bps - 1) << 36) | frames_total
    si += packed.to_bytes(8, "big")
    si += md5
    out += bytes((0x80,)) + len(si).to_bytes(3, "big") + si  # last=1

    for fi, start in enumerate(range(0, frames_total, block_size)):
        n = min(block_size, frames_total - start)
        hdr = bytearray()
        # sync(14)=0x3FFE, reserved 0, fixed-blocksize strategy 0
        if n == block_size:
            bs_code, bs_tail = _blocksize_code(block_size)
        else:                          # last partial frame
            bs_code, bs_tail = (0b0110, bytes((n - 1,))) if n <= 256 \
                else (0b0111, struct.pack(">H", n - 1))
        sr_code = 0b0000               # from STREAMINFO
        ch_code = 0b0000 if channels == 1 else 0b0001
        sz_code = 0b001 if bps == 8 else 0b100
        hdr += bytes((0xFF, 0xF8))
        hdr += bytes(((bs_code << 4) | sr_code,
                      (ch_code << 4) | (sz_code << 1)))
        hdr += _utf8_number(fi)
        hdr += bs_tail
        hdr.append(crc8(bytes(hdr)))
        bw = _Bits()
        for ch in chans:
            _encode_subframe(bw, ch[start:start + n], bps)
        frame = bytes(hdr) + bw.tobytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


def _blocksize_code(bs: int) -> tuple[int, bytes]:
    if bs == 192:
        return 0b0001, b""
    for c in range(2, 6):
        if bs == 576 << (c - 2):
            return c, b""
    for c in range(8, 16):
        if bs == 256 << (c - 8):
            return c, b""
    if bs <= 256:
        return 0b0110, bytes((bs - 1,))
    return 0b0111, struct.pack(">H", bs - 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Reader:
    """Bulk big-int bit reader: bytes load 8 at a time into an int
    accumulator; unary runs resolve in O(1) via bit_length (the
    rice quotient path — pipeline/jpeg's reader shape without byte
    stuffing)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos                 # next byte index
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("flac: bitstream truncated")
            take = min(len(self.data) - self.pos, 8)
            chunk = self.data[self.pos:self.pos + take]
            self.acc = (self.acc << (8 * take)) | int.from_bytes(
                chunk, "big")
            self.nbits += 8 * take
            self.pos += take
        self.nbits -= n
        v = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self.nbits == 0:
                if self.pos >= len(self.data):
                    raise ValueError("flac: bitstream truncated")
                take = min(len(self.data) - self.pos, 8)
                self.acc = int.from_bytes(
                    self.data[self.pos:self.pos + take], "big")
                self.nbits = 8 * take
                self.pos += take
            if self.acc == 0:
                q += self.nbits
                self.nbits = 0
                continue
            lead = self.nbits - self.acc.bit_length()
            q += lead
            self.nbits -= lead + 1     # zeros + the terminating 1
            self.acc &= (1 << self.nbits) - 1
            return q

    def align(self) -> None:
        drop = self.nbits % 8
        self.nbits -= drop
        self.acc &= (1 << self.nbits) - 1

    def byte_pos(self) -> int:
        return self.pos - self.nbits // 8


def _read_residual(r: _Reader, n: int, order: int) -> np.ndarray:
    method = r.bits(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.bits(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("flac: partition order does not divide "
                         "block size")
    out = np.empty(n - order, dtype=np.int64)
    at = 0
    for part in range(nparts):
        cnt = (n >> porder) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: partition smaller than predictor "
                             "order")
        p = r.bits(pbits)
        if p == escape:
            raw = r.bits(5)
            for i in range(cnt):
                out[at + i] = (r.signed(raw) if raw else 0)
        else:
            # rice loop with the reader state in locals (the
            # pipeline/jpeg _block_baseline pattern): one Python
            # frame per PARTITION, O(1) unary via bit_length
            data, dlen = r.data, len(r.data)
            acc, nbits, bpos = r.acc, r.nbits, r.pos
            pmask = (1 << p) - 1
            for i in range(cnt):
                q = 0
                while True:
                    if nbits == 0:
                        if bpos >= dlen:
                            raise ValueError(
                                "flac: bitstream truncated")
                        take = min(dlen - bpos, 8)
                        acc = int.from_bytes(
                            data[bpos:bpos + take], "big")
                        nbits = 8 * take
                        bpos += take
                    if acc == 0:
                        q += nbits
                        nbits = 0
                        continue
                    lead = nbits - acc.bit_length()
                    q += lead
                    nbits -= lead + 1
                    acc &= (1 << nbits) - 1
                    break
                while nbits < p:
                    if bpos >= dlen:
                        raise ValueError("flac: bitstream truncated")
                    take = min(dlen - bpos, 8)
                    acc = (acc << (8 * take)) | int.from_bytes(
                        data[bpos:bpos + take], "big")
                    nbits += 8 * take
                    bpos += take
                nbits -= p
                folded = (q << p) | (acc >> nbits)
                acc &= (1 << nbits) - 1
                out[at + i] = (folded >> 1) ^ -(folded & 1)
            r.acc, r.nbits, r.pos = acc, nbits, bpos
        at += cnt
    return out


def _reconstruct_fixed(warm: np.ndarray, res: np.ndarray,
                       order: int) -> np.ndarray:
    """Invert the n-th finite difference with n seeded cumsums
    (vectorized — the recurrence telescopes, unlike general LPC)."""
    if order == 0:
        return res.copy()
    x = res
    for k in range(order - 1, -1, -1):
        seed = int(np.diff(warm, n=k)[-1])
        x = seed + np.cumsum(x)
    return np.concatenate([warm, x])


def _read_subframe(r: _Reader, n: int, bps: int) -> np.ndarray:
    if r.bits(1):
        raise ValueError("flac: subframe padding bit set")
    t = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if t == 0b000000:                  # CONSTANT
        out = np.full(n, r.signed(eff), dtype=np.int64)
    elif t == 0b000001:                # VERBATIM
        out = np.array([r.signed(eff) for _ in range(n)],
                       dtype=np.int64)
    elif 0b001000 <= t <= 0b001100:    # FIXED order 0-4
        order = t & 0x07
        if order > n:
            raise ValueError("flac: predictor order exceeds block")
        warm = np.array([r.signed(eff) for _ in range(order)],
                        dtype=np.int64)
        res = _read_residual(r, n, order)
        out = _reconstruct_fixed(warm, res, order)
    elif t & 0b100000:                 # LPC, order-1 in low 5 bits
        order = (t & 0x1F) + 1
        if order > n:
            raise ValueError("flac: predictor order exceeds block")
        warm = [r.signed(eff) for _ in range(order)]
        prec = r.bits(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [r.signed(prec) for _ in range(order)]
        res = _read_residual(r, n, order)
        out_l = list(warm)
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += coefs[j] * out_l[i - 1 - j]
            out_l.append(int(res[i - order]) + (acc >> shift))
        out = np.array(out_l, dtype=np.int64)
    else:
        raise ValueError(f"flac: reserved subframe type {t:06b}")
    if wasted:
        out <<= wasted
    return out


_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24,
              0b111: 32}
_SR_CODES = {0b0001: 88200, 0b0010: 176400, 0b0011: 192000,
             0b0100: 8000, 0b0101: 16000, 0b0110: 22050,
             0b0111: 24000, 0b1000: 32000, 0b1001: 44100,
             0b1010: 48000, 0b1011: 96000}


def flac_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a FLAC stream → (sample_rate, channels,
    bits_per_sample, interleaved signed little-endian PCM). Every
    frame-header CRC-8, every frame CRC-16 and the STREAMINFO MD5
    are verified — corruption fails LOUDLY, never silently."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC stream marker")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type 127")
        pos += 4 + blen
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("flac: missing/malformed STREAMINFO")
    packed = int.from_bytes(streaminfo[10:18], "big")
    sr_si = packed >> 44
    channels_si = ((packed >> 41) & 0x7) + 1
    bps_si = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    md5_si = streaminfo[18:34]

    chans_acc: list[list[np.ndarray]] = [[] for _ in range(channels_si)]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        if pos + 2 > len(data):
            break
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("flac: lost frame sync")
        variable = bool(data[pos + 1] & 0x01)
        b2, b3 = data[pos + 2], data[pos + 3]
        bs_code, sr_code = b2 >> 4, b2 & 0x0F
        ch_code, sz_code = b3 >> 4, (b3 >> 1) & 0x07
        if b3 & 1:
            raise ValueError("flac: reserved frame-header bit set")
        p, hpos = _read_utf8_number(data, pos + 4)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        if bs_code == 0b0110:
            n = data[hpos] + 1
            hpos += 1
        elif bs_code == 0b0111:
            n = struct.unpack(">H", data[hpos:hpos + 2])[0] + 1
            hpos += 2
        elif bs_code == 0b0001:
            n = 192
        elif bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 0:
            sr = sr_si
        elif sr_code in _SR_CODES:
            sr = _SR_CODES[sr_code]
        elif sr_code == 0b1100:
            sr = data[hpos] * 1000
            hpos += 1
        elif sr_code in (0b1101, 0b1110):
            v = struct.unpack(">H", data[hpos:hpos + 2])[0]
            sr = v if sr_code == 0b1101 else v * 10
            hpos += 2
        else:
            raise ValueError("flac: invalid sample-rate code")
        bps = bps_si if sz_code == 0 else _BPS_CODES.get(sz_code)
        if bps is None:
            raise ValueError("flac: reserved sample-size code")
        if crc8(data[pos:hpos]) != data[hpos]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        hpos += 1

        if ch_code <= 0b0111:
            nch, decor = ch_code + 1, None
        elif ch_code <= 0b1010:
            nch, decor = 2, ch_code
        else:
            raise ValueError("flac: reserved channel assignment")
        if nch != channels_si:
            raise ValueError("flac: frame channel count differs from "
                             "STREAMINFO")
        r = _Reader(data, hpos)
        subs = []
        for c in range(nch):
            ebps = bps
            # the SIDE channel carries one extra bit (§9.2.2)
            if (decor == 0b1000 and c == 1) \
                    or (decor == 0b1001 and c == 0) \
                    or (decor == 0b1010 and c == 1):
                ebps += 1
            subs.append(_read_subframe(r, n, ebps))
        r.align()
        fend = r.byte_pos()
        fcrc = struct.unpack(">H", data[fend:fend + 2])[0]
        if crc16(data[pos:fend]) != fcrc:
            raise ValueError("flac: frame CRC-16 mismatch")
        if decor == 0b1000:            # left/side: R = L - S
            subs = [subs[0], subs[0] - subs[1]]
        elif decor == 0b1001:          # right/side: L = R + S
            subs = [subs[1] + subs[0], subs[1]]
        elif decor == 0b1010:          # mid/side (§9.2.2)
            mid, side = subs
            l = mid * 2 + (side & 1)
            subs = [(l + side) >> 1, (l - side) >> 1]
        for c in range(nch):
            chans_acc[c].append(subs[c])
        got += n
        pos = fend + 2

    if total and got != total:
        raise ValueError(f"flac: stream ended after {got} of {total} "
                         "samples")
    chans = [np.concatenate(a) if a else np.zeros(0, np.int64)
             for a in chans_acc]
    inter = np.empty(got * channels_si, dtype=np.int64)
    for c in range(channels_si):
        inter[c::channels_si] = chans[c]
    if bps_si == 8:
        pcm = inter.astype(np.int8).tobytes()
    elif bps_si == 16:
        pcm = inter.astype("<i2").tobytes()
    else:
        pcm = inter.astype("<i4").tobytes()
    if md5_si != bytes(16) and hashlib.md5(pcm).digest() != md5_si:
        raise ValueError("flac: decoded-stream MD5 mismatch")
    return sr_si, channels_si, bps_si, pcm
