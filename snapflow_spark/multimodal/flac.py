"""Pure-python/numpy FLAC codec (multimodal audio, SURVEY §2.B.11).

FLAC is the dominant speech-dataset container (LibriSpeech, MLS,
People's Speech ship .flac), and unlike MP3/OGG it is LOSSLESS and
needs no DSP library — just bit-level entropy work, the same honesty
bar the image side sets with the from-scratch JPEG. This module
implements the public FLAC format spec (RFC 9639 / xiph.org):

- ``decode_flac``: STREAMINFO + frame stream -> exact PCM. Handles
  CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC subframes, rice and
  rice2 residual partitions with escapes, wasted bits, all four
  channel assignments (independent, left/side, right/side, mid/side),
  UTF-8 frame numbers, every block-size/sample-rate/sample-size code,
  and the header CRC-8 / frame CRC-16 checks.
- ``encode_flac``: a correct (not size-optimal) encoder — fixed-order
  predictors with single-partition rice residuals, optional mid/side
  stereo decorrelation and an LPC mode (the order-2 fixed polynomial
  expressed as quantized LPC coefficients) so decode's LPC and
  decorrelation paths are exercised by round-trip tests, not just the
  paths our own default encoder happens to use.

Everything stays int: FLAC's predictors and rice coding are exact
integer arithmetic, so encode->decode round-trips are bit-identical
(tested property-style on random PCM).
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits > 0:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(nbits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            nbits -= take
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(w: _BitWriter, n: int) -> None:
    """FLAC frame numbers use UTF-8-style variable-length coding."""
    if n < 0x80:
        w.write(n, 8)
        return
    for total in range(2, 8):
        if n < (1 << (total * 5 + 1)) or total == 7:
            w.write((0xFF << (8 - total)) & 0xFF | (n >> (6 * (total - 1))), 8)
            for i in range(total - 2, -1, -1):
                w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_more = 0
    mask = 0x40
    while b0 & mask:
        n_more += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_more):
        b = r.read(8)
        if b >> 6 != 0b10:
            raise ValueError("bad UTF-8 coded number in FLAC frame header")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, (-res << 1) - 1).astype(np.int64)


def _rice_write(w: _BitWriter, res: np.ndarray, p: int) -> None:
    for z in _zigzag(res):
        w.write_unary(int(z) >> p)
        if p:
            w.write(int(z), p)


def _rice_read(r: _BitReader, n: int, p: int) -> list[int]:
    out = []
    for _ in range(n):
        z = (r.read_unary() << p) | (r.read(p) if p else 0)
        out.append((z >> 1) ^ -(z & 1))
    return out


def _best_rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res.astype(np.float64)).mean())
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 30:
        p += 1
    return p


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 4096,
    order: int = 2,
    mid_side: bool = True,
    lpc: bool = False,
) -> bytes:
    """(n,) or (n, ch) int16 -> FLAC bytes (16-bit, lossless).

    ``order``: fixed-predictor order 0-4. ``mid_side``: stereo pairs
    are decorrelated as mid/side (the common real-encoder choice;
    requires exactly 2 channels, ignored otherwise). ``lpc``: encode
    the order-2 polynomial as a quantized-LPC subframe instead of
    FIXED — identical residuals, exercises the decoder's LPC
    arithmetic."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"encode_flac expects (n,) or (n, ch), got {a.shape}")
    n, ch = a.shape
    if not 1 <= ch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if order not in _FIXED_COEFS:
        raise ValueError("fixed predictor order must be 0-4")
    bits = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (mandatory, last-metadata flag set)
    si = _BitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    use_ms = mid_side and ch == 2

    def subframe(w: _BitWriter, sig: np.ndarray, sbits: int) -> None:
        o = min(order, len(sig) - 1) if len(sig) > 1 else 0
        if np.all(sig == sig[0]):
            w.write(0, 1)
            w.write(0b000000, 6)  # CONSTANT
            w.write(0, 1)
            w.write(int(sig[0]), sbits)
            return
        coefs = _FIXED_COEFS[o]
        res = sig[o:].copy()
        for j, c in enumerate(coefs):  # residual = sig - prediction
            res = res - c * sig[o - 1 - j : len(sig) - 1 - j]
        if lpc and o == 2:
            w.write(0, 1)
            w.write(0b100000 | (o - 1), 6)  # LPC, order field = o-1
            w.write(0, 1)
            for k in range(o):
                w.write(int(sig[k]), sbits)
            prec = 15
            w.write(prec - 1, 4)
            w.write(0, 5)  # shift 0
            for c in coefs:
                w.write(c, prec)
        else:
            w.write(0, 1)
            w.write(0b001000 | o, 6)  # FIXED
            w.write(0, 1)
            for k in range(o):
                w.write(int(sig[k]), sbits)
        p = _best_rice_param(res)
        if p <= 14:
            w.write(0b00, 2)  # rice: 4-bit partition parameters
            pbits = 4
        else:
            w.write(0b01, 2)  # rice2: 5-bit parameters (noisy PCM)
            pbits = 5
        # partition order 0: one partition covering the whole residual
        w.write(0, 4)
        w.write(p, pbits)
        _rice_write(w, res, p)

    def channel_signals(frame: np.ndarray) -> tuple[int, list[tuple[np.ndarray, int]]]:
        if use_ms:
            left, right = frame[:, 0], frame[:, 1]
            mid = (left + right) >> 1
            side = left - right
            return 0b1010, [(mid, bits), (side, bits + 1)]
        return ch - 1, [(frame[:, c], bits) for c in range(ch)]

    frame_idx = 0
    for start in range(0, n, block_size):
        frame = a[start : start + block_size]
        bs = len(frame)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize stream
        w.write(0b0111, 4)  # block size: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        assign, signals = channel_signals(frame)
        w.write(assign, 4)
        w.write(0b100, 3)  # 16-bit samples
        w.write(0, 1)  # reserved
        _utf8_number(w, frame_idx)
        w.write(bs - 1, 16)
        w.write(_crc8(bytes(w.buf)), 8)
        for sig, sbits in signals:
            subframe(w, sig.astype(np.int64), sbits)
        w.align()
        body = w.bytes()
        out += body + _crc16(body).to_bytes(2, "big")
        frame_idx += 1
    return bytes(out)


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, channels) int32 PCM, sample_rate). Exact
    (lossless) for any stream this codec's feature set covers; 16-bit
    output fits int16 but the array is int32 so 20/24-bit streams
    decode without truncation."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        header = data[pos]
        last = header & 0x80
        btype = header & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = data[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream has no STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)
    si.read(16)
    si.read(24)
    si.read(24)
    rate = si.read(20)
    ch = si.read(3) + 1
    bits = si.read(5) + 1
    total = si.read(36)

    channels: list[list[int]] = [[] for _ in range(ch)]
    r = _BitReader(data, pos)

    def read_subframe(bs: int, sbits: int) -> list[int]:
        if r.read(1):
            raise ValueError("subframe sync error (padding bit set)")
        stype = r.read(6)
        wasted = 0
        if r.read(1):  # wasted-bits flag: unary count - 1
            wasted = r.read_unary() + 1
            sbits -= wasted
        if stype == 0b000000:  # CONSTANT
            v = r.read_signed(sbits)
            sig = [v] * bs
        elif stype == 0b000001:  # VERBATIM
            sig = [r.read_signed(sbits) for _ in range(bs)]
        elif stype >> 3 == 0b001:  # FIXED
            o = stype & 0x07
            if o > 4:
                raise ValueError(f"invalid FIXED order {o}")
            warm = [r.read_signed(sbits) for _ in range(o)]
            res = _read_residual(r, bs, o)
            sig = warm[:]
            coefs = _FIXED_COEFS[o]
            for i in range(o, bs):
                pred = sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
                sig.append(res[i - o] + pred)
        elif stype >> 5 == 0b1:  # LPC
            o = (stype & 0x1F) + 1
            warm = [r.read_signed(sbits) for _ in range(o)]
            prec = r.read(4) + 1
            if prec == 16:
                raise ValueError("invalid LPC precision escape")
            shift = r.read_signed(5)
            if shift < 0:
                raise ValueError("negative LPC shift")
            coefs = [r.read_signed(prec) for _ in range(o)]
            res = _read_residual(r, bs, o)
            sig = warm[:]
            for i in range(o, bs):
                pred = sum(c * sig[i - 1 - j] for j, c in enumerate(coefs)) >> shift
                sig.append(res[i - o] + pred)
        else:
            raise ValueError(f"reserved subframe type {stype:06b}")
        if wasted:
            sig = [v << wasted for v in sig]
        return sig

    def _read_residual(r: _BitReader, bs: int, o: int) -> list[int]:
        method = r.read(2)
        if method > 1:
            raise ValueError("reserved residual coding method")
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        po = r.read(4)
        nparts = 1 << po
        if bs % nparts:
            raise ValueError("block size not divisible by partition count")
        out: list[int] = []
        for part in range(nparts):
            cnt = bs // nparts - (o if part == 0 else 0)
            if cnt < 0:
                raise ValueError(
                    "first residual partition smaller than predictor order"
                )
            p = r.read(pbits)
            if p == escape:
                nb = r.read(5)
                out.extend(r.read_signed(nb) if nb else 0 for _ in range(cnt))
            else:
                out.extend(_rice_read(r, cnt, p))
        return out

    # total == 0 means UNKNOWN length (RFC 9639 — streamed captures):
    # decode frames until the byte stream runs out rather than
    # trusting the count
    while (total == 0 and r.byte < len(data) - 1) or (
        total > 0 and sum(len(c) for c in channels) < total * ch
    ):
        r.align()
        if total == 0 and r.byte >= len(data) - 1:
            break
        frame_start = r.byte
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        assign = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        elif sr_code and _SAMPLE_RATES[sr_code] != rate:
            raise ValueError(
                "frame sample-rate code disagrees with STREAMINFO"
            )
        if ss_code == 3:
            raise ValueError("reserved sample size code")
        sbits = bits if ss_code == 0 else _SAMPLE_SIZES[ss_code]
        # the CRC-8 field is byte-aligned by header construction and
        # covers every header byte before it
        expect_crc8 = r.read(8)
        if _crc8(data[frame_start : r.byte - 1]) != expect_crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if assign <= 7:
            n_sub = assign + 1
            sigs = [read_subframe(bs, sbits) for _ in range(n_sub)]
        elif assign == 0b1000:  # left/side
            left = read_subframe(bs, sbits)
            side = read_subframe(bs, sbits + 1)
            sigs = [left, [l - s for l, s in zip(left, side)]]
        elif assign == 0b1001:  # right/side
            side = read_subframe(bs, sbits + 1)
            right = read_subframe(bs, sbits)
            sigs = [[rr + s for rr, s in zip(right, side)], right]
        elif assign == 0b1010:  # mid/side
            mid = read_subframe(bs, sbits)
            side = read_subframe(bs, sbits + 1)
            sigs = [[], []]
            for m, s in zip(mid, side):
                left = m + ((s + (s & 1)) >> 1)
                sigs[0].append(left)
                sigs[1].append(left - s)
        else:
            raise ValueError(f"reserved channel assignment {assign:04b}")
        if len(sigs) != ch:
            raise ValueError("frame channel count != STREAMINFO channels")
        for c, sig in enumerate(sigs):
            channels[c].extend(sig)
        r.align()
        expect_crc16 = r.read(16)
        if _crc16(data[frame_start : r.byte - 2]) != expect_crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")

    n_out = total if total else len(channels[0])
    arr = np.stack(
        [np.asarray(c[:n_out], dtype=np.int32) for c in channels], axis=1
    )
    return arr, rate
