"""Telephony audio codecs for RIFF/WAVE, pure numpy: G.711 µ-law
(wave format 7) and A-law (format 6) companding, and IMA/DVI4 ADPCM
(format 0x11) — the three compressed-audio encodings that are pure
integer arithmetic (public specs: ITU-T G.711 1988; IMA Digital Audio
Focus group "Recommended Practices for Enhancing Digital Audio
Compatibility", 1992 — the step/index tables below are the published
constants). Telephony corpora (call-center speech, Switchboard-style
datasets) ship exactly these formats inside WAV.

Decoders are table-driven and fully vectorized (one fancy-index per
buffer for G.711; ADPCM is sequential per block by nature — the loop
runs per 4-bit nibble with numpy doing the nibble unpacking).
Encoders: G.711 quantizes to the NEAREST reconstruction level via
binary search over the sorted 256-entry decode table — the optimal
quantizer for the fixed G.711 codebook, so decode(encode(x)) is the
closest representable level and decode∘encode is idempotent; ADPCM is
the standard predict/step loop. Round-trips are pinned in tests."""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "alaw_decode",
    "alaw_encode",
    "ima_adpcm_decode_block",
    "ima_adpcm_encode",
    "mulaw_decode",
    "mulaw_encode",
]


def _mulaw_table() -> np.ndarray:
    """Sun/CCITT ulaw2linear for all 256 codes -> int16 (±32124)."""
    code = np.arange(256, dtype=np.int32)
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """Sun/CCITT alaw2linear for all 256 codes -> int16 (±32256):
    seg 0 -> base+8, seg 1 -> base+0x108, seg k>=2 -> (base+0x108)
    << (k-1), sign from the (xor-0x55-toggled) top bit."""
    code = np.arange(256, dtype=np.int32)
    a = code ^ 0x55
    base = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    mag = np.where(
        seg == 0,
        base + 8,
        np.where(seg == 1, base + 0x108, (base + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


_MULAW = _mulaw_table()
_ALAW = _alaw_table()


def _nearest_encoder(table: np.ndarray):
    """code = argmin |x - table[code]|, vectorized: binary-search the
    sorted levels, compare the two bracketing neighbors, map back to
    the code byte. Ties take the lower level (deterministic)."""
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int32)

    def enc(x: np.ndarray) -> np.ndarray:
        v = np.asarray(x, dtype=np.int32).ravel()
        hi = np.searchsorted(levels, v, side="left")
        hi = np.clip(hi, 0, len(levels) - 1)
        lo = np.maximum(hi - 1, 0)
        pick = np.where(
            np.abs(levels[hi] - v) < np.abs(v - levels[lo]), hi, lo
        )
        return order[pick].astype(np.uint8)

    return enc


_MULAW_ENC = _nearest_encoder(_MULAW)
_ALAW_ENC = _nearest_encoder(_ALAW)


def mulaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    return _MULAW[np.frombuffer(bytes(data), dtype=np.uint8)]


def mulaw_encode(samples: np.ndarray) -> bytes:
    return _MULAW_ENC(samples).tobytes()


def alaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    return _ALAW[np.frombuffer(bytes(data), dtype=np.uint8)]


def alaw_encode(samples: np.ndarray) -> bytes:
    return _ALAW_ENC(samples).tobytes()


# ------------------------------------------------------------------ #
# IMA ADPCM (DVI4 nibbles; WAV format 0x11 block layout)
# ------------------------------------------------------------------ #
_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _adpcm_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    step = int(_STEP[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_INDEX[nibble & 7])))
    return pred, index


def _encode_nibble(pred: int, index: int, sample: int) -> tuple[int, int, int]:
    step = int(_STEP[index])
    delta = sample - pred
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    pred, index = _adpcm_step(pred, index, nibble)
    return nibble, pred, index


def ima_adpcm_decode_block(
    data: bytes, ch: int, samples_per_block: int
) -> np.ndarray:
    """One WAV-layout block -> (samples_per_block_or_fewer, ch) int16.
    Layout: per-channel 4-byte headers (pred i16 LE, index u8, pad),
    then nibble words interleaved 4 bytes per channel; low nibble
    first. The header predictor IS the block's first sample."""
    preds = []
    idxs = []
    for c in range(ch):
        p, i, _r = struct.unpack_from("<hBB", data, c * 4)
        if i > 88:
            raise ValueError(f"ADPCM step index {i} out of range")
        preds.append(p)
        idxs.append(i)
    body = np.frombuffer(data, np.uint8, offset=4 * ch)
    # per-channel nibble streams from the 4-byte interleave
    words = body.reshape(-1, ch, 4)  # (groups, ch, 4 bytes)
    # A malformed fmt chunk can declare more samples_per_block than
    # block_align supplies nibbles for; size the output by what the
    # block actually carries (docstring: "samples_per_block_or_fewer")
    # so no row is ever returned uninitialized.
    n_rows = min(samples_per_block, words.shape[0] * 8 + 1)
    out = np.empty((n_rows, ch), np.int16)
    for c in range(ch):
        stream = words[:, c, :].reshape(-1)
        nibs = np.empty(stream.size * 2, np.uint8)
        nibs[0::2] = stream & 0x0F
        nibs[1::2] = stream >> 4
        pred, index = preds[c], idxs[c]
        out[0, c] = pred
        col = out[:, c]
        for k in range(n_rows - 1):
            pred, index = _adpcm_step(pred, index, int(nibs[k]))
            col[k + 1] = pred
    return out


def ima_adpcm_encode(
    samples: np.ndarray, samples_per_block: int = 257
) -> tuple[bytes, int]:
    """(n, ch) int16 -> (raw block bytes, block_align). The step
    index carries across blocks (each block header re-states the
    running predictor and index, as the IMA recommended practice
    encoder does); samples_per_block must be 8k+1 so nibble words
    fill exactly."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 8k+1")
    data_bytes_per_ch = (samples_per_block - 1) // 2
    block_align = ch * (4 + data_bytes_per_ch)
    out = bytearray()
    preds = [0] * ch
    idxs = [0] * ch
    for start in range(0, n, samples_per_block):
        blk = a[start : start + samples_per_block]
        # header: first sample is transmitted verbatim
        for c in range(ch):
            preds[c] = int(blk[0, c])
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibbles = [[] for _ in range(ch)]
        for c in range(ch):
            pred, index = preds[c], idxs[c]
            for s in blk[1:, c]:
                nib, pred, index = _encode_nibble(pred, index, int(s))
                nibbles[c].append(nib)
            preds[c], idxs[c] = pred, index
            # pad the tail block to full nibble words
            nibbles[c] += [0] * (data_bytes_per_ch * 2 - len(nibbles[c]))
        # interleave 4-byte words per channel
        packed = [
            bytes(
                nibbles[c][k] | (nibbles[c][k + 1] << 4)
                for k in range(g * 8, g * 8 + 8, 2)
            )
            for g in range(data_bytes_per_ch // 4)
            for c in range(ch)
        ]
        out += b"".join(packed)
    return bytes(out), block_align
