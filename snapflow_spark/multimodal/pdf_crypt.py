"""PDF standard security handler (ISO 32000-1 §7.6; 32000-2 for R6)
— pure stdlib, built for the crawl case: files encrypted with an
EMPTY user password (the overwhelmingly common form in the wild —
"owner-locked" PDFs that any reader opens without prompting) should
yield their text; anything else should yield a clean ``encrypted``
flag instead of silent garbage.

Pieces, all from the public specs:

- **RC4** — the original PDF stream cipher (R2: 40-bit, R3/R4 up to
  128-bit keys).
- **AES-128/256-CBC** (FIPS 197 + §7.6.2's 16-byte-IV-prefix
  convention): the S-box is COMPUTED (GF(2^8) inverse + affine
  transform) rather than pasted, key expansion and the inverse
  cipher follow the spec's structure. Encrypt exists because (a) the
  R6 key-derivation hash iterates AES-CBC-encrypt and (b) the
  encoder twin needs to MAKE encrypted fixtures.
- **Key derivation / password verification**:
  - R2-R4 (Algorithms 2, 4, 5): MD5 over padded password + /O + /P +
    /ID[0] (+ FFFFFFFF when metadata is unencrypted), 50x re-MD5 for
    R3/R4; /U check via RC4 (R2) or the 19-round XOR-key RC4 chain.
  - R5/R6 (Algorithm 2.A/2.B): SHA-256 over password + validation
    salt (R6 iterates the SHA-256/384/512 + AES-CBC loop), file key
    unwrapped from /UE with AES-256-CBC (zero IV, no padding).
- **Per-object keys** (Algorithm 1): MD5(file_key + objnum[0:3] +
  gen[0:2] [+ 'sAlT' for AES]) truncated to min(n+5, 16); R5/R6 use
  the file key directly (Algorithm 1.A).

Throughput note: pure-python AES runs ~1 MB/s per core; the Spark
surface stays Arrow-batched map-only, so decryption parallelizes
across executors like every other decode in this package. Crawl
pipelines that need more should route through the external-decoder
hook, as with the media codecs.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "PdfCrypt",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "build_standard_encryption",
    "rc4",
]

# --------------------------------------------------------------- RC4


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = ch ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------- AES core
# FIPS 197. The S-box is computed from the field definition (an
# affine transform of the GF(2^8) multiplicative inverse, modulus
# x^8+x^4+x^3+x+1) so the table is derived, not transcribed.


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses via exp/log tables on generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    sbox = [0] * 256
    for v in range(256):
        inv = 0 if v == 0 else exp[(255 - log[v]) % 255]
        # affine transform: b ^ rotl(b,1..4) ^ 0x63
        s = inv
        for r in (1, 2, 3, 4):
            s ^= ((inv << r) | (inv >> (8 - r))) & 0xFF
        sbox[v] = s ^ 0x63
    inv_sbox = [0] * 256
    for v, s in enumerate(sbox):
        inv_sbox[s] = v
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_MUL2 = [_gf_mul(x, 2) for x in range(256)]
_MUL3 = [_gf_mul(x, 3) for x in range(256)]
_MUL9 = [_gf_mul(x, 9) for x in range(256)]
_MUL11 = [_gf_mul(x, 11) for x in range(256)]
_MUL13 = [_gf_mul(x, 13) for x in range(256)]
_MUL14 = [_gf_mul(x, 14) for x in range(256)]


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as flat 16-byte lists (Nr+1 of them)."""
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        w = list(words[i - 1])
        if i % nk == 0:
            w = w[1:] + w[:1]
            w = [_SBOX[b] for b in w]
            w[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            w = [_SBOX[b] for b in w]
        words.append([a ^ b for a, b in zip(w, words[i - nk])])
    return [
        sum((words[4 * r + c] for c in range(4)), [])
        for r in range(nr + 1)
    ]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = [b ^ k for b, k in zip(block, rks[0])]
    nr = len(rks) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows (column-major state: s[r + 4c])
        t = [0] * 16
        for c in range(4):
            for r in range(4):
                t[r + 4 * c] = _SBOX[s[r + 4 * ((c + r) % 4)]]
        # MixColumns + AddRoundKey
        k = rks[rnd]
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c : 4 * c + 4]
            s[4 * c] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3 ^ k[4 * c]
            s[4 * c + 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3 ^ k[4 * c + 1]
            s[4 * c + 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3] ^ k[4 * c + 2]
            s[4 * c + 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3] ^ k[4 * c + 3]
    k = rks[nr]
    out = bytearray(16)
    for c in range(4):
        for r in range(4):
            out[r + 4 * c] = _SBOX[s[r + 4 * ((c + r) % 4)]] ^ k[r + 4 * c]
    return bytes(out)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[nr])]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = [0] * 16
        for c in range(4):
            for r in range(4):
                t[r + 4 * ((c + r) % 4)] = _INV_SBOX[s[r + 4 * c]]
        # AddRoundKey + InvMixColumns
        k = rks[rnd]
        for c in range(4):
            a = [t[4 * c + r] ^ k[4 * c + r] for r in range(4)]
            s[4 * c] = _MUL14[a[0]] ^ _MUL11[a[1]] ^ _MUL13[a[2]] ^ _MUL9[a[3]]
            s[4 * c + 1] = _MUL9[a[0]] ^ _MUL14[a[1]] ^ _MUL11[a[2]] ^ _MUL13[a[3]]
            s[4 * c + 2] = _MUL13[a[0]] ^ _MUL9[a[1]] ^ _MUL14[a[2]] ^ _MUL11[a[3]]
            s[4 * c + 3] = _MUL11[a[0]] ^ _MUL13[a[1]] ^ _MUL9[a[2]] ^ _MUL14[a[3]]
    k = rks[0]
    out = bytearray(16)
    for c in range(4):
        for r in range(4):
            out[r + 4 * c] = _INV_SBOX[s[r + 4 * ((c - r) % 4)]] ^ k[r + 4 * c]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC; PKCS#7 padding unless ``pad=False`` (then len(data)
    must be a block multiple — the R6 KDF and key-unwrap convention)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs block-aligned input")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC decrypt; strips PKCS#7 padding unless ``pad=False``.
    Tolerant of crawl damage: a non-block-multiple tail is truncated,
    an invalid pad byte is left in place (never raises on garbage)."""
    data = data[: len(data) - len(data) % 16]
    if not data:
        return b""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(x ^ y for x, y in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    if pad and out:
        n = out[-1]
        if 1 <= n <= 16 and len(out) >= n:
            out = out[:-n]
    return bytes(out)


# ----------------------------------------- standard security handler

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)  # the spec's 32-byte password pad (ISO 32000-1 Table 3, §7.6.3.3)


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated KDF hash. R5
    (the withdrawn Adobe extension) is the plain SHA-256 prefix of
    the same call shape (handled by the caller)."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e).digest()
            if mod == 0
            else hashlib.sha384(e).digest()
            if mod == 1
            else hashlib.sha512(e).digest()
        )
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def build_standard_encryption(
    mode: str,
    id0: bytes,
    user_password: bytes = b"",
    owner_password: bytes = b"",
    p: int = -44,
) -> tuple[dict, "PdfCrypt"]:
    """Standard-security-handler artifacts for the ENCODER twin:
    (the /Encrypt dictionary's entries, an authenticated PdfCrypt
    ready to encrypt strings/streams). ``mode`` ∈ {'rc4-40',
    'rc4-128', 'aes-128', 'aes-256'} ↔ R2 / R3 / V4-R4-AESV2 /
    V5-R6-AESV3. Deterministic (salts and the R6 file key derive from
    ``id0``), so fixtures are reproducible."""
    modes = {
        "rc4-40": (1, 2, 40),
        "rc4-128": (2, 3, 128),
        "aes-128": (4, 4, 128),
        "aes-256": (5, 6, 256),
    }
    if mode not in modes:
        raise ValueError(f"encrypt mode must be one of {sorted(modes)}")
    v, r, length = modes[mode]
    p32 = p & 0xFFFFFFFF
    opwd = owner_password or user_password

    if r <= 4:
        # Algorithm 3: /O from the owner password
        n = length // 8
        h = hashlib.md5((opwd + _PAD)[:32]).digest()
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:n]).digest()
        okey = h[:n]
        o = rc4(okey, (user_password + _PAD)[:32])
        if r >= 3:
            for i in range(1, 20):
                o = rc4(bytes(b ^ i for b in okey), o)
        entries: dict = {"V": v, "R": r, "Length": length, "O": o, "P": p32}
        if v == 4:
            entries["CF"] = {"StdCF": {"CFM": "AESV2", "Length": 16}}
            entries["StmF"] = "StdCF"
            entries["StrF"] = "StdCF"
        # Algorithm 2 + 4/5: file key, then /U
        probe = PdfCrypt({**entries, "U": b"\x00" * 32}, id0)
        key = probe._file_key_r234(user_password)
        if r == 2:
            u = rc4(key, _PAD)
        else:
            u = rc4(key, hashlib.md5(_PAD + id0).digest())
            for i in range(1, 20):
                u = rc4(bytes(b ^ i for b in key), u)
            u = (u + b"\x00" * 16)[:32]
        entries["U"] = u
        crypt = PdfCrypt(entries, id0)
        if not crypt.authenticate(user_password):
            raise AssertionError("twin self-check: U verification failed")
        return entries, crypt

    # R6 (Algorithm 8/9/10); deterministic salts + file key from id0
    seed = hashlib.sha256(b"snapflow-pdf-twin" + id0).digest()
    file_key = hashlib.sha256(seed + b"file-key").digest()
    vs, ks = seed[:8], seed[8:16]
    ovs, oks = seed[16:24], seed[24:32]
    upwd = user_password[:127]
    u = _hash_2b(upwd, vs, b"") + vs + ks
    ue = aes_cbc_encrypt(
        _hash_2b(upwd, ks, b""), b"\x00" * 16, file_key, pad=False
    )
    op = opwd[:127]
    o = _hash_2b(op, ovs, u) + ovs + oks
    oe = aes_cbc_encrypt(
        _hash_2b(op, oks, u), b"\x00" * 16, file_key, pad=False
    )
    perms = aes_cbc_encrypt(
        file_key,
        b"\x00" * 16,
        struct.pack("<I", p32) + b"\xff\xff\xff\xffTadbsnap"[:12],
        pad=False,
    )
    entries = {
        "V": 5,
        "R": 6,
        "Length": 256,
        "O": o,
        "U": u,
        "OE": oe,
        "UE": ue,
        "P": p32,
        "Perms": perms,
        "CF": {"StdCF": {"CFM": "AESV3", "Length": 32}},
        "StmF": "StdCF",
        "StrF": "StdCF",
    }
    crypt = PdfCrypt(entries, id0)
    if not crypt.authenticate(user_password):
        raise AssertionError("twin self-check: R6 U verification failed")
    return entries, crypt


class PdfCrypt:
    """Decryptor for one document, bound to its /Encrypt dict + first
    file ID. ``authenticate()`` tries the EMPTY user password;
    ``ok`` says whether string/stream decryption is available.

    ``decrypt_string`` / ``decrypt_stream`` take the CONTAINING
    indirect object's (num, gen) — Algorithm 1's per-object key.
    """

    def __init__(self, enc: dict, id0: bytes):
        self.v = int(enc.get("V") or 0)
        self.r = int(enc.get("R") or 2)
        self.length = int(enc.get("Length") or 40)
        self.o = bytes(enc.get("O") or b"")
        self.u = bytes(enc.get("U") or b"")
        self.oe = bytes(enc.get("OE") or b"")
        self.ue = bytes(enc.get("UE") or b"")
        self.p = int(enc.get("P") or 0) & 0xFFFFFFFF
        self.id0 = id0 or b""
        self.encrypt_metadata = enc.get("EncryptMetadata")
        self.ok = False
        self.key = b""
        # V4/V5 crypt filters: what do streams/strings use?
        self.stm_cfm = self.str_cfm = "V2" if self.v in (1, 2) else None
        if self.v in (4, 5):
            cf = enc.get("CF") or {}
            names = {"Identity": "Identity"}
            if isinstance(cf, dict):
                for name, d in cf.items():
                    if isinstance(d, dict):
                        names[str(name)] = str(d.get("CFM") or "None")
            self.stm_cfm = names.get(str(enc.get("StmF") or "Identity"))
            self.str_cfm = names.get(str(enc.get("StrF") or "Identity"))

    # ---------------------------------------------------- key setup
    def authenticate(self, password: bytes = b"") -> bool:
        """Empty (or given) USER password, per revision. Sets
        ``self.key`` and ``self.ok`` on success."""
        if self.stm_cfm is None or self.str_cfm is None:
            # Unknown/unsupported V (e.g. the unpublished V=3) or an
            # unrecognized crypt-filter name: decryption would fall
            # through as Identity and emit ciphertext — report locked.
            return False
        try:
            if self.r in (2, 3, 4):
                return self._auth_rc4_family(password)
            if self.r in (5, 6):
                return self._auth_aes256(password)
        except Exception:
            return False
        return False

    def _file_key_r234(self, password: bytes) -> bytes:
        padded = (password + _PAD)[:32]
        h = hashlib.md5(padded + self.o[:32] + struct.pack("<I", self.p) + self.id0)
        if self.r >= 4 and self.encrypt_metadata is False:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        n = 5 if self.r == 2 else max(5, min(16, self.length // 8))
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def _auth_rc4_family(self, password: bytes) -> bool:
        key = self._file_key_r234(password)
        if self.r == 2:
            u_want = rc4(key, _PAD)
        else:  # Algorithm 5: MD5(pad + ID0), 20 XOR-key RC4 rounds
            h = hashlib.md5(_PAD + self.id0).digest()
            u_want = rc4(key, h)
            for i in range(1, 20):
                u_want = rc4(bytes(b ^ i for b in key), u_want)
        got = self.u[:32]
        match = got[:16] == u_want[:16] if self.r >= 3 else got == u_want
        if match:
            self.key, self.ok = key, True
        return match

    def _auth_aes256(self, password: bytes) -> bool:
        # /U = hash(32) + validation salt(8) + key salt(8)
        if len(self.u) < 48:
            return False
        h48, vsalt, ksalt = self.u[:32], self.u[32:40], self.u[40:48]
        pwd = password[:127]
        if self.r == 5:
            ok = hashlib.sha256(pwd + vsalt).digest() == h48
            ikey = hashlib.sha256(pwd + ksalt).digest()
        else:
            ok = _hash_2b(pwd, vsalt, b"") == h48
            ikey = _hash_2b(pwd, ksalt, b"")
        if not ok:
            return False
        self.key = aes_cbc_decrypt(ikey, b"\x00" * 16, self.ue[:32], pad=False)
        self.ok = len(self.key) == 32
        return self.ok

    # ------------------------------------------------- per-object use
    def _obj_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.r >= 5:
            return self.key  # Algorithm 1.A: the file key, directly
        ext = b"sAlT" if aes else b""
        h = hashlib.md5(
            self.key
            + struct.pack("<I", num)[:3]
            + struct.pack("<I", gen)[:2]
            + ext
        ).digest()
        return h[: min(len(self.key) + 5, 16)]

    def _apply(self, cfm: str | None, num: int, gen: int, data: bytes) -> bytes:
        if not self.ok or cfm in (None, "Identity", "None"):
            return data
        if cfm == "V2":
            return rc4(self._obj_key(num, gen, aes=False), data)
        if cfm in ("AESV2", "AESV3"):
            if len(data) < 16:
                return b""
            return aes_cbc_decrypt(
                self._obj_key(num, gen, aes=True), data[:16], data[16:]
            )
        return data

    def decrypt_stream(self, num: int, gen: int, raw: bytes) -> bytes:
        return self._apply(self.stm_cfm, num, gen, raw)

    def decrypt_string(self, num: int, gen: int, raw: bytes) -> bytes:
        return self._apply(self.str_cfm, num, gen, raw)

    # ----------------------------------------------- encoder support
    # Used by make_pdf_bytes to produce real encrypted fixtures; the
    # encrypt direction mirrors _apply.
    def encrypt_stream(self, num: int, gen: int, data: bytes, iv: bytes = b"\x00" * 16) -> bytes:
        if self.stm_cfm == "V2":
            return rc4(self._obj_key(num, gen, aes=False), data)
        if self.stm_cfm in ("AESV2", "AESV3"):
            return iv + aes_cbc_encrypt(
                self._obj_key(num, gen, aes=True), iv, data
            )
        return data

    def encrypt_string(self, num: int, gen: int, data: bytes, iv: bytes = b"\x00" * 16) -> bytes:
        if self.str_cfm == "V2":
            return rc4(self._obj_key(num, gen, aes=False), data)
        if self.str_cfm in ("AESV2", "AESV3"):
            return iv + aes_cbc_encrypt(
                self._obj_key(num, gen, aes=True), iv, data
            )
        return data
