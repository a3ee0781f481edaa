"""Baseline JPEG codec — stdlib + numpy, no Pillow.

JPEG is the dominant web image format; without it the multimodal tier's
real-decode story has a hole in exactly the place a crawl corpus is
densest (VERDICT r5 item 6).  This module implements the baseline
sequential DCT process from the public ITU-T T.81 spec:

- decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS marker walk, Huffman
  entropy decode (with 0xFF00 destuffing and RSTn restart handling),
  dequantize + dezigzag, IDCT over ALL blocks in one numpy einsum,
  nearest-neighbour chroma upsampling (exact for the block-constant
  plants; real photos differ from libjpeg's fancy upsampler by <=1 LSB
  per edge pixel), JFIF YCbCr->RGB.  Grayscale (1 component) and color
  (3 components, any h/v sampling factors up to 2, i.e. 4:4:4 / 4:2:2 /
  4:2:0) are supported; progressive (SOF2), arithmetic coding and 12-bit
  depth raise ValueError so `decode_image` falls through honestly.
- encoder (tests/benches need planted JPEGs): RGB->YCbCr, optional 2x2
  chroma box subsampling, FDCT, quantization (default: all-ones tables =
  near-lossless), zigzag, DC-diff + run/size AC Huffman coding with the
  spec's Annex K typical tables, byte stuffing, single interleaved scan.

Exactness contract for oracles: an 8x8-block-constant GRAYSCALE image
encoded with all-ones quant tables round-trips BIT-EXACTLY (a constant
block has only a DC coefficient; DC = 8*(v-128) is an exact integer,
IDCT of a DC-only block is constant, and the final np.round kills the
float residue of (1/sqrt(2))^2) — so planted-JPEG pixel sums can be
replayed from the planting formula in SQL, the same oracle discipline as
the PPM/BMP/PNG rows.  Color round-trips are NOT exact in general (the
RGB<->YCbCr integer rounding), pinned by tolerance tests instead.

The per-symbol Huffman loop is interpreted Python — fine for the
metadata/fingerprint path (Pillow remains the bulk-decode fast path when
installed, same posture as the PNG codec); the DCT/upsample/color math
is all vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8-point DCT-II basis: B[u, x] = a(u) cos((2x+1) u pi / 16),
# a(0)=sqrt(1/8), a(u>0)=sqrt(2/8); spatial = B.T @ coef @ B
_B = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _B[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K (ITU-T T.81, K.3.3) typical Huffman tables: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _build_codes(bits: list[int], values: list[int]) -> dict[int, int]:
    """value -> (length << 16 | code), canonical JPEG code assignment."""
    out: dict[int, int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length << 16) | code
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], values: list[int]) -> dict[int, int]:
    """(length << 16 | code) -> value, for bit-serial decoding."""
    out: dict[int, int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length << 16) | code] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    destuffing done up front (RSTn markers are split out by the caller)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, seg: bytes):
        self.data = seg.replace(b"\xff\x00", b"\xff")
        self.pos = 0
        self.nbits = 8 * len(self.data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("truncated entropy segment")
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(n):
            out = (out << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out

    def read_code(self, table: dict[int, int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            val = table.get((length << 16) | code)
            if val is not None:
                return val
        raise ValueError("bad Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size` raw bits to the signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(blob: bytes) -> tuple[int, int, str, np.ndarray]:
    """Baseline sequential JPEG -> (w, h, 'JPEG', HxWxC uint8)."""
    if len(blob) < 4 or blob[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[int, int]] = {}
    sof = None
    restart = 0
    scan = None
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError("marker sync lost")
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        length = struct.unpack_from(">H", blob, i + 2)[0]
        seg = blob[i + 4 : i + 2 + length]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                n = 64 * (2 if pq else 1)
                raw = seg[j + 1 : j + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                qt[tq] = tbl
                j += 1 + n
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG process unsupported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            stabs = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                stabs.append((cs, tt >> 4, tt & 15))
            ecs_start = i + 2 + length
            scan = (stabs, ecs_start)
            break
        i += 2 + length
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    w, h, comps = sof
    stabs, ecs_start = scan
    if len(comps) not in (1, 3):
        raise ValueError("1 or 3 components only")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # carve the entropy stream into restart intervals
    j = ecs_start
    segs: list[bytes] = []
    start = j
    while j < len(blob) - 1:
        if blob[j] == 0xFF and blob[j + 1] != 0x00:
            m = blob[j + 1]
            if 0xD0 <= m <= 0xD7:  # RSTn
                segs.append(blob[start:j])
                j += 2
                start = j
                continue
            segs.append(blob[start:j])
            start = None
            break
        j += 1
    if start is not None:
        segs.append(blob[start:])

    # per-component dequantized coefficient planes, block-major
    order = []  # interleave order: (comp_idx, block row in MCU, block col)
    for ci, (_cid, ch, cv, _tq) in enumerate(comps):
        for by in range(cv):
            for bx in range(ch):
                order.append((ci, by, bx))
    nblk = [mcux * mcuy * c[1] * c[2] for c in comps]
    coefs = [np.zeros((n, 64), dtype=np.int32) for n in nblk]
    stab_of = {cs: (td, ta) for cs, td, ta in stabs}

    reader = _BitReader(segs.pop(0))
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    mcu = 0
    while mcu < n_mcu:
        if restart and mcu and mcu % restart == 0:
            reader = _BitReader(segs.pop(0))
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, by, bx in order:
            cid, ch, cv, tq = comps[ci]
            td, ta = stab_of[cid]
            dct, act = huff[(0, td)], huff[(1, ta)]
            block = np.zeros(64, dtype=np.int32)
            size = reader.read_code(dct)
            pred[ci] += _extend(reader.read(size), size)
            block[0] = pred[ci]
            k = 1
            while k < 64:
                rs = reader.read_code(act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run overflow")
                block[k] = _extend(reader.read(s), s)
                k += 1
            row = my * cv + by
            col = mx * ch + bx
            coefs[ci][row * (mcux * ch) + col] = block * qt[tq]
        mcu += 1

    # vectorized inverse transform per component
    planes = []
    for ci, (_cid, ch, cv, _tq) in enumerate(comps):
        bw, bh = mcux * ch, mcuy * cv
        z = np.zeros((len(coefs[ci]), 64), dtype=np.float64)
        z[:, ZIGZAG] = coefs[ci]
        blocks = z.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _B, blocks, _B)
        px = np.round(spatial + 128).clip(0, 255).astype(np.uint8)
        plane = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # nearest-neighbour upsample to full MCU-grid resolution
        if ch != hmax or cv != vmax:
            plane = plane.repeat(vmax // cv, axis=0).repeat(
                hmax // ch, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return w, h, "JPEG", planes[0][:, :, None]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return w, h, "JPEG", np.round(rgb).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 -> (nblocks, 64) zigzagged quantized int32."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    )
    coef = np.einsum("ux,nxy,vy->nuv", _B, blocks, _B).reshape(-1, 64)
    zz = coef[:, ZIGZAG]
    return np.round(zz / q[None, :]).astype(np.int32)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _emit_block(wtr: _BitWriter, zz: np.ndarray, pred: int,
                dc: dict[int, int], ac: dict[int, int]) -> int:
    diff = int(zz[0]) - pred
    s = _csize(diff)
    lc = dc[s]
    wtr.write(lc & 0xFFFF, lc >> 16)
    if s:
        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl = ac[0xF0]
            wtr.write(zrl & 0xFFFF, zrl >> 16)
            run -= 16
        s = _csize(v)
        code = ac[(run << 4) | s]
        wtr.write(code & 0xFFFF, code >> 16)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        eob = ac[0x00]
        wtr.write(eob & 0xFFFF, eob >> 16)
    return int(zz[0])


def encode_jpeg(
    px: np.ndarray,
    quant: np.ndarray | int | None = None,
    subsampling: str = "444",
) -> bytes:
    """Encode HxW (gray) or HxWx3 (RGB) uint8 to baseline JFIF.

    quant: None -> all-ones tables (near-lossless; EXACT for 8x8-block-
    constant grayscale inputs, see module docstring), an int -> that
    constant in every slot, or a 64-long zigzag-order array."""
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    if quant is None:
        quant = 1
    q = (
        np.full(64, int(quant), dtype=np.int32)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int32).reshape(64)
    )
    h, w = px.shape[:2]

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [px]
    else:
        fpx = px.astype(np.float64)
        y = 0.299 * fpx[:, :, 0] + 0.587 * fpx[:, :, 1] + 0.114 * fpx[:, :, 2]
        cb = 128.0 - 0.168736 * fpx[:, :, 0] - 0.331264 * fpx[:, :, 1] \
            + 0.5 * fpx[:, :, 2]
        cr = 128.0 + 0.5 * fpx[:, :, 0] - 0.418688 * fpx[:, :, 1] \
            - 0.081312 * fpx[:, :, 2]
        y, cb, cr = (np.round(p).clip(0, 255).astype(np.uint8)
                     for p in (y, cb, cr))
        if subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            cb = _box2(cb)
            cr = _box2(cr)
        elif subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
        planes = [y, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    zz_planes = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        tw, th = mcux * ch * 8, mcuy * cv * 8
        padded = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        zz_planes.append(_fdct_quant(padded, q))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + b"\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (one table id 0; chroma reuses it — tq 1 maps to the same values)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" \
        + bytes(int(v) for v in q)
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01" \
            + bytes(int(v) for v in q)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                     len(comps))
    for cid, ch, cv, tq in comps:
        out += bytes([cid, (ch << 4) | cv, tq])
    # DHT
    for tc, th_, (bits, vals) in (
        [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
        + ([] if gray else [(0, 1, _DC_CHR), (1, 1, _AC_CHR)])
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 2 + 1 + 16 + len(vals)
        ) + bytes([(tc << 4) | th_]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for ci, (cid, _ch, _cv, _tq) in enumerate(comps):
        tabs = 0 if ci == 0 else 0x11
        out += bytes([cid, tabs])
    out += b"\x00\x3f\x00"

    dc_lum, ac_lum = _build_codes(*_DC_LUM), _build_codes(*_AC_LUM)
    dc_chr, ac_chr = _build_codes(*_DC_CHR), _build_codes(*_AC_CHR)
    wtr = _BitWriter()
    pred = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (cid, ch, cv, _tq) in enumerate(comps):
            dct, act = (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
            for by in range(cv):
                for bx in range(ch):
                    row = my * cv + by
                    col = mx * ch + bx
                    zz = zz_planes[ci][row * (mcux * ch) + col]
                    pred[ci] = _emit_block(wtr, zz, pred[ci], dct, act)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample (edge-padded to even dims first)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.int32)
    return (
        (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2)
        // 4
    ).astype(np.uint8)
