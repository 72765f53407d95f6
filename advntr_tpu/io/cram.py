"""Native CRAM 3.0 reader/writer (no pysam/htslib).

The reference accepts SAM/BAM/CRAM alignment inputs (reference
advntr_commands.py:82-84, sam_utils.py:17 — pysam mode 'rc'); this module
gives the native IO stack the same capability.  It implements the CRAM 3.0
container format directly:

- file definition, containers (ITF8/LTF8 varints, landmarks, CRC32),
  blocks (raw / gzip / bzip2 / lzma / rANS-4x8 order-0 and order-1)
- compression header: preservation map (RN/AP/RR/SM/TD), data-series
  encoding map, tag encoding map
- codecs: EXTERNAL, HUFFMAN (canonical, incl. the zero-bit single-symbol
  form htslib emits), BETA, BYTE_ARRAY_LEN, BYTE_ARRAY_STOP
- record decode in spec order with reference-based sequence reconstruction
  (substitution matrix + read features) and CIGAR rebuild

The writer emits spec-compliant CRAM (multi-ref slices, detached mates,
EXTERNAL/BYTE_ARRAY_STOP encodings, gzip blocks) so the reader is
round-trip tested without external tools.  Reads decode to the same
BamRead records the BAM/SAM readers produce.
"""

from __future__ import annotations

import bz2
import gzip
import io as _io
import lzma
import struct
import zlib

from advntr_tpu.io.bam import BamRead

CRAM_MAGIC = b"CRAM"
# spec-defined EOF container (CRAM 3.0 §9; fixed byte string)
CRAM_EOF = bytes.fromhex(
    "0f000000ffffffff0fe0454f4600000000010005bdd94f000100060601"
    "0001000100ee63014b")

BASES = "ACGTN"

# CRAM bit flags (CF)
CF_QS_STORED = 0x1
CF_DETACHED = 0x2
CF_MATE_DOWNSTREAM = 0x4
CF_NO_SEQ = 0x8

# mate flags (MF)
MF_MATE_NEG = 0x1
MF_MATE_UNMAPPED = 0x2


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------

def read_itf8(fh) -> int:
    b0 = fh.read(1)[0]
    if b0 < 0x80:
        v = b0
    elif b0 < 0xC0:
        v = ((b0 & 0x3F) << 8) | fh.read(1)[0]
    elif b0 < 0xE0:
        b = fh.read(2)
        v = ((b0 & 0x1F) << 16) | (b[0] << 8) | b[1]
    elif b0 < 0xF0:
        b = fh.read(3)
        v = ((b0 & 0x0F) << 24) | (b[0] << 16) | (b[1] << 8) | b[2]
    else:
        b = fh.read(4)
        v = ((b0 & 0x0F) << 28) | (b[0] << 20) | (b[1] << 12) \
            | (b[2] << 4) | (b[3] & 0x0F)
    # ITF8 carries int32 values; reinterpret the top bit as sign
    return v - (1 << 32) if v >= (1 << 31) else v


def write_itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF,
                      (v >> 8) & 0xFF, v & 0xFF])
    return bytes([0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF,
                  (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F])


def read_ltf8(fh) -> int:
    b0 = fh.read(1)[0]
    n_extra = 0
    for bit in range(8):
        if not (b0 & (0x80 >> bit)):
            break
        n_extra += 1
    if n_extra == 0:
        return b0
    rest = fh.read(n_extra)
    if n_extra == 8:
        v = int.from_bytes(rest, "big")
    else:
        prefix = b0 & ((1 << (7 - n_extra)) - 1)
        v = prefix
        for byte in rest:
            v = (v << 8) | byte
    return v - (1 << 64) if v >= (1 << 63) else v


def write_ltf8(v: int) -> bytes:
    v &= 0xFFFFFFFFFFFFFFFF
    if v < 0x80:
        return bytes([v])
    for n_extra in range(1, 8):
        if v < (1 << (7 * (n_extra + 1))):
            prefix = 0
            for bit in range(n_extra):
                prefix |= 0x80 >> bit
            return bytes([prefix | (v >> (8 * n_extra))]) + \
                v.to_bytes(8 * n_extra, "big")[-n_extra:]
    return b"\xFF" + v.to_bytes(8, "big")


# ---------------------------------------------------------------------------
# rANS 4x8 codec (CRAM 3.0 §13) — decode both orders; order-0 encode for
# codec round-trip tests
# ---------------------------------------------------------------------------

_TF_SHIFT = 12
_TOTFREQ = 1 << _TF_SHIFT
_RANS_LOW = 1 << 23


def _read_freq(buf, pos):
    f = buf[pos]
    pos += 1
    if f >= 0x80:
        f = ((f & 0x7F) << 8) | buf[pos]
        pos += 1
    return f, pos


def _write_freq(f: int) -> bytes:
    if f < 0x80:
        return bytes([f])
    return bytes([0x80 | (f >> 8), f & 0xFF])


def _read_freq_table(buf, pos):
    """Symbol-RLE frequency table (htslib rANS_static layout)."""
    F = [0] * 256
    rle = 0
    j = buf[pos]
    pos += 1
    while True:
        F[j], pos = _read_freq(buf, pos)
        if rle > 0:
            rle -= 1
            j += 1
        else:
            nj = buf[pos]
            pos += 1
            if nj == j + 1:
                rle = buf[pos]
                pos += 1
            j = nj
        if j == 0:
            break
    return F, pos


def _cumulative(F):
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + F[s]
    return C


def _sym_lookup(F):
    lut = bytearray(_TOTFREQ)
    x = 0
    for s in range(256):
        for _ in range(F[s]):
            lut[x] = s
            x += 1
    return bytes(lut)


def rans_decode(data: bytes) -> bytes:
    order = data[0]
    out_sz = struct.unpack_from("<I", data, 5)[0]
    pos = 9
    if out_sz == 0:
        return b""
    if order == 0:
        F, pos = _read_freq_table(data, pos)
        C = _cumulative(F)
        lut = _sym_lookup(F)
        R = list(struct.unpack_from("<4I", data, pos))
        pos += 16
        out = bytearray(out_sz)
        for i in range(out_sz):
            k = i & 3
            r = R[k]
            m = r & (_TOTFREQ - 1)
            s = lut[m]
            out[i] = s
            r = F[s] * (r >> _TF_SHIFT) + m - C[s]
            while r < _RANS_LOW and pos < len(data):
                r = (r << 8) | data[pos]
                pos += 1
            R[k] = r
        return bytes(out)
    # order-1: per-context tables, same RLE on the context symbols
    Fs = {}
    rle_i = 0
    i_sym = data[pos]
    pos += 1
    while True:
        F, pos = _read_freq_table(data, pos)
        Fs[i_sym] = (F, _cumulative(F), _sym_lookup(F))
        if rle_i > 0:
            rle_i -= 1
            i_sym += 1
        else:
            ni = data[pos]
            pos += 1
            if ni == i_sym + 1:
                rle_i = data[pos]
                pos += 1
            i_sym = ni
        if i_sym == 0:
            break
    R = list(struct.unpack_from("<4I", data, pos))
    pos += 16
    out = bytearray(out_sz)
    isz4 = out_sz >> 2
    L = [0, 0, 0, 0]   # contexts
    starts = [0, isz4, 2 * isz4, 3 * isz4]
    for i in range(isz4):
        for k in range(4):
            r = R[k]
            m = r & (_TOTFREQ - 1)
            F, C, lut = Fs.get(L[k]) or Fs[0]
            s = lut[m]
            out[starts[k] + i] = s
            r = F[s] * (r >> _TF_SHIFT) + m - C[s]
            while r < _RANS_LOW and pos < len(data):
                r = (r << 8) | data[pos]
                pos += 1
            R[k] = r
            L[k] = s
    # remainder handled by state 3
    for i in range(4 * isz4, out_sz):
        r = R[3]
        m = r & (_TOTFREQ - 1)
        F, C, lut = Fs.get(L[3]) or Fs[0]
        s = lut[m]
        out[i] = s
        r = F[s] * (r >> _TF_SHIFT) + m - C[s]
        while r < _RANS_LOW and pos < len(data):
            r = (r << 8) | data[pos]
            pos += 1
        R[3] = r
        L[3] = s
    return bytes(out)


def _normalize_freqs(counts):
    """Scale counts so they sum to exactly _TOTFREQ (non-zero stay >= 1)."""
    total = sum(counts)
    F = [0] * 256
    if total == 0:
        return F
    acc = 0
    for s in range(256):
        if counts[s]:
            F[s] = max(1, (counts[s] * _TOTFREQ) // total)
            acc += F[s]
    # fix rounding drift on the most frequent symbol
    top = max(range(256), key=lambda s: F[s])
    F[top] += _TOTFREQ - acc
    assert F[top] > 0
    return F


def _write_freq_table(F) -> bytes:
    """Emit the symbol-RLE frequency table the decoder grammar expects:
    symbol byte + freq; a byte equal to prev+1 triggers an RLE group whose
    next byte counts further consecutive symbols; 0 terminates."""
    out = bytearray()
    syms = [s for s in range(256) if F[s]]
    i = 0
    while i < len(syms):
        out.append(syms[i])
        out += _write_freq(F[syms[i]])
        # count consecutive run following syms[i]
        run = 0
        while (i + run + 1 < len(syms)
               and syms[i + run + 1] == syms[i + run] + 1):
            run += 1
        if run:
            out.append(syms[i] + 1)   # next symbol byte (== prev+1 → RLE)
            out.append(run - 1)       # further consecutive symbols after it
            for j in range(1, run + 1):
                out += _write_freq(F[syms[i + j]])
        i += run + 1
    out.append(0)
    return bytes(out)


def rans_encode_o0(raw: bytes) -> bytes:
    """Order-0 rANS 4x8 encoder (for tests and small blocks)."""
    if not raw:
        return bytes([0]) + struct.pack("<II", 0, 0)
    counts = [0] * 256
    for b in raw:
        counts[b] += 1
    F = _normalize_freqs(counts)
    C = _cumulative(F)
    table = _write_freq_table(F)
    # encode back-to-front, 4 interleaved states
    R = [_RANS_LOW] * 4
    tail = bytearray()
    for i in range(len(raw) - 1, -1, -1):
        k = i & 3
        s = raw[i]
        f = F[s]
        r = R[k]
        rmax = ((_RANS_LOW >> _TF_SHIFT) << 8) * f
        while r >= rmax:
            tail.append(r & 0xFF)
            r >>= 8
        R[k] = ((r // f) << _TF_SHIFT) + (r % f) + C[s]
    body = struct.pack("<4I", *R) + bytes(reversed(tail))
    comp_sz = len(table) + len(body)
    return bytes([0]) + struct.pack("<II", comp_sz, len(raw)) + table + body


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

METHOD_RAW, METHOD_GZIP, METHOD_BZIP2, METHOD_LZMA, METHOD_RANS = range(5)
CT_FILE_HEADER, CT_COMPRESSION_HEADER, CT_SLICE_HEADER = 0, 1, 2
CT_EXTERNAL, CT_CORE = 4, 5


class Block:
    def __init__(self, content_type: int, content_id: int, data: bytes,
                 method: int = METHOD_RAW):
        self.content_type = content_type
        self.content_id = content_id
        self.data = data           # uncompressed payload
        self.method = method

    @classmethod
    def read(cls, fh) -> "Block":
        method = fh.read(1)[0]
        ctype = fh.read(1)[0]
        cid = read_itf8(fh)
        comp_sz = read_itf8(fh)
        raw_sz = read_itf8(fh)
        payload = fh.read(comp_sz)
        fh.read(4)   # CRC32
        if method == METHOD_RAW:
            data = payload
        elif method == METHOD_GZIP:
            data = gzip.decompress(payload)
        elif method == METHOD_BZIP2:
            data = bz2.decompress(payload)
        elif method == METHOD_LZMA:
            data = lzma.decompress(payload)
        elif method == METHOD_RANS:
            data = rans_decode(payload)
        else:
            raise ValueError(f"unsupported CRAM block method {method}")
        if len(data) != raw_sz:
            raise ValueError("CRAM block size mismatch")
        return cls(ctype, cid, data, method)

    def serialize(self) -> bytes:
        if self.method == METHOD_GZIP:
            payload = gzip.compress(self.data, 6)
        elif self.method == METHOD_RANS:
            payload = rans_encode_o0(self.data)
        else:
            payload = self.data
        head = bytes([self.method, self.content_type]) \
            + write_itf8(self.content_id) + write_itf8(len(payload)) \
            + write_itf8(len(self.data))
        body = head + payload
        return body + struct.pack("<I", zlib.crc32(body))


# ---------------------------------------------------------------------------
# container header
# ---------------------------------------------------------------------------

class ContainerHeader:
    def __init__(self, length, ref_id, start, span, n_records,
                 record_counter, bases, n_blocks, landmarks):
        self.length = length
        self.ref_id = ref_id
        self.start = start
        self.span = span
        self.n_records = n_records
        self.record_counter = record_counter
        self.bases = bases
        self.n_blocks = n_blocks
        self.landmarks = landmarks

    @classmethod
    def read(cls, fh) -> "ContainerHeader | None":
        raw = fh.read(4)
        if len(raw) < 4:
            return None
        length = struct.unpack("<i", raw)[0]
        ref_id = read_itf8(fh)
        start = read_itf8(fh)
        span = read_itf8(fh)
        n_records = read_itf8(fh)
        record_counter = read_ltf8(fh)
        bases = read_ltf8(fh)
        n_blocks = read_itf8(fh)
        n_landmarks = read_itf8(fh)
        landmarks = [read_itf8(fh) for _ in range(n_landmarks)]
        fh.read(4)   # CRC32
        return cls(length, ref_id, start, span, n_records, record_counter,
                   bases, n_blocks, landmarks)

    @staticmethod
    def serialize(ref_id, start, span, n_records, record_counter, bases,
                  blocks_payload: bytes, n_blocks, landmarks) -> bytes:
        body = write_itf8(ref_id) + write_itf8(start) + write_itf8(span) \
            + write_itf8(n_records) + write_ltf8(record_counter) \
            + write_ltf8(bases) + write_itf8(n_blocks) \
            + write_itf8(len(landmarks))
        for lm in landmarks:
            body += write_itf8(lm)
        head = struct.pack("<i", len(blocks_payload)) + body
        return head + struct.pack("<I", zlib.crc32(head)) + blocks_payload

    @property
    def is_eof(self) -> bool:
        return (self.ref_id == -1 and self.start == 4542278
                and self.n_records == 0)


# ---------------------------------------------------------------------------
# encodings (codecs)
# ---------------------------------------------------------------------------

EN_NULL, EN_EXTERNAL, EN_GOLOMB, EN_HUFFMAN, EN_BYTE_ARRAY_LEN, \
    EN_BYTE_ARRAY_STOP, EN_BETA = 0, 1, 2, 3, 4, 5, 6


def read_encoding(fh):
    codec = read_itf8(fh)
    n = read_itf8(fh)
    params = fh.read(n)
    return codec, params


def enc_external(cid: int) -> bytes:
    p = write_itf8(cid)
    return write_itf8(EN_EXTERNAL) + write_itf8(len(p)) + p


def enc_byte_array_stop(stop: int, cid: int) -> bytes:
    p = bytes([stop]) + write_itf8(cid)
    return write_itf8(EN_BYTE_ARRAY_STOP) + write_itf8(len(p)) + p


class CoreBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class Codec:
    """Decoder for one data series."""

    def __init__(self, codec_id: int, params: bytes):
        self.codec_id = codec_id
        fh = _io.BytesIO(params)
        if codec_id == EN_EXTERNAL:
            self.cid = read_itf8(fh)
        elif codec_id == EN_HUFFMAN:
            n = read_itf8(fh)
            self.alphabet = [read_itf8(fh) for _ in range(n)]
            n2 = read_itf8(fh)
            self.bitlens = [read_itf8(fh) for _ in range(n2)]
            self._build_huffman()
        elif codec_id == EN_BETA:
            self.offset = read_itf8(fh)
            self.nbits = read_itf8(fh)
        elif codec_id == EN_BYTE_ARRAY_LEN:
            lc, lp = read_encoding(fh)
            vc, vp = read_encoding(fh)
            self.len_codec = Codec(lc, lp)
            self.val_codec = Codec(vc, vp)
        elif codec_id == EN_BYTE_ARRAY_STOP:
            self.stop = fh.read(1)[0]
            self.cid = read_itf8(fh)
        else:
            raise ValueError(f"unsupported CRAM encoding {codec_id}")

    def _build_huffman(self):
        # canonical codes: sort by (bitlen, symbol)
        pairs = sorted(zip(self.bitlens, self.alphabet))
        self.codes = {}
        code = 0
        prev_len = pairs[0][0] if pairs else 0
        for ln, sym in pairs:
            code <<= (ln - prev_len)
            prev_len = ln
            self.codes[(ln, code)] = sym
            code += 1
        self.max_len = pairs[-1][0] if pairs else 0
        self.single = pairs[0][1] if len(pairs) == 1 and pairs[0][0] == 0 \
            else None

    def read_int(self, slice_ctx) -> int:
        if self.codec_id == EN_EXTERNAL:
            return read_itf8(slice_ctx.external[self.cid])
        if self.codec_id == EN_HUFFMAN:
            if self.single is not None:
                return self.single
            core = slice_ctx.core
            ln, code = 0, 0
            while True:
                code = (code << 1) | core.read_bits(1)
                ln += 1
                if (ln, code) in self.codes:
                    return self.codes[(ln, code)]
                if ln > self.max_len:
                    raise ValueError("bad huffman stream")
        if self.codec_id == EN_BETA:
            return slice_ctx.core.read_bits(self.nbits) - self.offset
        raise ValueError(f"encoding {self.codec_id} cannot decode ints")

    def read_byte(self, slice_ctx) -> int:
        if self.codec_id == EN_EXTERNAL:
            return slice_ctx.external[self.cid].read(1)[0]
        return self.read_int(slice_ctx)

    def read_bytes(self, slice_ctx) -> bytes:
        if self.codec_id == EN_BYTE_ARRAY_STOP:
            stream = slice_ctx.external[self.cid]
            out = bytearray()
            while True:
                b = stream.read(1)
                if not b or b[0] == self.stop:
                    return bytes(out)
                out.append(b[0])
        if self.codec_id == EN_BYTE_ARRAY_LEN:
            n = self.len_codec.read_int(slice_ctx)
            if self.val_codec.codec_id == EN_EXTERNAL:
                return slice_ctx.external[self.val_codec.cid].read(n)
            return bytes(self.val_codec.read_byte(slice_ctx)
                         for _ in range(n))
        raise ValueError(f"encoding {self.codec_id} cannot decode arrays")


# ---------------------------------------------------------------------------
# compression header
# ---------------------------------------------------------------------------

class CompressionHeader:
    def __init__(self, data: bytes):
        fh = _io.BytesIO(data)
        # preservation map
        read_itf8(fh)            # byte size
        n = read_itf8(fh)
        self.rn_preserved = True
        self.ap_delta = True
        self.ref_required = True
        self.sub_matrix = None
        self.tag_dict = [[]]
        for _ in range(n):
            key = fh.read(2).decode()
            if key == "RN":
                self.rn_preserved = bool(fh.read(1)[0])
            elif key == "AP":
                self.ap_delta = bool(fh.read(1)[0])
            elif key == "RR":
                self.ref_required = bool(fh.read(1)[0])
            elif key == "SM":
                self.sub_matrix = fh.read(5)
            elif key == "TD":
                ln = read_itf8(fh)
                raw = fh.read(ln)
                self.tag_dict = [
                    [(line[i:i + 3]) for i in range(0, len(line), 3)]
                    for line in raw.split(b"\x00")][:-1] or [[]]
            else:
                raise ValueError(f"unknown preservation key {key}")
        # data series encodings
        read_itf8(fh)
        n = read_itf8(fh)
        self.series = {}
        for _ in range(n):
            key = fh.read(2).decode()
            codec, params = read_encoding(fh)
            self.series[key] = Codec(codec, params)
        # tag encodings
        read_itf8(fh)
        n = read_itf8(fh)
        self.tags = {}
        for _ in range(n):
            key = read_itf8(fh)
            codec, params = read_encoding(fh)
            self.tags[key] = Codec(codec, params)
        self._sub_lookup = _build_sub_lookup(self.sub_matrix)


DEFAULT_SM = bytes([
    # ref A: subs CGTN codes 0,1,2,3 ; packed MSB-first 2 bits each
    0b00011011, 0b00011011, 0b00011011, 0b00011011, 0b00011011])


def _build_sub_lookup(sm: bytes | None):
    sm = sm or DEFAULT_SM
    lut = {}
    for ri, ref_base in enumerate(BASES):
        subs = [b for b in BASES if b != ref_base]
        byte = sm[ri]
        for j, sub_base in enumerate(subs):
            code = (byte >> (6 - 2 * j)) & 3
            lut[(ref_base, code)] = sub_base
    return lut


def _sub_code(sm: bytes, ref_base: str, read_base: str) -> int:
    ri = BASES.index(ref_base if ref_base in BASES else "N")
    subs = [b for b in BASES if b != BASES[ri]]
    j = subs.index(read_base if read_base in subs else subs[-1])
    return (sm[ri] >> (6 - 2 * j)) & 3


# ---------------------------------------------------------------------------
# slice
# ---------------------------------------------------------------------------

class SliceHeader:
    def __init__(self, data: bytes):
        fh = _io.BytesIO(data)
        self.ref_id = read_itf8(fh)
        self.start = read_itf8(fh)
        self.span = read_itf8(fh)
        self.n_records = read_itf8(fh)
        self.record_counter = read_ltf8(fh)
        self.n_blocks = read_itf8(fh)
        n_cids = read_itf8(fh)
        self.content_ids = [read_itf8(fh) for _ in range(n_cids)]
        self.embedded_ref_id = read_itf8(fh)
        self.md5 = fh.read(16)

    @staticmethod
    def serialize(ref_id, start, span, n_records, record_counter,
                  n_blocks, content_ids, embedded_ref_id=-1) -> bytes:
        out = write_itf8(ref_id) + write_itf8(start) + write_itf8(span) \
            + write_itf8(n_records) + write_ltf8(record_counter) \
            + write_itf8(n_blocks) + write_itf8(len(content_ids))
        for cid in content_ids:
            out += write_itf8(cid)
        out += write_itf8(embedded_ref_id) + b"\x00" * 16
        return out


class SliceContext:
    """Decode-time state: core bit reader + external byte streams."""

    def __init__(self, core: bytes, external: dict[int, bytes]):
        self.core = CoreBitReader(core)
        self.external = {cid: _io.BytesIO(b) for cid, b in external.items()}


# feature codes → (operand kind, data series key)
_FEATURE_OPS = {
    ord("B"): ("base_qual", None),
    ord("X"): ("byte", "BS"),
    ord("I"): ("bytes", "IN"),
    ord("S"): ("bytes", "SC"),
    ord("i"): ("byte", "BA"),
    ord("b"): ("bytes", "BB"),
    ord("q"): ("bytes", "QQ"),
    ord("Q"): ("byte", "QS"),
    ord("D"): ("int", "DL"),
    ord("N"): ("int", "RS"),
    ord("H"): ("int", "HC"),
    ord("P"): ("int", "PD"),
}


def _decode_records(ch: CompressionHeader, sh: SliceHeader,
                    ctx: SliceContext, references: list[str],
                    ref_seq_fn):
    """Decode all records of one slice into BamRead objects."""
    S = ch.series
    recs = []
    prev_ap = sh.start
    for _ in range(sh.n_records):
        bf = S["BF"].read_int(ctx)
        cf = S["CF"].read_int(ctx)
        rid = S["RI"].read_int(ctx) if sh.ref_id == -2 else sh.ref_id
        rl = S["RL"].read_int(ctx)
        ap = S["AP"].read_int(ctx)
        if ch.ap_delta:
            ap += prev_ap
            prev_ap = ap
        S["RG"].read_int(ctx)
        name = S["RN"].read_bytes(ctx).decode() if ch.rn_preserved else ""
        if cf & CF_DETACHED:
            mf = S["MF"].read_int(ctx)
            if not ch.rn_preserved:
                name = S["RN"].read_bytes(ctx).decode()
            S["NS"].read_int(ctx)
            S["NP"].read_int(ctx)
            S["TS"].read_int(ctx)
            if mf & MF_MATE_NEG:
                bf |= 0x20
            if mf & MF_MATE_UNMAPPED:
                bf |= 0x8
        elif cf & CF_MATE_DOWNSTREAM:
            S["NF"].read_int(ctx)
        tl = S["TL"].read_int(ctx)
        for tag3 in ch.tag_dict[tl] if tl < len(ch.tag_dict) else []:
            key = (tag3[0] << 16) | (tag3[1] << 8) | tag3[2]
            ch.tags[key].read_bytes(ctx)      # parsed, discarded
        if not (bf & 4):
            # mapped: features → seq + cigar vs reference
            fn = S["FN"].read_int(ctx)
            feats = []
            fpos = 0
            for _ in range(fn):
                fpos += S["FP"].read_int(ctx)
                fc = S["FC"].read_byte(ctx)
                kind, skey = _FEATURE_OPS[fc]
                if kind == "base_qual":
                    val = (S["BA"].read_byte(ctx), S["QS"].read_byte(ctx))
                elif kind == "byte":
                    val = S[skey].read_byte(ctx)
                elif kind == "bytes":
                    val = S[skey].read_bytes(ctx)
                else:
                    val = S[skey].read_int(ctx)
                feats.append((fpos, fc, val))
            mq = S["MQ"].read_int(ctx)
            quals = [S["QS"].read_byte(ctx) for _ in range(rl)] \
                if cf & CF_QS_STORED else [0xFF] * rl
            seq, cigar = _reconstruct(feats, rl, ap, rid, references,
                                      ref_seq_fn, ch._sub_lookup, quals)
            recs.append(BamRead(
                name, bf, rid, ap - 1, mq, cigar, seq, quals,
                references[rid] if 0 <= rid < len(references) else None))
        else:
            if cf & CF_NO_SEQ:
                seq = ""
            else:
                seq = bytes(S["BA"].read_byte(ctx)
                            for _ in range(rl)).decode()
            quals = [S["QS"].read_byte(ctx) for _ in range(rl)] \
                if cf & CF_QS_STORED else [0xFF] * rl
            recs.append(BamRead(
                name, bf, rid, ap - 1, 0, [], seq, quals,
                references[rid] if 0 <= rid < len(references) else None))
    return recs


def _reconstruct(feats, rl, ap, rid, references, ref_seq_fn, sub_lut,
                 quals):
    """Rebuild sequence + CIGAR from read features and the reference."""
    ref = ref_seq_fn(rid) if ref_seq_fn else None
    seq = [""] * rl
    cigar = []          # (op, len) ops in "MIDNSHP=X" codes

    def add_op(op, ln):
        if ln <= 0:
            return
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + ln)
        else:
            cigar.append((op, ln))

    rpos = ap - 1       # 0-based reference cursor
    qpos = 0            # 0-based read cursor

    def fill_match(upto):
        nonlocal rpos, qpos
        n = upto - qpos
        if n <= 0:
            return
        for i in range(n):
            if ref is not None and rpos + i < len(ref):
                seq[qpos + i] = ref[rpos + i]
            else:
                seq[qpos + i] = "N"
        add_op(0, n)
        rpos += n
        qpos += n

    for fpos, fc, val in feats:
        fill_match(fpos - 1)     # features are 1-based in-read positions
        c = chr(fc)
        if c == "X":
            rb = ref[rpos] if ref is not None and rpos < len(ref) else "N"
            seq[qpos] = sub_lut.get((rb if rb in BASES else "N", val), "N")
            add_op(0, 1)
            rpos += 1
            qpos += 1
        elif c == "B":
            seq[qpos] = chr(val[0])
            quals[qpos] = val[1]
            add_op(0, 1)
            rpos += 1
            qpos += 1
        elif c == "I":
            for b in val:
                seq[qpos] = chr(b)
                qpos += 1
            add_op(1, len(val))
        elif c == "i":
            seq[qpos] = chr(val)
            qpos += 1
            add_op(1, 1)
        elif c == "S":
            for b in val:
                seq[qpos] = chr(b)
                qpos += 1
            add_op(4, len(val))
        elif c == "b":
            for b in val:
                seq[qpos] = chr(b)
                qpos += 1
                rpos += 1
            add_op(0, len(val))
        elif c == "q":
            for j, b in enumerate(val):
                quals[qpos + j] = b
        elif c == "Q":
            quals[qpos] = val
        elif c == "D":
            add_op(2, val)
            rpos += val
        elif c == "N":
            add_op(3, val)
            rpos += val
        elif c == "H":
            add_op(5, val)
        elif c == "P":
            add_op(6, val)
    fill_match(rl)
    return "".join(seq), cigar


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class CramReader:
    """CRAM 3.x reader with the BamReader fetch/iteration surface.

    ``reference_fasta`` supplies the reference sequences required to
    reconstruct mapped reads (the reference tool takes the same input via
    --reference_filename / pysam reference_filename).
    """

    def __init__(self, path: str, reference_fasta: str | None = None):
        self.path = path
        self._fh = open(path, "rb")
        magic = self._fh.read(4)
        if magic != CRAM_MAGIC:
            raise ValueError(f"{path}: not a CRAM file")
        self.major, self.minor = self._fh.read(1)[0], self._fh.read(1)[0]
        if self.major not in (2, 3):
            raise ValueError(f"unsupported CRAM version {self.major}")
        self._fh.read(20)    # file id
        # SAM header container
        hdr = ContainerHeader.read(self._fh)
        hdr_start = self._fh.tell()
        block = Block.read(self._fh)
        text_len = struct.unpack_from("<i", block.data)[0]
        self.header_text = block.data[4:4 + text_len].decode(
            errors="replace")
        self._fh.seek(hdr_start + hdr.length)
        self._data_start = self._fh.tell()
        self.references: list[str] = []
        self.lengths: list[int] = []
        for line in self.header_text.splitlines():
            if line.startswith("@SQ"):
                name, length = None, 0
                for field in line.split("\t")[1:]:
                    if field.startswith("SN:"):
                        name = field[3:]
                    elif field.startswith("LN:"):
                        length = int(field[3:])
                if name:
                    self.references.append(name)
                    self.lengths.append(length)
        self._ref_fasta = reference_fasta
        self._ref_cache: dict[int, str] = {}
        self._ref_required_seen = False

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- reference access --------------------------------------------------

    def _ref_seq(self, rid: int) -> str | None:
        if rid < 0 or rid >= len(self.references):
            return None
        if rid not in self._ref_cache:
            if self._ref_fasta is None:
                raise ValueError(
                    f"{self.path}: CRAM requires the reference FASTA to "
                    "decode mapped reads; pass --reference_filename")
            from advntr_tpu.io.fasta import read_fasta
            want = self.references[rid]
            for name, seq in read_fasta(self._ref_fasta):
                if name == want:
                    self._ref_cache[rid] = seq.upper()
                    break
            else:
                raise ValueError(
                    f"{want} not found in {self._ref_fasta}")
        return self._ref_cache[rid]

    # ---- container iteration ----------------------------------------------

    def _containers(self, want_ref=None):
        """Yield (header, records) per data container.  ``want_ref``:
        None = all; -1 = unmapped-capable containers only; (rid, s, e) =
        containers that may overlap the region."""
        self._fh.seek(self._data_start)
        while True:
            hdr = ContainerHeader.read(self._fh)
            if hdr is None or hdr.is_eof:
                return
            body_start = self._fh.tell()
            if want_ref is not None:
                skip = False
                if want_ref == -1:
                    skip = hdr.ref_id >= 0
                else:
                    rid, s, e = want_ref
                    if hdr.ref_id == -1:
                        skip = True
                    elif hdr.ref_id >= 0:
                        if hdr.ref_id != rid:
                            skip = True
                        elif hdr.span > 0 and (
                                hdr.start + hdr.span <= s
                                or hdr.start > e):
                            skip = True
                if skip:
                    self._fh.seek(body_start + hdr.length)
                    continue
            yield hdr, self._decode_container(hdr)
            self._fh.seek(body_start + hdr.length)

    def _decode_container(self, hdr: ContainerHeader):
        comp_block = Block.read(self._fh)
        if comp_block.content_type != CT_COMPRESSION_HEADER:
            raise ValueError("expected compression header block")
        ch = CompressionHeader(comp_block.data)
        recs = []
        n_remaining = hdr.n_blocks - 1
        while n_remaining > 0:
            blk = Block.read(self._fh)
            n_remaining -= 1
            if blk.content_type != CT_SLICE_HEADER:
                continue
            sh = SliceHeader(blk.data)
            core = b""
            external = {}
            for _ in range(sh.n_blocks):
                b = Block.read(self._fh)
                n_remaining -= 1
                if b.content_type == CT_CORE:
                    core = b.data
                elif b.content_type == CT_EXTERNAL:
                    external[b.content_id] = b.data
            ctx = SliceContext(core, external)
            ref_fn = self._ref_seq if ch.ref_required else None
            recs.extend(_decode_records(ch, sh, ctx, self.references,
                                        ref_fn))
        return recs

    def __iter__(self):
        for _, recs in self._containers():
            yield from recs

    def head(self, n: int):
        out = []
        for rec in self:
            out.append(rec)
            if len(out) >= n:
                break
        return out

    def fetch(self, chromosome: str, start: int, end: int):
        if chromosome not in self.references:
            return
        rid = self.references.index(chromosome)
        for _, recs in self._containers(want_ref=(rid, start, end)):
            for rec in recs:
                if rec.is_unmapped or rec.reference_id != rid:
                    continue
                ref_end = rec.reference_end or rec.reference_start + 1
                if rec.reference_start < end and ref_end > start:
                    yield rec

    def fetch_unmapped(self):
        for _, recs in self._containers(want_ref=-1):
            for rec in recs:
                if rec.is_unmapped:
                    yield rec


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

# content-id assignment for the writer's external streams
_W_SERIES = ["BF", "CF", "RI", "RL", "AP", "RG", "MF", "NS", "NP", "TS",
             "TL", "FN", "FP", "FC", "BS", "DL", "RS", "HC", "PD", "MQ",
             "BA", "QS"]
_W_ARRAYS = ["RN", "IN", "SC", "BB", "QQ"]


class CramWriter:
    """Writes CRAM 3.0: one multi-ref slice per container, detached mates,
    EXTERNAL/BYTE_ARRAY_STOP encodings, gzip block compression.  Mapped
    reads are feature-encoded against the supplied reference sequences
    ({chrom: seq} or a FASTA path)."""

    def __init__(self, path: str, references: list[str], lengths: list[int],
                 header_text: str = "", reference_seqs=None,
                 records_per_container: int = 10000):
        self._fh = open(path, "wb")
        self.references = references
        self.lengths = lengths
        self._per_container = records_per_container
        self._counter = 0
        self._pending: list[BamRead] = []
        if isinstance(reference_seqs, str):
            from advntr_tpu.io.fasta import read_fasta
            reference_seqs = {n: s.upper()
                              for n, s in read_fasta(reference_seqs)}
        self._ref_seqs = reference_seqs or {}
        header_lines = [ln for ln in header_text.splitlines() if ln]
        have_sq = {ln.split("SN:")[1].split("\t")[0]
                   for ln in header_lines if ln.startswith("@SQ")}
        for name, length in zip(references, lengths):
            if name not in have_sq:
                header_lines.append(f"@SQ\tSN:{name}\tLN:{length}")
        text = ("\n".join(header_lines) + "\n").encode() if header_lines \
            else b""
        self._fh.write(CRAM_MAGIC + bytes([3, 0]) + b"\x00" * 20)
        hdr_block = Block(CT_FILE_HEADER, 0,
                          struct.pack("<i", len(text)) + text, METHOD_GZIP)
        payload = hdr_block.serialize()
        self._fh.write(ContainerHeader.serialize(
            0, 0, 0, 0, 0, 0, payload, 1, [0]))

    def write(self, read: BamRead) -> None:
        self._pending.append(read)
        if len(self._pending) >= self._per_container:
            self._flush()

    def close(self):
        self._flush()
        self._fh.write(CRAM_EOF)
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- encoding ----------------------------------------------------------

    def _compression_header(self) -> bytes:
        pres = bytearray()
        entries = [(b"RN", b"\x01"), (b"AP", b"\x00"), (b"RR", b"\x01"),
                   (b"SM", DEFAULT_SM), (b"TD", write_itf8(1) + b"\x00")]
        body = bytearray(write_itf8(len(entries)))
        for k, v in entries:
            body += k + v
        pres += write_itf8(len(body)) + body

        cid = {}
        enc = bytearray()
        n_series = 0
        for i, key in enumerate(_W_SERIES):
            cid[key] = i
            enc += key.encode() + enc_external(i)
            n_series += 1
        for j, key in enumerate(_W_ARRAYS):
            cid[key] = len(_W_SERIES) + j
            enc += key.encode() + enc_byte_array_stop(0, cid[key])
            n_series += 1
        body = write_itf8(n_series) + enc
        out = bytes(pres) + write_itf8(len(body)) + body
        # empty tag encoding map
        body = write_itf8(0)
        out += write_itf8(len(body)) + body
        self._cid = cid
        return out

    def _flush(self):
        if not self._pending:
            return
        recs = self._pending
        self._pending = []
        ch_data = self._compression_header()
        streams = {key: bytearray() for key in _W_SERIES + _W_ARRAYS}

        def put_int(key, v):
            streams[key] += write_itf8(v)

        def put_byte(key, v):
            streams[key].append(v & 0xFF)

        def put_arr(key, data: bytes):
            streams[key] += data + b"\x00"

        n_bases = 0
        for r in recs:
            bf = r.flag
            cf = CF_DETACHED | (CF_QS_STORED if r.qual else 0)
            put_int("BF", bf)
            put_int("CF", cf)
            put_int("RI", r.reference_id)
            rl = len(r.seq)
            n_bases += rl
            put_int("RL", rl)
            ap = r.reference_start + 1 if not r.is_unmapped else 0
            put_int("AP", ap)
            put_int("RG", -1)
            put_arr("RN", r.query_name.encode())
            mf = (MF_MATE_NEG if bf & 0x20 else 0) \
                | (MF_MATE_UNMAPPED if bf & 0x8 else 0)
            put_int("MF", mf)
            put_int("NS", -1)
            put_int("NP", 0)
            put_int("TS", 0)
            put_int("TL", 0)
            if not r.is_unmapped:
                self._encode_mapped(r, put_int, put_byte, put_arr)
                put_int("MQ", r.mapq)
            else:
                for b in r.seq.encode():
                    put_byte("BA", b)
            if r.qual:
                for q in r.qual:
                    put_byte("QS", q)

        blocks = []
        content_ids = []
        for key in _W_SERIES + _W_ARRAYS:
            data = bytes(streams[key])
            if not data:
                continue
            blocks.append(Block(CT_EXTERNAL, self._cid[key], data,
                                METHOD_GZIP))
            content_ids.append(self._cid[key])
        core = Block(CT_CORE, 0, b"", METHOD_RAW)
        slice_hdr_data = SliceHeader.serialize(
            -2, 0, 0, len(recs), self._counter, len(blocks) + 1,
            content_ids)
        slice_blocks = [Block(CT_SLICE_HEADER, 0, slice_hdr_data),
                        core] + blocks

        ch_block = Block(CT_COMPRESSION_HEADER, 0, ch_data, METHOD_GZIP)
        payload = ch_block.serialize()
        landmarks = [len(payload)]
        for b in slice_blocks:
            payload += b.serialize()
        self._fh.write(ContainerHeader.serialize(
            -2, 0, 0, len(recs), self._counter, n_bases, payload,
            1 + len(slice_blocks), landmarks))
        self._counter += len(recs)

    def _encode_mapped(self, r: BamRead, put_int, put_byte, put_arr):
        ref = self._ref_seqs.get(r.reference_name or "")
        if ref is None:
            raise ValueError(
                f"CramWriter needs the reference sequence for "
                f"{r.reference_name} to encode mapped reads")
        feats = []      # (1-based read pos, code char, payload)
        rpos = r.reference_start
        qpos = 0
        for op, ln in (r.cigar or [(0, len(r.seq))]):
            if op in (0, 7, 8):     # M/=/X
                for i in range(ln):
                    rb = ref[rpos + i] if rpos + i < len(ref) else "N"
                    qb = r.seq[qpos + i]
                    if qb != rb:
                        if qb in BASES and rb in BASES and qb != "N":
                            feats.append((qpos + i + 1, "X",
                                          _sub_code(DEFAULT_SM, rb, qb)))
                        else:
                            q = r.qual[qpos + i] if r.qual else 0xFF
                            feats.append((qpos + i + 1, "B",
                                          (ord(qb), q)))
                rpos += ln
                qpos += ln
            elif op == 1:           # I
                feats.append((qpos + 1, "I",
                              r.seq[qpos:qpos + ln].encode()))
                qpos += ln
            elif op == 4:           # S
                feats.append((qpos + 1, "S",
                              r.seq[qpos:qpos + ln].encode()))
                qpos += ln
            elif op == 2:           # D
                feats.append((qpos + 1, "D", ln))
                rpos += ln
            elif op == 3:           # N
                feats.append((qpos + 1, "N", ln))
                rpos += ln
            elif op == 5:           # H
                feats.append((qpos + 1, "H", ln))
            elif op == 6:           # P
                feats.append((qpos + 1, "P", ln))
        put_int("FN", len(feats))
        prev = 0
        for fpos, code, val in feats:
            put_int("FP", fpos - prev)
            prev = fpos
            put_byte("FC", ord(code))
            if code == "X":
                put_byte("BS", val)
            elif code == "B":
                put_byte("BA", val[0])
                put_byte("QS", val[1])
            elif code in ("I", "S"):
                put_arr("IN" if code == "I" else "SC", val)
            elif code == "D":
                put_int("DL", val)
            elif code == "N":
                put_int("RS", val)
            elif code == "H":
                put_int("HC", val)
            elif code == "P":
                put_int("PD", val)
