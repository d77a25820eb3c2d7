"""Gorilla TSC block codec — delta-of-delta timestamps + XOR'd 64-bit payloads.

From-scratch implementation of the compression scheme of the Facebook Gorilla paper
("Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015), playing the
role of the reference's ``archive`` layer (``archive/GorillaArray.scala:23-64``,
``archive/GorillaBlock.scala`` — which delegates the bit-level work to the external
``fi.iki.yak:compression-gorilla`` library). The bitstream layout here is our own
(documented below), NOT byte-compatible with that library; the contract we preserve
is the reference's: compress→decompress identity, the tuple-block container layout
(``len(values):int32 ++ values ++ validities``, ``archive/GorillaBlock.scala:39-48``),
the sampled-block optimization for constant validities
(``archive/GorillaBlock.scala:90-121``), and the timestamp constraints
(``validation/TimestampValidator.scala:15-97``: positive, strictly increasing,
consecutive gap < 2^31, first-entry offset from block header < 2^27−1).

## Bitstream layout (one "Gorilla array")

    u32   n_points          (big-endian; explicit count instead of an end marker)
    i64   block_ts          (header timestamp)
    27b   ts0 - block_ts    (first entry offset, < 2^27-1)
    64b   payload0          (raw first 64-bit payload)
    per further point:
      timestamp: dod = (ts_i - ts_{i-1}) - (ts_{i-1} - ts_{i-2}); zz = zigzag(dod)
        '0'                 dod == 0
        '10'  + 7b zz       zz < 2^7
        '110' + 9b zz       zz < 2^9
        '1110'+ 12b zz      zz < 2^12
        '1111'+ 64b zz      otherwise
      payload: x = p_i XOR p_{i-1}
        '0'                 x == 0
        '1' + 5b lz + 6b (mbits-1) + mbits meaningful bits   (lz capped at 31;
              trailing zeros inferred as 64 - lz - mbits)

Unlike the paper we always emit the (lz, mbits) window for a non-zero XOR instead of
reusing the previous window — a deliberate trade of a few bits for a fully
*vectorized* encoder (all field values/widths are computed with numpy; only the final
bit-packing reduces over python ints).
"""

from __future__ import annotations

import numpy as np

# TimestampValidator.MaxGapToBlock = (2^27-1)-1 with firstEntryTs < blockTs + MaxGapToBlock:
# the reference rejects first_off = 2^27-2, so the exclusive bound is (1<<27)-2
# (ADVICE r01 parity fix; the bitstream itself still encodes 27 unsigned bits)
MAX_FIRST_OFFSET = (1 << 27) - 2
MAX_GAP = (1 << 31) - 1  # TimestampValidator.MaxGap (Int.MaxValue)

_U64 = np.uint64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    x = x.astype(_U64, copy=True)
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = (x >> _U64(s)) != 0
        n += np.where(big, s, 0)
        x = np.where(big, x >> _U64(s), x)
    return n + (x != 0)


def _clz64(x: np.ndarray) -> np.ndarray:
    return 64 - _bit_length_u64(x)


def _ctz64(x: np.ndarray) -> np.ndarray:
    low = x & (_U64(0) - x)  # isolate lowest set bit (modular negation)
    return _bit_length_u64(low) - 1


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(_U64)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _pack_fields(fields: list[int], lengths: list[int]) -> bytes:
    """Concatenate (value, nbits) fields MSB-first into bytes via tree reduction
    (O(total_bits · log n / 64) big-int word ops — C speed). Retained for tests /
    small headers; the hot path uses :func:`pack_bits` below."""
    items = list(zip(fields, lengths))
    if not items:
        return b""
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            (v1, n1), (v2, n2) = items[i], items[i + 1]
            nxt.append(((v1 << n2) | v2, n1 + n2))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    v, n = items[0]
    pad = (-n) % 8
    return ((v << pad)).to_bytes((n + pad) // 8, "big")


def pack_bits(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Fully vectorized MSB-first bit packing: each field i contributes the low
    ``nbits[i]`` bits of ``values[i]`` (uint64, so every subfield is <= 64 bits).

    Each field is left-shifted to end on a byte boundary (<= 71 significant
    bits: 1 overflow byte + 8 value bytes), decomposed into its 9-byte window,
    and all windows are summed into the output with one np.bincount — bits never
    overlap within a byte, so byte-wise addition is exact. O(m x 9) work."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    nbits = np.asarray(nbits, dtype=np.int64)
    total = int(nbits.sum())
    if total == 0:
        return b""
    end_bit = np.cumsum(nbits)
    shift = ((8 - (end_bit & 7)) & 7).astype(np.uint64)
    hi = np.where(shift > 0, values >> (np.uint64(64) - shift), np.uint64(0))
    lo = values << shift
    end_byte = (end_bit + shift.astype(np.int64)) >> 3
    n_out = (total + 7) >> 3
    # 9-byte big-endian window [hi, lo_7, .., lo_0] ending at end_byte; leading
    # bytes beyond the field's extent are zero. Positions are padded by +8 so the
    # earliest window never goes negative.
    k = np.arange(9, dtype=np.int64)
    B = np.empty((len(values), 9), dtype=np.float64)
    B[:, 0] = hi
    for j in range(8):
        B[:, 1 + j] = (lo >> np.uint64(8 * (7 - j))) & np.uint64(0xFF)
    pos = (end_byte[:, None] - 9 + k[None, :]) + 8
    out = np.bincount(pos.reshape(-1), weights=B.reshape(-1), minlength=n_out + 8)
    return out[8 : n_out + 8].astype(np.uint8).tobytes()


def compress_payloads(ts: np.ndarray, payload: np.ndarray, block_ts: int | None = None) -> bytes:
    """Encode (ts:int64, payload:uint64-bits) into a Gorilla array."""
    n = len(ts)
    if n == 0:
        raise ValueError("The series to compress needs to contain at least one element.")
    ts = np.asarray(ts, dtype=np.int64)
    payload = np.asarray(payload).view(_U64) if payload.dtype != _U64 else payload
    if block_ts is None:
        block_ts = int(ts[0])
    if block_ts <= 0 or ts[0] <= 0:
        raise ValueError(f"Timestamps must be positive, was {min(block_ts, int(ts[0]))}.")
    first_off = int(ts[0]) - block_ts
    if not (0 <= first_off < MAX_FIRST_OFFSET):
        raise ValueError(
            f"The first entry's timestamp must be within [block_ts, block_ts + {MAX_FIRST_OFFSET})."
        )
    if n > 1:
        gaps = np.diff(ts)
        if (gaps <= 0).any():
            i = int(np.flatnonzero(gaps <= 0)[0])
            raise ValueError(
                f"The timestamps need to be strictly increasing, was {ts[i]} before {ts[i + 1]}."
            )
        if (gaps >= MAX_GAP).any():
            raise ValueError(f"Timestamps cannot have a difference larger than {MAX_GAP}.")

    # per-point output decomposed into <=64-bit SUBFIELDS so packing stays in
    # uint64 (np.packbits path, no Python big-int loop):
    #   [t_prefix (1-4b), t_payload (0|7|9|12|64b zigzag dod),
    #    v_head (1b same-flag | 12b 1+lz+mbits-1), v_payload (0|mbits XOR bits)]
    head_vals = np.array(
        [n, block_ts & 0xFFFFFFFFFFFFFFFF, first_off, int(payload[0])], dtype=np.uint64
    )
    head_bits = np.array([32, 64, 27, 64], dtype=np.int64)
    if n == 1:
        return pack_bits(head_vals, head_bits)

    delta = np.diff(ts)
    prev_delta = np.concatenate([[first_off], delta[:-1]])
    dod = delta - prev_delta
    zz = _zigzag(dod)
    zero = dod == 0
    b7 = ~zero & (zz < (1 << 7))
    b9 = ~zero & ~b7 & (zz < (1 << 9))
    b12 = ~zero & ~b7 & ~b9 & (zz < (1 << 12))
    b64 = ~zero & ~b7 & ~b9 & ~b12
    t_pre_val = np.select([zero, b7, b9, b12], [0, 0b10, 0b110, 0b1110], 0b1111).astype(_U64)
    t_pre_len = np.select([zero, b7, b9, b12], [1, 2, 3, 4], 4).astype(np.int64)
    t_pay_len = np.select([zero, b7, b9, b12], [0, 7, 9, 12], 64).astype(np.int64)
    t_pay_val = np.where(zero, _U64(0), zz)

    x = payload[1:] ^ payload[:-1]
    nz = x != 0
    lz = np.minimum(np.where(nz, _clz64(x), 0), 31)
    tz = np.where(nz, _ctz64(x), 0)
    mbits = np.where(nz, 64 - lz - tz, 1)
    v_head_val = np.where(
        nz, (_U64(1) << _U64(11)) | (lz.astype(_U64) << _U64(6)) | (mbits - 1).astype(_U64), _U64(0)
    )
    v_head_len = np.where(nz, 12, 1).astype(np.int64)
    v_pay_val = np.where(nz, x >> tz.astype(_U64), _U64(0))
    v_pay_len = np.where(nz, mbits, 0).astype(np.int64)

    vals = np.column_stack([t_pre_val, t_pay_val, v_head_val, v_pay_val]).reshape(-1)
    bits = np.column_stack([t_pre_len, t_pay_len, v_head_len, v_pay_len]).reshape(-1)
    return pack_bits(
        np.concatenate([head_vals, vals]), np.concatenate([head_bits, bits])
    )


class _BitReader:
    """Buffered MSB-first bit reader: refills a python-int window 32 bytes at a
    time so each field read is shift+mask instead of a bytes slice + from_bytes."""

    __slots__ = ("data", "nbits_total", "buf", "buf_bits", "byte_pos")

    def __init__(self, data: bytes):
        self.data = data
        self.nbits_total = len(data) * 8
        self.buf = 0
        self.buf_bits = 0
        self.byte_pos = 0

    def read(self, nbits: int) -> int:
        while self.buf_bits < nbits:
            chunk = self.data[self.byte_pos : self.byte_pos + 32]
            if not chunk:
                raise ValueError(
                    "The passed byte array is not a valid compressed timeseries."
                )
            self.byte_pos += len(chunk)
            self.buf = (self.buf << (len(chunk) * 8)) | int.from_bytes(chunk, "big")
            self.buf_bits += len(chunk) * 8
        self.buf_bits -= nbits
        out = self.buf >> self.buf_bits
        self.buf &= (1 << self.buf_bits) - 1
        return out


def _extract_bit_fields(buf: np.ndarray, offs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized gather of <=64-bit fields at arbitrary BIT offsets from a
    zero-padded uint8 buffer (MSB-first). 9-byte window per field."""
    m = len(offs)
    if m == 0:
        return np.zeros(0, dtype=_U64)
    bs = (offs >> 3).astype(np.int64)
    win = buf[bs[:, None] + np.arange(9)[None, :]].astype(_U64)  # (m, 9)
    b0 = win[:, 0]
    u64 = np.zeros(m, dtype=_U64)
    for k in range(8):
        u64 |= win[:, 1 + k] << _U64(8 * (7 - k))
    start = (offs & 7).astype(np.int64)
    shift = 72 - start - lens
    lo_sh = np.clip(shift, 0, 63).astype(_U64)
    hi_left = np.clip(64 - shift, 0, 63).astype(_U64)
    hi_right = np.clip(shift - 64, 0, 63).astype(_U64)
    field = np.where(
        shift >= 64,
        b0 >> hi_right,
        (b0 << hi_left) | (u64 >> lo_sh),
    )
    mask = np.where(lens >= 64, _U64(0xFFFFFFFFFFFFFFFF), (_U64(1) << lens.astype(_U64)) - _U64(1))
    return field & mask


def decompress_payloads(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a Gorilla array back to (ts:int64, payload:uint64).

    Two passes: a sequential CONTROL scan (python-int window peeks — one per ts
    field, one per value field — recording each payload's bit offset/length),
    then fully vectorized payload extraction + zigzag/cumsum/XOR-scan
    reconstruction. ~3x the single-pass bit-reader."""
    nbits_total = len(data) * 8
    if len(data) < 8:
        raise ValueError("The passed byte array is not a valid compressed timeseries.")
    pad = bytes(data) + b"\x00" * 24  # bytes() is a no-op for bytes, one copy for memoryview
    words = np.frombuffer(pad[: (len(pad) // 8) * 8], dtype=">u8").tolist()

    def peek(pos: int, k: int) -> int:
        wi = pos >> 6
        sh = pos & 63
        if sh + k <= 64:  # common case: field inside one word
            return (words[wi] >> (64 - sh - k)) & ((1 << k) - 1)
        window = (words[wi] << 64) | words[wi + 1]
        return (window >> (128 - sh - k)) & ((1 << k) - 1)

    n = peek(0, 32)
    if n == 0:
        raise ValueError("The passed byte array is not a valid compressed timeseries.")
    block_ts = peek(32, 64)
    if block_ts >= 1 << 63:
        block_ts -= 1 << 64
    first_off = peek(96, 27)
    p0 = _U64(peek(123, 64))
    pos = 123 + 64
    m = n - 1
    # control scan outputs: payload bit offsets/lengths per point;
    # v_hdr packs (lz<<6)|(mbits-1), -1 = same-value flag
    to_l = [0] * m
    tl_l = [0] * m
    vo_l = [0] * m
    vh_l = [0] * m
    w = words
    for i in range(m):
        if pos > nbits_total:
            raise ValueError("The passed byte array is not a valid compressed timeseries.")
        wi = pos >> 6
        sh = pos & 63
        if sh <= 60:
            c = (w[wi] >> (60 - sh)) & 15
        else:
            c = (((w[wi] << 64) | w[wi + 1]) >> (124 - sh)) & 15
        if c < 8:  # '0...'
            pos += 1
        elif c < 12:  # '10' + 7
            pos += 2
            to_l[i] = pos
            tl_l[i] = 7
            pos += 7
        elif c < 14:  # '110' + 9
            pos += 3
            to_l[i] = pos
            tl_l[i] = 9
            pos += 9
        elif c == 14:  # '1110' + 12
            pos += 4
            to_l[i] = pos
            tl_l[i] = 12
            pos += 12
        else:  # '1111' + 64
            pos += 4
            to_l[i] = pos
            tl_l[i] = 64
            pos += 64
        wi = pos >> 6
        sh = pos & 63
        if sh <= 52:
            h = (w[wi] >> (52 - sh)) & 4095
        else:
            h = (((w[wi] << 64) | w[wi + 1]) >> (116 - sh)) & 4095
        if h < 2048:  # flag 0: same value
            pos += 1
            vh_l[i] = -1
        else:
            vh_l[i] = h & 0x7FF
            pos += 12
            vo_l[i] = pos
            pos += (h & 0x3F) + 1  # mbits
    if pos > nbits_total:
        raise ValueError("The passed byte array is not a valid compressed timeseries.")
    t_off = np.array(to_l, dtype=np.int64)
    t_len = np.array(tl_l, dtype=np.int64)
    v_off = np.array(vo_l, dtype=np.int64)
    v_hdr = np.array(vh_l, dtype=np.int64)

    buf = np.frombuffer(pad, dtype=np.uint8)
    ts = np.empty(n, dtype=np.int64)
    payload = np.empty(n, dtype=_U64)
    ts[0] = block_ts + first_off
    payload[0] = p0
    if m:
        zz = _extract_bit_fields(buf, t_off, t_len)  # zero-length fields -> 0 = dod 0
        zz_masked = np.where(t_len > 0, zz, _U64(0))
        dod = ((zz_masked >> _U64(1)).astype(np.int64)) ^ -(zz_masked & _U64(1)).astype(np.int64)
        delta = first_off + np.cumsum(dod)
        ts[1:] = ts[0] + np.cumsum(delta)
        changed = v_hdr >= 0
        mbits = np.where(changed, (v_hdr & 0x3F) + 1, 1).astype(np.int64)
        lz = np.where(changed, v_hdr >> 6, 0).astype(np.int64)
        bits = _extract_bit_fields(buf, v_off, np.where(changed, mbits, 0))
        tz = (64 - lz - mbits).astype(_U64)
        x = np.where(changed, bits << tz, _U64(0))
        payload[1:] = p0 ^ np.bitwise_xor.accumulate(x)
    return ts, payload


def _decompress_payloads_seq(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Reference single-pass bit-reader decode (kept for parity tests)."""
    r = _BitReader(data)
    n = r.read(32)
    if n == 0 or len(data) < 8:
        raise ValueError("The passed byte array is not a valid compressed timeseries.")
    block_ts = r.read(64)
    if block_ts >= 1 << 63:
        block_ts -= 1 << 64
    first_off = r.read(27)
    ts = np.empty(n, dtype=np.int64)
    payload = np.empty(n, dtype=_U64)
    ts[0] = block_ts + first_off
    payload[0] = _U64(r.read(64))
    delta = first_off
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(7))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(9))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(12))
        else:
            dod = _unzigzag(r.read(64))
        delta += dod
        ts[i] = ts[i - 1] + delta
        if r.read(1) == 0:
            payload[i] = payload[i - 1]
        else:
            lz = r.read(5)
            mbits = r.read(6) + 1
            bits = r.read(mbits)
            tz = 64 - lz - mbits
            payload[i] = payload[i - 1] ^ _U64(bits << tz)
    return ts, payload


# ------------------------------------------------------------------ block containers


def compress_value_block(ts: np.ndarray, values: np.ndarray, block_ts: int | None = None) -> bytes:
    """values: float64 -> Gorilla array of their bit patterns."""
    return compress_payloads(ts, np.asarray(values, dtype=np.float64).view(_U64), block_ts)


def decompress_value_block(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    ts, payload = decompress_payloads(data)
    return ts, payload.view(np.float64)


def compress_tuple_block(
    ts: np.ndarray, values: np.ndarray, validities: np.ndarray, block_ts: int | None = None
) -> bytes:
    """TupleGorillaBlock serialization: ``len(values):int32 ++ values ++ validities``
    (container layout per ``archive/GorillaBlock.scala:39-48``)."""
    vb = compress_value_block(ts, values, block_ts)
    db = compress_payloads(ts, np.asarray(validities, dtype=np.int64).view(_U64), block_ts)
    return len(vb).to_bytes(4, "big") + vb + db


def decompress_tuple_block(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if len(data) < 4:
        raise ValueError("The byte arrays in this block are not a valid compressed timeseries.")
    vlen = int.from_bytes(data[:4], "big")
    if vlen <= 0 or 4 + vlen > len(data):
        raise ValueError("The byte arrays in this block are not a valid compressed timeseries.")
    ts, vals = decompress_value_block(data[4 : 4 + vlen])
    ts2, validities = decompress_payloads(data[4 + vlen :])
    if not np.array_equal(ts, ts2):
        raise ValueError("The byte arrays in this block are not a valid compressed timeseries.")
    return ts, vals, validities.view(np.int64)


def compress_sampled_block(ts: np.ndarray, values: np.ndarray, block_ts: int | None = None) -> bytes:
    """SampledGorillaBlock: single array; constant validity (the sample rate) is kept
    outside the bytes (``archive/GorillaBlock.scala:90-121``)."""
    return compress_value_block(ts, values, block_ts)


def decompress_sampled_block(data: bytes, sample_rate: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if sample_rate <= 0:
        raise ValueError("Sampling rate must be positive.")
    ts, vals = decompress_value_block(data)
    return ts, vals, np.full(len(ts), sample_rate, dtype=np.int64)
