"""Posting-list block codecs: delta + FOR bit-packing + variable-byte, in numpy.

Modeled on (behavior, not code) Lucene 8.4's postings format:
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/codecs/lucene84/ForUtil.java:33
    (BLOCK_SIZE = 128), ForDeltaUtil.java:57-82 (delta then FOR-pack; all-1s escape),
  Lucene84PostingsWriter.java:368-404 (vInt tail when docFreq < 128; singleton inline).

The byte layout is our own (the north rule requires delta + variable-byte FOR-style
compression with exact decoded values, not Lucene's file format). Layout per stream:

  header byte 0       -> all values == 1, no payload (dense-run escape)
  header byte 1-64    -> FOR: every value bit-packed at `header` bits, LSB-first
  header byte 129-192 -> PFOR at (header-128) bits: [n_exceptions:1][packed low
                         bits][vbyte: exception-index deltas then high bits]
                         (PForUtil.java behavior: <=7 exceptions per block)
  header byte 255     -> variable-byte (7-bit groups, little-endian, MSB = continue)

Every stream is self-describing via its header, so DECODE is codec-agnostic;
a "codec" (see the Codec SPI at the bottom) only chooses the encoder. Indexes
built with different codecs can therefore be merged freely — the per-segment
codec recorded in the catalog governs how NEW segments are written, exactly
the SegmentInfo-records-the-codec contract of Lucene's Codec SPI
(codecs/Codec.java:1 forName/availableCodecs).

docids are stored as (first_doc, payload of successive deltas); freqs are stored
verbatim; positions are per-doc delta streams concatenated and vByte-coded, split
back using freqs. Norm bytes ride along raw (1 byte/doc) so the query kernel is
self-contained per postings row (a deliberate Spark-first denormalization replacing
Lucene's separate .nvd norms file).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "BLOCK_SIZE", "vbyte_encode", "vbyte_decode", "pack_bits", "unpack_bits",
    "encode_stream", "decode_stream", "encode_posting_list", "decode_blocks",
    "split_positions", "Codec", "register_codec", "get_codec", "CODECS",
    "encode_stream_pfor", "DEFAULT_CODEC",
]

BLOCK_SIZE = 128  # ForUtil.java:33
_VBYTE = 255
_MAX_VBYTE_LEN = 10
_PFOR_BASE = 128  # header 129..192 = PFOR at (header-128) bits
_PFOR_MAX_EXCEPTIONS = 7  # PForUtil.java: at most 7 patched values per block


def vbyte_encode(values) -> bytes:
    """Little-endian base-128 varint encoding of a uint64 array (vectorized).

    Tiny arrays (the common case for low-df terms) take a pure-Python fast
    path — a dozen numpy dispatches cost more than the loop they replace."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if v.size <= 16:
        out = bytearray()
        for x in v.tolist():
            while x >= 0x80:
                out.append((x & 0x7F) | 0x80)
                x >>= 7
            out.append(x)
        return bytes(out)
    maxbits = int(v.max()).bit_length()
    if maxbits <= 7:
        # every value fits one byte (the dominant case for position deltas
        # and small doc gaps): the varint IS the value, one cast total
        return v.astype(np.uint8).tobytes()
    lens = np.ones(v.shape, dtype=np.int64)
    for shift in range(7, maxbits, 7):
        lens += (v >= np.uint64(1 << shift)).astype(np.int64)
    total = int(lens.sum())
    out = np.zeros(total, dtype=np.uint8)
    offsets = np.cumsum(lens) - lens
    for j in range(_MAX_VBYTE_LEN):
        mask = lens > j
        if not mask.any():
            break
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lens[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[mask] + j] = chunk | cont
    return out.tobytes()


def vbyte_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode n varints from buf; returns uint64 array."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero((arr & 0x80) == 0)[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(n, dtype=np.uint64)
    for j in range(_MAX_VBYTE_LEN):
        idx = starts + j
        mask = idx <= ends
        if not mask.any():
            break
        out[mask] |= (arr[idx[mask]] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return out


def pack_bits(values, bits: int) -> bytes:
    """FOR: pack each value into `bits` bits, LSB-first bit order."""
    v = np.asarray(values, dtype=np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    bitmat = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bitmat.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, bits: int) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    flat = np.unpackbits(arr, count=n * bits, bitorder="little")
    bitmat = flat.reshape(n, bits).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64))
    return bitmat @ weights


_ONE_HEADER = bytes([0])


def encode_stream(values) -> bytes:
    """Encode a positive-int stream with the header scheme documented above."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return _ONE_HEADER
    if v.size <= 16:  # fast path: python comparisons beat numpy dispatch here
        lst = v.tolist()
        if all(x == 1 for x in lst):
            return _ONE_HEADER
        return bytes([_VBYTE]) + vbyte_encode(v)
    if (v == 1).all():
        return _ONE_HEADER  # all-1s escape (ForDeltaUtil.java:57-70 analog)
    if v.size < 32:
        return bytes([_VBYTE]) + vbyte_encode(v)
    bits = max(1, int(v.max()).bit_length())
    if bits >= _VBYTE:  # unreachable for <2^64 but keep the guard
        return bytes([_VBYTE]) + vbyte_encode(v)
    return bytes([bits]) + pack_bits(v, bits)


def _pfor_try_encode(v: np.ndarray) -> bytes | None:
    """Patched FOR (PForUtil.java behavior): pack every value at the bit
    width of the (MAX_EXCEPTIONS+1)-th largest value; the few larger
    "exception" values store their overflowing high bits out-of-band.
    Returns None when patching wins nothing over plain FOR."""
    n = v.size
    max_bits = int(v.max()).bit_length()
    k = min(_PFOR_MAX_EXCEPTIONS, n - 1)
    # bit width covering all but the top-k values
    bits = max(1, int(np.partition(v, n - 1 - k)[n - 1 - k]).bit_length())
    if bits >= max_bits:
        return None
    mask = np.uint64((1 << bits) - 1)
    exc_idx = np.flatnonzero(v > mask)
    if exc_idx.size == 0 or exc_idx.size > _PFOR_MAX_EXCEPTIONS:
        return None
    low = v & mask
    high = v[exc_idx] >> np.uint64(bits)
    idx_deltas = np.empty(exc_idx.size, dtype=np.uint64)
    idx_deltas[0] = exc_idx[0]
    idx_deltas[1:] = np.diff(exc_idx)
    return (bytes([_PFOR_BASE + bits, exc_idx.size])
            + pack_bits(low, bits)
            + vbyte_encode(np.concatenate([idx_deltas, high])))


def encode_stream_pfor(values) -> bytes:
    """Like encode_stream, but considers a patched-FOR layout and keeps the
    smaller of {FOR, PFOR} for packable streams (same escapes otherwise)."""
    v = np.asarray(values, dtype=np.uint64)
    base = encode_stream(v)
    if v.size < 32 or base[0] in (0, _VBYTE):
        return base
    patched = _pfor_try_encode(v)
    return patched if patched is not None and len(patched) < len(base) else base


def decode_stream(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    header = buf[0]
    if header == 0:
        return np.ones(n, dtype=np.uint64)
    if header == _VBYTE:
        return vbyte_decode(buf[1:], n)
    if header > _PFOR_BASE:
        bits = header - _PFOR_BASE
        n_exc = buf[1]
        packed_len = (n * bits + 7) // 8
        out = unpack_bits(buf[2:2 + packed_len], n, bits)
        tail = vbyte_decode(buf[2 + packed_len:], 2 * n_exc)
        idx = np.cumsum(tail[:n_exc].astype(np.int64))
        out[idx] |= tail[n_exc:] << np.uint64(bits)
        return out
    return unpack_bits(buf[1:], n, header)


def _vb_small(lst) -> bytes:
    out = bytearray()
    for x in lst:
        while x >= 0x80:
            out.append((x & 0x7F) | 0x80)
            x >>= 7
        out.append(x)
    return bytes(out)


def _stream_small(lst) -> bytes:
    """encode_stream for python lists of size <= 16 — identical byte output."""
    if not lst:
        return _ONE_HEADER
    for x in lst:
        if x != 1:
            return bytes([_VBYTE]) + _vb_small(lst)
    return _ONE_HEADER


def _encode_small(docids, freqs, norm_bytes, positions, payloads=None,
                  offsets=None):
    """Pure-python single-block encoder for df <= 16 posting lists.

    Low-df terms are the overwhelming majority (Zipf), and at this size the
    numpy dispatch overhead of the vectorized path costs more than the whole
    list. Byte output is identical to the general path."""
    n = len(docids)
    deltas = [docids[i + 1] - docids[i] for i in range(n - 1)]
    blk = {
        "first_doc": docids[0],
        "last_doc": docids[-1],
        "count": n,
        "max_freq": max(freqs),
        "min_norm": min(norm_bytes),
        "doc_bytes": _stream_small(deltas),
        "freq_bytes": _stream_small(freqs),
        "norm_bytes": bytes(norm_bytes),
    }
    if positions is not None:
        dp = []
        for p in positions:
            prev = 0
            first = True
            for x in p:
                dp.append(x if first else x - prev)
                prev = x
                first = False
        blk["pos_bytes"] = _vb_small(dp)
    else:
        blk["pos_bytes"] = b""
    if payloads is not None:
        blk["pay_bytes"] = _vb_small([int(x) for p in payloads for x in p])
    else:
        blk["pay_bytes"] = b""
    if offsets is not None:
        # interleaved per position: (start delta within the doc run — first
        # position of each doc stores its start absolute — then the length)
        starts, lens = offsets
        iv = []
        for sl, ll in zip(starts, lens):
            prev = 0
            first = True
            for s, ln in zip(sl, ll):
                iv.append(int(s) if first else int(s) - prev)
                iv.append(int(ln))
                prev = int(s)
                first = False
        blk["off_bytes"] = _vb_small(iv)
    else:
        blk["off_bytes"] = b""
    return [blk]


def encode_posting_list(docids, freqs, norm_bytes, positions=None,
                        block_size: int = BLOCK_SIZE,
                        codec: "str | Codec" = "for-vbyte",
                        payloads=None, offsets=None):
    """Encode one (segment, term) posting list into 128-doc blocks.

    docids: strictly-increasing int array; freqs: int array >= 1; norm_bytes:
    uint8 array (quantized doc length of each posting's doc); positions: optional
    list of per-doc ascending position arrays, OR a single flat 1-D int64
    array of all positions already concatenated in posting order (freqs give
    the per-doc split — the zero-copy path _encode_partition uses after its
    partition-level gather); payloads: optional per-doc int lists or the same
    flat shape, one payload per position (the .pay channel,
    Lucene84PostingsFormat.java:99-103 — requires positions); offsets:
    optional (starts, lens) pair — per-doc int lists or flat 1-D arrays
    aligned 1:1 with positions — the per-position character offsets of
    IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS (offsets ride the
    same .pay file in Lucene84PostingsFormat.java:99-103; demo
    StartsTest.java indexes with offsets). Stored interleaved per position
    as (start delta within the doc run, length), vByte-coded.

    ``codec`` selects the stream encoder for the doc-delta and freq streams of
    blocks with >16 postings (see the Codec SPI below; small lists always take
    the vInt tail, matching Lucene84PostingsWriter.java:368-404 regardless of
    codec). Decode needs no codec: streams are header-self-describing.

    Returns a list of block dicts with keys:
      first_doc, last_doc, count, max_freq, min_norm, doc_bytes, freq_bytes,
      norm_bytes, pos_bytes, pay_bytes, off_bytes
    """
    if payloads is not None and positions is None:
        raise ValueError("payloads require positions")
    if offsets is not None and positions is None:
        raise ValueError("offsets require positions")
    enc = get_codec(codec).encode_stream

    def _split_flat(flat, fl):
        # one tolist + python slices: np.split's per-slice array views cost
        # more than they save at <=16 docs
        vals = flat.tolist()
        out, o = [], 0
        for c in fl:
            c = int(c)
            out.append(vals[o:o + c])
            o += c
        return out

    if len(docids) <= 16:
        dl = [int(x) for x in docids]
        assert dl and all(b > a for a, b in zip(dl, dl[1:])), \
            "docids must be strictly increasing"
        if (isinstance(positions, np.ndarray) and positions.ndim == 1
                and positions.dtype != object):
            positions = _split_flat(positions, freqs)
        elif positions is not None:
            positions = [[int(x) for x in p] for p in positions]
        if (isinstance(payloads, np.ndarray) and payloads.ndim == 1
                and payloads.dtype != object):
            payloads = _split_flat(payloads, freqs)
        elif payloads is not None:
            payloads = [[int(x) for x in p] for p in payloads]
        if offsets is not None:
            st, ln = offsets
            if (isinstance(st, np.ndarray) and st.ndim == 1
                    and st.dtype != object):
                st = _split_flat(st, freqs)
                ln = _split_flat(np.asarray(ln), freqs)
            else:
                st = [[int(x) for x in p] for p in st]
                ln = [[int(x) for x in p] for p in ln]
            offsets = (st, ln)
        return _encode_small(
            dl, [int(x) for x in freqs], [int(x) for x in norm_bytes],
            positions, payloads, offsets)

    docids = np.asarray(docids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    norm_bytes = np.asarray(norm_bytes, dtype=np.uint8)
    n = docids.size
    assert n and (np.diff(docids) > 0).all(), "docids must be strictly increasing"

    # Vectorize the per-doc positions delta over the WHOLE list at once:
    # within-doc deltas with a reset at each doc boundary (first position of a
    # doc is stored absolute). One pass, no per-doc numpy churn.
    flat_dp = None
    pos_offsets = None
    flat_pay = None
    flat_off = None
    if positions is not None:
        if (isinstance(positions, np.ndarray) and positions.ndim == 1
                and positions.dtype != object):
            flat = positions.astype(np.int64, copy=False)
        else:
            if positions and not isinstance(positions[0], np.ndarray):
                positions = [np.asarray(p, dtype=np.int64) for p in positions]
            flat = (np.concatenate(positions) if positions
                    else np.zeros(0, dtype=np.int64))
        counts = freqs  # freq == number of positions per posting
        starts = np.cumsum(counts)[:-1] if n > 1 else np.zeros(0, np.int64)
        flat_dp = np.empty(flat.size, dtype=np.int64)
        if flat.size:
            flat_dp[0] = flat[0]
            flat_dp[1:] = flat[1:] - flat[:-1]
            flat_dp[starts] = flat[starts]  # reset delta at doc boundaries
        pos_offsets = np.concatenate([[0], np.cumsum(counts)])
        if payloads is not None:
            if (isinstance(payloads, np.ndarray) and payloads.ndim == 1
                and payloads.dtype != object):
                flat_pay = payloads.astype(np.int64, copy=False)
            else:
                flat_pay = (np.concatenate(
                    [np.asarray(p, dtype=np.int64) for p in payloads])
                    if payloads else np.zeros(0, dtype=np.int64))
        if offsets is not None:
            st, ln = offsets

            def _flat(a):
                if (isinstance(a, np.ndarray) and a.ndim == 1
                        and a.dtype != object):
                    return a.astype(np.int64, copy=False)
                parts_ = [np.asarray(p, dtype=np.int64) for p in a]
                return (np.concatenate(parts_) if parts_
                        else np.zeros(0, dtype=np.int64))

            fst, fln = _flat(st), _flat(ln)
            # start deltas reset at each doc boundary (same scheme as the
            # positions stream) — starts ascend within a doc's positions
            sd = np.empty(fst.size, dtype=np.int64)
            if fst.size:
                sd[0] = fst[0]
                sd[1:] = fst[1:] - fst[:-1]
                sd[starts] = fst[starts]
            flat_off = np.empty(2 * fst.size, dtype=np.int64)
            flat_off[0::2] = sd
            flat_off[1::2] = fln

    blocks = []
    for start in range(0, n, block_size):
        end = min(start + block_size, n)
        d = docids[start:end]
        f = freqs[start:end]
        nb = norm_bytes[start:end]
        deltas = np.diff(d).astype(np.uint64)  # first_doc stored in metadata
        blk = {
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "count": int(end - start),
            "max_freq": int(f.max()),
            "min_norm": int(nb.min()),
            "doc_bytes": enc(deltas) if deltas.size else _ONE_HEADER,
            "freq_bytes": enc(f),
            "norm_bytes": nb.tobytes(),
        }
        if flat_dp is not None:
            blk["pos_bytes"] = vbyte_encode(
                flat_dp[pos_offsets[start]:pos_offsets[end]].astype(np.uint64))
        else:
            blk["pos_bytes"] = b""
        if flat_pay is not None:
            blk["pay_bytes"] = vbyte_encode(
                flat_pay[pos_offsets[start]:pos_offsets[end]].astype(np.uint64))
        else:
            blk["pay_bytes"] = b""
        if flat_off is not None:
            blk["off_bytes"] = vbyte_encode(
                flat_off[2 * pos_offsets[start]:2 * pos_offsets[end]]
                .astype(np.uint64))
        else:
            blk["off_bytes"] = b""
        blocks.append(blk)
    return blocks


def decode_blocks(blocks, want_positions: bool = False,
                  want_payloads: bool = False,
                  want_offsets: bool = False):
    """Decode block dicts/Rows back to
    (docids, freqs, norm_bytes[, positions][, payloads][, starts, ends]).

    positions (and payloads/offsets, aligned 1:1 with them) are returned as
    flat int64 arrays plus per-posting freq split (use split_positions to get
    per-doc lists). want_payloads implies positions are present in the
    blocks; segments without a payload channel yield all-zero payloads.
    want_offsets appends per-position character (starts, ends) arrays;
    segments without an offsets channel yield all-zero starts/ends."""
    all_d, all_f, all_n, all_p = [], [], [], []
    all_pay = []
    all_os, all_oe = [], []
    for blk in blocks:
        cnt = int(blk["count"])
        deltas = decode_stream(bytes(blk["doc_bytes"]), cnt - 1) if cnt > 1 else \
            np.zeros(0, dtype=np.uint64)
        d = np.empty(cnt, dtype=np.int64)
        d[0] = int(blk["first_doc"])
        if cnt > 1:
            d[1:] = d[0] + np.cumsum(deltas.astype(np.int64))
        f = decode_stream(bytes(blk["freq_bytes"]), cnt).astype(np.int64)
        nb = np.frombuffer(bytes(blk["norm_bytes"]), dtype=np.uint8)
        all_d.append(d)
        all_f.append(f)
        all_n.append(nb)
        if want_positions:
            total_pos = int(f.sum())
            flat = vbyte_decode(bytes(blk["pos_bytes"]), total_pos).astype(np.int64)
            # undo per-doc delta coding: positions restart at each doc boundary
            boundaries = np.cumsum(f)[:-1]
            csum = np.cumsum(flat)
            base = np.zeros(total_pos, dtype=np.int64)
            if boundaries.size:
                # subtract the running sum accumulated before each doc's first pos
                prior = np.zeros(total_pos, dtype=np.int64)
                prior[boundaries] = csum[boundaries - 1]
                np.maximum.accumulate(prior, out=prior)
                base = prior
            all_p.append(csum - base)
        if want_payloads:
            total_pos = int(f.sum())
            try:
                raw = blk["pay_bytes"]
            except (KeyError, ValueError):  # pre-payload segment / old Row
                raw = None
            if raw:
                all_pay.append(
                    vbyte_decode(bytes(raw), total_pos).astype(np.int64))
            else:
                all_pay.append(np.zeros(total_pos, dtype=np.int64))
        if want_offsets:
            total_pos = int(f.sum())
            try:
                raw = blk["off_bytes"]
            except (KeyError, ValueError):  # pre-offsets segment / old Row
                raw = None
            if raw:
                iv = vbyte_decode(bytes(raw), 2 * total_pos).astype(np.int64)
                sd, ln = iv[0::2], iv[1::2]
                # undo the per-doc delta coding exactly like positions
                boundaries = np.cumsum(f)[:-1]
                csum = np.cumsum(sd)
                base = np.zeros(total_pos, dtype=np.int64)
                if boundaries.size:
                    prior = np.zeros(total_pos, dtype=np.int64)
                    prior[boundaries] = csum[boundaries - 1]
                    np.maximum.accumulate(prior, out=prior)
                    base = prior
                st = csum - base
                all_os.append(st)
                all_oe.append(st + ln)
            else:
                all_os.append(np.zeros(total_pos, dtype=np.int64))
                all_oe.append(np.zeros(total_pos, dtype=np.int64))
    d = np.concatenate(all_d) if all_d else np.zeros(0, dtype=np.int64)
    f = np.concatenate(all_f) if all_f else np.zeros(0, dtype=np.int64)
    nb = np.concatenate(all_n) if all_n else np.zeros(0, dtype=np.uint8)
    out = [d, f, nb]
    if want_positions:
        out.append(np.concatenate(all_p) if all_p
                   else np.zeros(0, dtype=np.int64))
    if want_payloads:
        out.append(np.concatenate(all_pay) if all_pay
                   else np.zeros(0, dtype=np.int64))
    if want_offsets:
        out.append(np.concatenate(all_os) if all_os
                   else np.zeros(0, dtype=np.int64))
        out.append(np.concatenate(all_oe) if all_oe
                   else np.zeros(0, dtype=np.int64))
    return tuple(out)


def split_positions(flat_positions: np.ndarray, freqs: np.ndarray):
    """Split the flat positions array into per-posting arrays by freq."""
    return np.split(flat_positions, np.cumsum(np.asarray(freqs))[:-1])


# ---------------------------------------------------------------------------
# Codec SPI (codecs/Codec.java forName/availableCodecs analog)
# ---------------------------------------------------------------------------

class Codec:
    """A named stream-encoder choice. Decode is codec-agnostic (headers are
    self-describing), so a Codec only supplies ``encode_stream`` for the
    doc-delta and freq streams of large blocks. Register additional codecs
    with ``register_codec`` (the SPI extension point); the index catalog
    records the codec name at build time and the writer/merger re-resolve it
    by name — Codec.forName semantics."""

    def __init__(self, name: str, encode_stream_fn):
        self.name = name
        self.encode_stream = encode_stream_fn

    def __repr__(self) -> str:  # pragma: no cover
        return f"Codec({self.name!r})"


CODECS: dict[str, Codec] = {}


def register_codec(codec: Codec) -> Codec:
    CODECS[codec.name] = codec
    return codec


def get_codec(name: "str | Codec") -> Codec:
    if isinstance(name, Codec):
        return name
    try:
        return CODECS[name]
    except KeyError:
        raise ValueError(
            f"unknown codec {name!r}; available: {sorted(CODECS)}") from None


DEFAULT_CODEC = register_codec(Codec("for-vbyte", encode_stream))
register_codec(Codec("pfor", encode_stream_pfor))
# always-vByte: no bit-packing — a deliberately simple SPI reference codec
register_codec(Codec("vbyte", lambda v: (
    _ONE_HEADER if (np.asarray(v, dtype=np.uint64) == 1).all()
    else bytes([_VBYTE]) + vbyte_encode(v))))
