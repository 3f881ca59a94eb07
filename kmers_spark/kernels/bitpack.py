"""n-bit integer bit-packing, little-endian bit order.

Generalizes the reference's fixed 2-bit packing:
  - word-count math `ceil(K / per_word)` — /root/reference/src/kmer.rs:67-69
  - low-bits-first symbol layout — /root/reference/src/naive_impl/kmer.rs:219-223
Code i occupies bits [i*width, (i+1)*width) of the stream,
least-significant bit first within each byte (numpy bitorder='little').

The reference's MASK_TABLE[32]=0 quirk (kmer.rs:617) taught us to guard
widths explicitly: width must be in [0, 64] and values must fit.
"""

from __future__ import annotations

import numpy as np

_FAST_WIDTHS = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}


def width_for(max_value: int) -> int:
    """Bits needed to represent values in [0, max_value]. 0 if max_value == 0."""
    if max_value < 0:
        raise ValueError(f"max_value must be >= 0, got {max_value}")
    return int(max_value).bit_length()


def _pack_bitmatrix(codes: np.ndarray, width: int) -> bytes:
    """Reference implementation (bit-matrix + packbits): allocates
    ~9x n*width bytes of intermediates, kept for widths 58-63 (a
    shifted lane no longer fits one uint64) and as the property-test
    oracle for the lane kernels below."""
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((codes[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unpack_bitmatrix(buf: bytes, width: int, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def _pack_small(codes: np.ndarray, width: int) -> bytes:
    """width 1..7: 8 codes combine into one uint64 (8*width <= 56
    bits), whose low `width` little-endian bytes ARE their slice of
    the stream. Allocations ~2x the input, no bit matrix."""
    n = codes.shape[0]
    pad = (-n) % 8
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, np.uint64)])
    shifts = np.arange(8, dtype=np.uint64) * np.uint64(width)
    combined = (codes.reshape(-1, 8) << shifts).sum(axis=1, dtype=np.uint64)
    by = combined.astype("<u8").view(np.uint8).reshape(-1, 8)[:, :width]
    return np.ascontiguousarray(by).tobytes()[: packed_nbytes(n, width)]


def _pack_lanes(codes: np.ndarray, width: int) -> bytes:
    """width 9..57: split codes into the 8 phase lanes codes[j::8].
    Within a lane, bit offset mod 8 is CONSTANT ((j*width) & 7) and
    consecutive codes sit exactly `width` bytes apart (8 codes span
    8*width bits = width bytes) — so each lane is one shifted uint64
    view OR-ed through a strided byte window. Lane rows never overlap
    (stride width >= 9 > 8-byte row); lanes overlap each other only
    across separate |= operations. Allocations ~2x the input."""
    n = codes.shape[0]
    nbytes = packed_nbytes(n, width)
    out = np.zeros(nbytes + 16, np.uint8)
    for j in range(8):
        sub = codes[j::8]
        if not sub.shape[0]:
            continue
        s = (j * width) & 7
        start = (j * width) >> 3
        lanes = (sub << np.uint64(s)).astype("<u8").view(np.uint8) \
            .reshape(-1, 8)
        view = np.lib.stride_tricks.as_strided(
            out[start:], shape=(sub.shape[0], 8), strides=(width, 1)
        )
        view |= lanes
    return out[:nbytes].tobytes()


def pack(codes: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints < 2**width into a little-endian bit stream."""
    if not 0 <= width <= 64:
        raise ValueError(f"width must be in [0, 64], got {width}")
    codes = np.ascontiguousarray(codes, dtype=np.uint64)
    n = codes.shape[0]
    if n == 0 or width == 0:
        return b""
    if width < 64 and codes.max() >> np.uint64(width):
        raise ValueError(f"value does not fit in {width} bits")
    if width in _FAST_WIDTHS:
        return codes.astype(_FAST_WIDTHS[width]).tobytes()
    if width < 8:
        return _pack_small(codes, width)
    if width <= 57:
        return _pack_lanes(codes, width)
    return _pack_bitmatrix(codes, width)


def _unpack_small(buf: bytes, width: int, n: int) -> np.ndarray:
    ngroups = (n + 7) // 8
    nbytes = packed_nbytes(n, width)
    padded = np.zeros(ngroups * width + 8, np.uint8)
    raw = np.frombuffer(buf, dtype=np.uint8)
    # tolerate trailing slack in buf (the bit-matrix implementation
    # always did; callers may hand a padded buffer)
    padded[: min(raw.shape[0], nbytes)] = raw[:nbytes]
    lanes = np.lib.stride_tricks.as_strided(
        padded, shape=(ngroups, 8), strides=(width, 1)
    ).copy()  # overlapping READS are safe; copy for a contiguous view
    vals = lanes.view("<u8").ravel()
    shifts = np.arange(8, dtype=np.uint64) * np.uint64(width)
    mask = np.uint64((1 << width) - 1)
    return ((vals[:, None] >> shifts) & mask).ravel()[:n]


def _unpack_lanes(buf: bytes, width: int, n: int) -> np.ndarray:
    nbytes = packed_nbytes(n, width)
    padded = np.zeros(nbytes + 16, np.uint8)
    raw = np.frombuffer(buf, dtype=np.uint8)
    padded[: min(raw.shape[0], nbytes)] = raw[:nbytes]
    out = np.empty(n, np.uint64)
    mask = np.uint64((1 << width) - 1)
    for j in range(8):
        cnt = len(range(j, n, 8))
        if not cnt:
            continue
        s = (j * width) & 7
        start = (j * width) >> 3
        lanes = np.lib.stride_tricks.as_strided(
            padded[start:], shape=(cnt, 8), strides=(width, 1)
        ).copy()
        out[j::8] = (lanes.view("<u8").ravel() >> np.uint64(s)) & mask
    return out


def unpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns uint64 array of length n."""
    if not 0 <= width <= 64:
        raise ValueError(f"width must be in [0, 64], got {width}")
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _FAST_WIDTHS:
        return np.frombuffer(buf, dtype=_FAST_WIDTHS[width], count=n).astype(np.uint64)
    if width < 8:
        return _unpack_small(buf, width, n)
    if width <= 57:
        return _unpack_lanes(buf, width, n)
    return _unpack_bitmatrix(buf, width, n)


def packed_nbytes(n: int, width: int) -> int:
    """Physical size of the packed form (reference: Kmer::num_bytes, src/kmer.rs:41-43)."""
    if width in _FAST_WIDTHS:
        return n * (width // 8)
    return (n * width + 7) // 8
