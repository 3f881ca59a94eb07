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
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((codes[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns uint64 array of length n."""
    if not 0 <= width <= 64:
        raise ValueError(f"width must be in [0, 64], got {width}")
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _FAST_WIDTHS:
        return np.frombuffer(buf, dtype=_FAST_WIDTHS[width], count=n).astype(np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def packed_nbytes(n: int, width: int) -> int:
    """Physical size of the packed form (reference: Kmer::num_bytes, src/kmer.rs:41-43)."""
    if width in _FAST_WIDTHS:
        return n * (width // 8)
    return (n * width + 7) // 8
