"""Float codecs for double columns.

Two families (the reference has none — this is the north rule's codec
suite requirement, BASELINE.md round-2 list):

* dec_scale — decimal-scaled integers: many real-world doubles are
  fixed-point (prices, scores rounded to d decimals). If every value is
  BITWISE-identical after v -> round(v * 10^s) -> int64 -> /10^s, store
  the scaled int64s with the existing frame-of-reference bit-packer.
  Exactness is verified over the FULL block at encode time (a sample-
  based selector choice can be wrong); on failure the encoder falls
  back to xor_float and records the actual codec in the block meta.

* xor_float — Gorilla-style XOR of consecutive IEEE-754 bit patterns
  (Facebook Gorilla, VLDB'15): neighbors of similar magnitude share
  sign/exponent/high-mantissa bits, so the XOR stream is zero-dense and
  the codec layer's zlib entropy backstop compresses it. Batched numpy
  (view u64, xor-shift, bitwise_xor.accumulate on decode) — no per-value
  Python, unlike the bit-granular original, trading a few % of ratio
  for vectorization.

Bit-identity contract: both decoders reproduce the exact input bit
patterns (including -0.0 and NaN payloads for xor_float; dec_scale
refuses non-finite/-0.0-ambiguous blocks via the bitwise check).
"""

from __future__ import annotations

import numpy as np

from . import foren

DEC_SCALE_MAX = 4  # try 10^0 .. 10^4


def find_dec_scale(v: np.ndarray) -> int:
    """Smallest s such that v == round(v * 10^s) / 10^s BITWISE for all
    values (and the scaled magnitudes are exactly representable);
    -1 if none. v must be float64."""
    if len(v) == 0:
        return 0
    if not np.isfinite(v).all():
        return -1
    u = v.view(np.uint64)
    for s in range(DEC_SCALE_MAX + 1):
        m = 10.0 ** s
        scaled = np.round(v * m)
        if np.abs(scaled).max() >= 2**53:
            return -1
        back = scaled.astype(np.int64).astype(np.float64) / m
        if (back.view(np.uint64) == u).all():
            return s
    return -1


def encode_dec_scale(v: np.ndarray, scale: int) -> tuple[bytes, dict]:
    ints = np.round(v * 10.0 ** scale).astype(np.int64)
    body, fmeta = foren.encode(ints)
    return body, {"fscale": scale, "for": fmeta}


def decode_dec_scale(body: bytes, meta: dict) -> np.ndarray:
    ints = np.asarray(foren.decode(body, meta["for"]))
    return ints.astype(np.float64) / 10.0 ** meta["fscale"]


def encode_xor(v: np.ndarray) -> bytes:
    u = v.view(np.uint64)
    x = u.copy()
    x[1:] ^= u[:-1]
    return x.astype("<u8").tobytes()


def decode_xor(body: bytes, n: int) -> np.ndarray:
    x = np.frombuffer(body, dtype="<u8", count=n).astype(np.uint64)
    u = np.bitwise_xor.accumulate(x)
    return u.view(np.float64)


def xor_zero_frac(v: np.ndarray) -> float:
    """Fraction of zero BYTES in the xor-delta stream — the selector's
    signal for whether xor_float (+ zlib backstop) will pay off."""
    if len(v) < 2:
        return 0.0
    u = v.view(np.uint64)
    x = (u[1:] ^ u[:-1]).copy().view(np.uint8)
    return float((x == 0).mean())
