"""Frame-of-reference + delta/zigzag encoding for int64 columns
(timestamps as epoch-microseconds, monotone-ish ids).

Two sub-modes, chosen by whichever yields the smaller residual width:
  'for'   : residual = v - min(v)                (good for bounded ranges)
  'delta' : residual = zigzag(v[i] - v[i-1])     (good for near-sorted, e.g.
            per-host warc_ts with jitter — FIXTURES.md §1)
Before packing, a common divisor is extracted from the residuals
(meta "gcd"): coarse-granularity values stored in fine units — the
Common-Crawl case, WARC-Date has 1-second resolution but warc_ts is
epoch-MICROseconds — carry log2(gcd) dead bits per value (20 bits for
gcd=1e6) that a plain frame-of-reference would pack anyway.
All arithmetic is done in uint64 two's-complement so overflow wraps and
round-trips exactly. Residuals are bit-packed (kernels.bitpack).
"""

from __future__ import annotations

import numpy as np

from . import bitpack


def _zigzag(d: np.ndarray) -> np.ndarray:
    d = d.astype(np.int64)
    return ((d << np.int64(1)) ^ (d >> np.int64(63))).view(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64)
    return ((z >> np.uint64(1)).view(np.int64)) ^ -((z & np.uint64(1)).view(np.int64))


def encode(arr: np.ndarray) -> tuple[bytes, dict]:
    """Dense int64 array -> (payload, meta)."""
    v = np.ascontiguousarray(arr, dtype=np.int64)
    n = v.shape[0]
    if n == 0:
        return b"", {"n": 0, "mode": "for", "base": 0, "width": 0}

    base = int(v.min())
    res_for = v.view(np.uint64) - np.int64(base).view(np.uint64)
    g_for = int(np.gcd.reduce(res_for))
    if g_for > 1:
        res_for = res_for // np.uint64(g_for)
    w_for = bitpack.width_for(int(res_for.max()))

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    np.subtract(v[1:].view(np.uint64), v[:-1].view(np.uint64), out=deltas[1:].view(np.uint64))
    # gcd extraction happens BEFORE zigzag (zigzag of a negative multiple
    # is odd, which would destroy the common divisor)
    g_delta = int(np.gcd.reduce(np.abs(deltas).view(np.uint64)))
    if g_delta >= 1 << 63:
        # a gcd this large (only nonzero delta wraps to int64 min, e.g.
        # [-2**62, 2**62]) doesn't fit np.int64 — extraction can't pay
        # (one 64-bit residual either way), so skip it
        g_delta = 1
    if g_delta > 1:
        deltas = deltas // np.int64(g_delta)
    res_delta = _zigzag(deltas)
    w_delta = bitpack.width_for(int(res_delta.max()))

    if w_delta < w_for:
        mode, width, res, g = "delta", w_delta, res_delta, g_delta
        base = int(v[0])
    else:
        mode, width, res, g = "for", w_for, res_for, g_for
    payload = bitpack.pack(res, width)
    meta = {"n": n, "mode": mode, "base": base, "width": width}
    if g > 1:
        meta["gcd"] = g
    return payload, meta


def decode(payload: bytes, meta: dict) -> np.ndarray:
    n = meta["n"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    res = bitpack.unpack(payload, meta["width"], n)
    g = meta.get("gcd", 1)
    base = np.int64(meta["base"])
    if meta["mode"] == "for":
        if g > 1:
            res = res * np.uint64(g)
        return (res + base.view(np.uint64)).view(np.int64)
    deltas = _unzigzag(res)
    if g > 1:
        deltas = deltas * np.int64(g)
    out = np.cumsum(deltas.view(np.uint64), dtype=np.uint64)
    out += base.view(np.uint64)
    return out.view(np.int64)
