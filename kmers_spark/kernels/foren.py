"""Frame-of-reference + delta/zigzag encoding for int64 columns
(timestamps as epoch-microseconds, monotone-ish ids).

Two sub-modes, chosen by whichever yields the smaller residual width:
  'for'   : residual = v - min(v)                (good for bounded ranges)
  'delta' : residual = zigzag(v[i] - v[i-1])     (good for near-sorted, e.g.
            per-host warc_ts with jitter — FIXTURES.md §1)
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
    w_for = bitpack.width_for(int(res_for.max()))

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    np.subtract(v[1:].view(np.uint64), v[:-1].view(np.uint64), out=deltas[1:].view(np.uint64))
    res_delta = _zigzag(deltas)
    w_delta = bitpack.width_for(int(res_delta.max()))

    if w_delta < w_for:
        mode, width, res = "delta", w_delta, res_delta
        base = int(v[0])
    else:
        mode, width, res = "for", w_for, res_for
    payload = bitpack.pack(res, width)
    return payload, {"n": n, "mode": mode, "base": base, "width": width}


def decode(payload: bytes, meta: dict) -> np.ndarray:
    n = meta["n"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    res = bitpack.unpack(payload, meta["width"], n)
    base = np.int64(meta["base"])
    if meta["mode"] == "for":
        return (res + base.view(np.uint64)).view(np.int64)
    deltas = _unzigzag(res)
    out = np.cumsum(deltas.view(np.uint64), dtype=np.uint64)
    out += base.view(np.uint64)
    return out.view(np.int64)
