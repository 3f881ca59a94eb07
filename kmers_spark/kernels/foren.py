"""Frame-of-reference + delta/zigzag encoding for int64 columns
(timestamps as epoch-microseconds, monotone-ish ids).

Four sub-modes, chosen by whichever yields the smallest payload:
  'for'        : residual = v - min(v)            (bounded ranges)
  'delta'      : residual = zigzag(v[i] - v[i-1]) (near-sorted, e.g.
                 per-host warc_ts with jitter — FIXTURES.md §1)
  'pfor_for' / 'pfor_delta' : same residuals, but bit-packed in
                 128-value MINIBLOCKS with per-miniblock widths
                 (PFOR-style, Zukowski et al. ICDE'06; also parquet's
                 DELTA_BINARY_PACKED shape). One outlier delta no
                 longer forces the whole block wide: measured 23%
                 smaller than global-width + zlib on near-sorted
                 timestamps with rare large jumps (host-clustered
                 crawl order), neutral elsewhere (BENCH/ROUND3.md).
                 128 values * w bits is byte-aligned for every w, so
                 equal-width miniblocks pack/unpack as ONE batched
                 kernel call grouped by width — no per-miniblock loop.
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

MB = 128  # PFOR miniblock length; 128*w bits is whole bytes for any w
_POWERS = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))


def _mb_widths(res: np.ndarray) -> np.ndarray:
    """Per-miniblock bit widths (bit_length of each miniblock's max)."""
    n = len(res)
    num = (n + MB - 1) // MB
    pad = num * MB - n
    r = np.concatenate([res, np.zeros(pad, np.uint64)]) if pad else res
    mx = r.reshape(num, MB).max(axis=1)
    return np.searchsorted(_POWERS, mx, side="right").astype(np.uint8)


def _mb_body_sizes(widths: np.ndarray, n: int) -> np.ndarray:
    """Packed byte size of each miniblock (the last may be partial)."""
    sizes = widths.astype(np.int64) * (MB // 8)
    rem = n % MB
    if rem:
        sizes[-1] = (rem * int(widths[-1]) + 7) // 8
    return sizes


def _pfor_pack(res: np.ndarray, widths: np.ndarray) -> bytes:
    """widths header + per-miniblock packed bodies; miniblocks of equal
    width are packed in one bitpack call (byte alignment guarantees the
    concatenation is a valid stream) and scattered to their slots."""
    n = len(res)
    num = len(widths)
    sizes = _mb_body_sizes(widths, n)
    offs = np.zeros(num + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    out = np.zeros(int(offs[-1]), dtype=np.uint8)
    rem = n % MB
    full = num - 1 if rem else num
    fw = widths[:full]
    for w in np.unique(fw):
        if w == 0:
            continue
        mbs = np.nonzero(fw == w)[0]
        vals = res[(mbs[:, None] * MB + np.arange(MB)).ravel()]
        packed = np.frombuffer(bitpack.pack(vals, int(w)), dtype=np.uint8)
        span = int(w) * (MB // 8)
        out[(offs[mbs][:, None] + np.arange(span)).ravel()] = packed
    if rem and widths[-1]:
        tail = np.frombuffer(
            bitpack.pack(res[full * MB :], int(widths[-1])), dtype=np.uint8
        )
        out[offs[-2] : offs[-2] + len(tail)] = tail
    return widths.tobytes() + out.tobytes()


def _pfor_unpack(payload: bytes, n: int) -> np.ndarray:
    num = (n + MB - 1) // MB
    widths = np.frombuffer(payload[:num], dtype=np.uint8)
    body = np.frombuffer(payload[num:], dtype=np.uint8)
    sizes = _mb_body_sizes(widths, n)
    offs = np.zeros(num + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    res = np.zeros(n, dtype=np.uint64)
    rem = n % MB
    full = num - 1 if rem else num
    fw = widths[:full]
    for w in np.unique(fw):
        if w == 0:
            continue
        mbs = np.nonzero(fw == w)[0]
        span = int(w) * (MB // 8)
        blob = body[(offs[mbs][:, None] + np.arange(span)).ravel()]
        vals = bitpack.unpack(blob.tobytes(), int(w), len(mbs) * MB)
        res[(mbs[:, None] * MB + np.arange(MB)).ravel()] = vals
    if rem and widths[-1]:
        res[full * MB :] = bitpack.unpack(
            body[offs[-2] : offs[-1]].tobytes(), int(widths[-1]), rem
        )
    return res


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

    # candidate sizes: global-width for/delta and per-miniblock (PFOR)
    # for/delta; pick the smallest, ties broken in this fixed order
    mbw_for = _mb_widths(res_for)
    mbw_delta = _mb_widths(res_delta)
    num_mb = len(mbw_for)
    cands = [
        ("for", (n * w_for + 7) // 8),
        ("delta", (n * w_delta + 7) // 8),
        ("pfor_for", num_mb + int(_mb_body_sizes(mbw_for, n).sum())),
        ("pfor_delta", num_mb + int(_mb_body_sizes(mbw_delta, n).sum())),
    ]
    mode = min(cands, key=lambda c: c[1])[0]
    meta = {"n": n, "mode": mode}
    if mode == "for":
        payload = bitpack.pack(res_for, w_for)
        meta.update(base=base, width=w_for)
        g = g_for
    elif mode == "delta":
        payload = bitpack.pack(res_delta, w_delta)
        meta.update(base=int(v[0]), width=w_delta)
        g = g_delta
    elif mode == "pfor_for":
        payload = _pfor_pack(res_for, mbw_for)
        meta.update(base=base)
        g = g_for
    else:
        payload = _pfor_pack(res_delta, mbw_delta)
        meta.update(base=int(v[0]))
        g = g_delta
    if g > 1:
        meta["gcd"] = g
    return payload, meta


def decode(payload: bytes, meta: dict) -> np.ndarray:
    n = meta["n"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    mode = meta["mode"]
    if mode.startswith("pfor"):
        res = _pfor_unpack(payload, n)
    else:
        res = bitpack.unpack(payload, meta["width"], n)
    g = meta.get("gcd", 1)
    base = np.int64(meta["base"])
    if mode in ("for", "pfor_for"):
        if g > 1:
            res = res * np.uint64(g)
        return (res + base.view(np.uint64)).view(np.int64)
    deltas = _unzigzag(res)
    if g > 1:
        deltas = deltas * np.int64(g)
    out = np.cumsum(deltas.view(np.uint64), dtype=np.uint64)
    out += base.view(np.uint64)
    return out.view(np.int64)
