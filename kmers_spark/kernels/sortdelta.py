"""Sort-permutation + delta codec for int64/timestamp columns whose
values are individually high-entropy in block order (url-sorted warc_ts:
random arrival order) but DENSE as a set (a host's pages crawled seconds
apart): sorting makes deltas tiny, and the permutation costs only
ceil(log2 n) bits/value.

Layout: inverse permutation (bitpacked, width = bits(n-1)) followed by
foren.encode of the sorted values (its delta mode self-selects). Decode:
cumulative-sum the deltas back to sorted order, then gather through the
inverse permutation — all vectorized.

The selector estimates bits(n) + bits(sorted-delta range) against
bits(value range) from the sample. MEASURED FINDING (BENCH r2, test
test_sortdelta_never_selected_against_for_gcd_zlib): on ORDER-PRESERVING
columns the stored permutation carries log2(n!) bits — exactly the
information sorting removes — so this codec never beats FOR + gcd +
the zlib backstop; the selector correctly never picks it. It exists for
the one case where it pays: a consumer that may receive rows in sorted
order and drop the perm (columnar rewrite / clustering jobs)."""

from __future__ import annotations

import numpy as np

from . import bitpack, foren


def encode(arr: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(arr, dtype=np.int64)
    n = v.shape[0]
    if n == 0:
        return b"", {"n": 0, "perm_width": 0, "perm_nbytes": 0,
                     "for": {"n": 0, "mode": "for", "base": 0, "width": 0}}
    perm = np.argsort(v, kind="stable")
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n, dtype=np.int64)
    pw = bitpack.width_for(n - 1)
    perm_blob = bitpack.pack(inv.astype(np.uint64), pw)
    body, fmeta = foren.encode(v[perm])
    return perm_blob + body, {
        "n": n, "perm_width": pw, "perm_nbytes": len(perm_blob), "for": fmeta,
    }


def decode(payload: bytes, meta: dict) -> np.ndarray:
    n = meta["n"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    inv = bitpack.unpack(payload[: meta["perm_nbytes"]], meta["perm_width"], n)
    sv = foren.decode(payload[meta["perm_nbytes"] :], meta["for"])
    return np.asarray(sv)[inv.astype(np.int64)]


def sorted_delta_bits(v: np.ndarray) -> int:
    """Residual width foren's delta mode would need on the SORTED sample
    — the selector's cost signal."""
    if len(v) < 2:
        return 0
    sv = np.sort(v.astype(np.int64))
    d = np.diff(sv)
    # foren zigzags deltas, so width is bits(2 * max-delta)
    return bitpack.width_for(2 * int(d.max()) if len(d) else 0)
