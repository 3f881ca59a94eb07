"""Front coding (incremental prefix compression) for sorted string
columns — the natural codec for the url key column, which arrives sorted
because row order within a block is part of the format (SURVEY.md §7).

Each value stores (common-prefix-length with the previous value,
suffix); suffixes are concatenated and FSST-compressed; prefix lengths
and suffix lengths are bit-packed.

payload = [packed cp_lens][fsst(suffixes) incl. its own meta sections]
meta    = {n, cp_width, cp_nbytes, fsst: {...}}
"""

from __future__ import annotations

import numpy as np

from . import bitpack, fsst


def _common_prefix_lens(values: list[bytes]) -> np.ndarray:
    """cp[i] = len of common prefix of values[i] and values[i-1]; cp[0]=0.
    Vectorized over a padded byte matrix."""
    n = len(values)
    cps = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return cps
    maxlen = max((len(v) for v in values), default=0)
    if maxlen == 0:
        return cps
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    for i, v in enumerate(values):
        lens[i] = len(v)
        if v:
            mat[i, : len(v)] = np.frombuffer(v, dtype=np.uint8)
    eq = mat[1:] == mat[:-1]
    # first mismatch position per row; all-equal rows -> maxlen
    mismatch = np.argmin(eq, axis=1)
    all_eq = eq.all(axis=1)
    mismatch[all_eq] = maxlen
    pairmin = np.minimum(lens[1:], lens[:-1])
    cps[1:] = np.minimum(mismatch, pairmin)
    return cps


def encode(values: list[bytes], table: list[bytes] | None = None) -> tuple[bytes, dict]:
    n = len(values)
    cps = _common_prefix_lens(values)
    suffixes = [values[i][cps[i] :] for i in range(n)]
    cw = bitpack.width_for(int(cps.max()) if n else 0)
    cp_blob = bitpack.pack(cps.astype(np.uint64), cw)
    if table is None:
        # suffixes are short fragments: a full 1-2 byte table beats
        # spending code space on merge rounds (measured)
        sbuf = np.frombuffer(b"".join(suffixes[: min(n, 4096)]), dtype=np.uint8)
        slens = np.array([len(v) for v in suffixes[: min(n, 4096)]], dtype=np.int64)
        table = fsst.train_arrays(sbuf, slens, round1_cap=fsst.MAX_SYMBOLS)
    buf2 = np.frombuffer(b"".join(suffixes), dtype=np.uint8)
    lens2 = np.array([len(v) for v in suffixes], dtype=np.int64)
    body, fmeta = fsst.encode_arrays(buf2, lens2, table, merge_rounds=0)
    meta = {"n": n, "cp_width": cw, "cp_nbytes": len(cp_blob), "fsst": fmeta}
    return cp_blob + body, meta


def decode(payload: bytes, meta: dict) -> list[bytes]:
    n = meta["n"]
    cps = bitpack.unpack(payload[: meta["cp_nbytes"]], meta["cp_width"], n).astype(np.int64)
    suffixes = fsst.decode(payload[meta["cp_nbytes"] :], meta["fsst"])
    out: list[bytes] = []
    prev = b""
    for i in range(n):
        v = prev[: cps[i]] + suffixes[i]
        out.append(v)
        prev = v
    return out
