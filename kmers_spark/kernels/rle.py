"""Run-length encoding over unsigned integer code streams.

Operates on the *code* domain (post-dictionary), mirroring how the
reference operates on 2-bit codes rather than raw symbols. Runs and
lengths are each bit-packed at the minimum width (kernels.bitpack).
"""

from __future__ import annotations

import numpy as np

from . import bitpack


def runs(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_values, run_lengths) for a 1-D array."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    if n == 0:
        return arr[:0], np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(arr[1:] != arr[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    return arr[starts], lengths.astype(np.int64)


def encode(arr: np.ndarray) -> tuple[bytes, dict]:
    """uint array -> (payload, meta). payload = packed(values) ++ packed(lengths)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint64)
    values, lengths = runs(arr)
    vw = bitpack.width_for(int(values.max()) if len(values) else 0)
    lw = bitpack.width_for(int(lengths.max()) if len(lengths) else 0)
    vblob = bitpack.pack(values, vw)
    lblob = bitpack.pack(lengths.astype(np.uint64), lw)
    meta = {
        "n": int(arr.shape[0]),
        "n_runs": int(len(values)),
        "value_width": vw,
        "length_width": lw,
        "values_nbytes": len(vblob),
    }
    return vblob + lblob, meta


def decode(payload: bytes, meta: dict) -> np.ndarray:
    values = bitpack.unpack(payload[: meta["values_nbytes"]], meta["value_width"], meta["n_runs"])
    lengths = bitpack.unpack(payload[meta["values_nbytes"] :], meta["length_width"], meta["n_runs"])
    out = np.repeat(values, lengths.astype(np.int64))
    assert out.shape[0] == meta["n"], "RLE decode length mismatch"
    return out
