"""Zero-copy views over Arrow arrays for the codec kernels.

The hot path receives Arrow record batches (applyInArrow): string/binary
columns stay as (uint8 data buffer, offsets, validity bitmap) — no
Python objects are materialized per value. Kernels operate on these
views with numpy; this module is the only place that touches Arrow
buffer layout details (including slice offsets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _combined(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def validity_mask(arr) -> np.ndarray | None:
    """Boolean mask (True = valid) or None when no nulls."""
    arr = _combined(arr)
    if arr.null_count == 0:
        return None
    bitmap = arr.buffers()[0]
    bits = np.unpackbits(
        np.frombuffer(bitmap, dtype=np.uint8), bitorder="little",
        count=arr.offset + len(arr),
    )
    return bits[arr.offset :].astype(bool)


def bytes_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8, offsets int64 of n+1) for string/binary arrays.

    Offsets are rebased to 0 relative to the returned data view; null
    slots have zero length (Arrow guarantees offs[i+1] >= offs[i]).
    """
    arr = _combined(arr)
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        odt = np.int32
    elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    else:
        raise TypeError(f"not a bytes-like Arrow type: {t}")
    n = len(arr)
    offs_all = np.frombuffer(arr.buffers()[1], dtype=odt)
    offs = offs_all[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.zeros(0, np.uint8)
    base = offs[0]
    return data[base : offs[-1]], offs - base


def int64_values(arr, fill: int = 0) -> np.ndarray:
    """int64 numpy values with nulls replaced by `fill` (timestamps as
    epoch-us — Arrow timestamp[us] is int64 underneath)."""
    arr = _combined(arr)
    t = arr.type
    if pa.types.is_timestamp(t):
        np_arr = arr.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        v = np_arr.view(np.int64).copy()
    else:
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.where(np.isnan(v), fill, v).astype(np.int64) if v.dtype.kind == "f" else v.astype(np.int64)
    mask = validity_mask(arr)
    if mask is not None:
        v[~mask] = fill
    return v


def lens_of(offs: np.ndarray) -> np.ndarray:
    return np.diff(offs)


def make_string_array(data: np.ndarray, offs: np.ndarray, mask: np.ndarray | None,
                      typ: str) -> pa.Array:
    """Build a string/binary Arrow array zero-copy from (data, offsets)."""
    n = len(offs) - 1
    atype = pa.large_string() if typ == "string" else pa.large_binary()
    null_buf = None
    if mask is not None:
        null_buf = pa.py_buffer(np.packbits(mask, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        atype,
        n,
        [null_buf, pa.py_buffer(offs.astype(np.int64).tobytes()), pa.py_buffer(data.tobytes())],
        null_count=-1 if mask is not None else 0,
    )
