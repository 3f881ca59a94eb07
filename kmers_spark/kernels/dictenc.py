"""Dictionary encoding with deterministic frequency-ordered code assignment.

The reference's `Naive` encoding enum enumerates all 24 bijections of
{A,C,G,T} -> {00,01,10,11} (/root/reference/src/encoding/naive.rs:49-74):
dictionary *code assignment is configuration*. We generalize: codes are
assigned by (-count, value) so hot values get small codes (bit-pack- and
RLE-friendly), and the assignment is recorded in block meta the way the
enum discriminant records the table.

Values are bytes (strings are UTF-8-encoded upstream so round-trips are
bit-identical — north-rule invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import bitpack


def build_dictionary(values: np.ndarray) -> tuple[np.ndarray, list[bytes]]:
    """codes (int64, -1 for None) + dictionary ordered by (-count, value)."""
    ser = pd.Series(values, dtype=object)
    codes0, uniques = pd.factorize(ser, use_na_sentinel=True)
    uniques = list(uniques)
    if not uniques:
        return codes0.astype(np.int64), []
    counts = np.bincount(codes0[codes0 >= 0], minlength=len(uniques))
    order = sorted(range(len(uniques)), key=lambda i: (-int(counts[i]), uniques[i]))
    perm = np.empty(len(uniques), dtype=np.int64)
    for rank, old in enumerate(order):
        perm[old] = rank
    codes = np.where(codes0 >= 0, perm[np.clip(codes0, 0, None)], -1)
    return codes.astype(np.int64), [uniques[i] for i in order]


def serialize_dictionary(dictionary: list[bytes]) -> bytes:
    """[n:u32][offsets:(n+1)*u32][bytes] — little-endian."""
    offs = np.zeros(len(dictionary) + 1, dtype="<u4")
    if dictionary:
        offs[1:] = np.cumsum([len(v) for v in dictionary], dtype=np.uint64)
    blob = b"".join(dictionary)
    return np.array([len(dictionary)], dtype="<u4").tobytes() + offs.tobytes() + blob


def deserialize_dictionary(buf: bytes) -> list[bytes]:
    n = int(np.frombuffer(buf, dtype="<u4", count=1)[0])
    offs = np.frombuffer(buf, dtype="<u4", count=n + 1, offset=4)
    base = 4 + 4 * (n + 1)
    return [bytes(buf[base + offs[i] : base + offs[i + 1]]) for i in range(n)]


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    """Dense (no-null) bytes array -> (payload, meta).

    payload = serialized dictionary ++ bit-packed codes.
    """
    codes, dictionary = build_dictionary(values)
    if (codes < 0).any():
        raise ValueError("dictenc.encode expects dense input; nulls handled upstream")
    width = bitpack.width_for(max(len(dictionary) - 1, 0))
    dict_blob = serialize_dictionary(dictionary)
    packed = bitpack.pack(codes.astype(np.uint64), width)
    meta = {
        "n": int(len(codes)),
        "dict_size": len(dictionary),
        "code_width": width,
        "dict_nbytes": len(dict_blob),
    }
    return dict_blob + packed, meta


def decode(payload: bytes, meta: dict) -> np.ndarray:
    dict_blob = payload[: meta["dict_nbytes"]]
    dictionary = deserialize_dictionary(dict_blob)
    codes = bitpack.unpack(payload[meta["dict_nbytes"] :], meta["code_width"], meta["n"])
    lut = np.empty(max(len(dictionary), 1), dtype=object)
    for i, v in enumerate(dictionary):
        lut[i] = v
    return lut[codes.astype(np.int64)] if meta["n"] else np.empty(0, dtype=object)
