"""Word-dictionary codec for natural-language text (the "dict/FSST
hybrid for text" of the north star): tokenize on single spaces,
dictionary-encode tokens, bit-pack the code stream.

Losslessness: `' '.join(s.split(' ')) == s` for every string (split on a
single explicit separator keeps empty tokens), so the transform is
exactly invertible including runs of spaces and leading/trailing spaces.
Tokens are UTF-8 bytes; the dictionary is frequency-ordered like
kernels.dictenc (the reference's configurable code assignment,
naive.rs:49-74, generalized).

payload = [dict blob][packed token codes][packed per-value token counts]
meta    = {n, n_tokens, dict_size, dict_nbytes, code_width, codes_nbytes,
           count_width}
"""

from __future__ import annotations

import numpy as np

from . import bitpack, dictenc


def encode(values: list[bytes]) -> tuple[bytes, dict]:
    n = len(values)
    token_lists = [v.split(b" ") for v in values]
    counts = np.array([len(t) for t in token_lists], dtype=np.int64)
    flat = [t for lst in token_lists for t in lst]

    arr = np.empty(len(flat), dtype=object)
    arr[:] = flat
    codes, dictionary = dictenc.build_dictionary(arr)
    width = bitpack.width_for(max(len(dictionary) - 1, 0))
    dict_blob = dictenc.serialize_dictionary(dictionary)
    codes_blob = bitpack.pack(codes.astype(np.uint64), width)
    cw = bitpack.width_for(int(counts.max()) if n else 0)
    counts_blob = bitpack.pack(counts.astype(np.uint64), cw)

    meta = {
        "n": n,
        "n_tokens": int(len(flat)),
        "dict_size": len(dictionary),
        "dict_nbytes": len(dict_blob),
        "code_width": width,
        "codes_nbytes": len(codes_blob),
        "count_width": cw,
    }
    return dict_blob + codes_blob + counts_blob, meta


def decode(payload: bytes, meta: dict) -> list[bytes]:
    n = meta["n"]
    if n == 0:
        return []
    dictionary = dictenc.deserialize_dictionary(payload[: meta["dict_nbytes"]])
    rest = payload[meta["dict_nbytes"] :]
    codes = bitpack.unpack(rest[: meta["codes_nbytes"]], meta["code_width"], meta["n_tokens"])
    counts = bitpack.unpack(rest[meta["codes_nbytes"] :], meta["count_width"], n).astype(np.int64)

    lut = np.empty(max(len(dictionary), 1), dtype=object)
    for i, v in enumerate(dictionary):
        lut[i] = v
    toks = lut[codes.astype(np.int64)]
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    return [b" ".join(toks[bounds[i] : bounds[i + 1]]) for i in range(n)]
