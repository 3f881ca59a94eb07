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


def tokenize_dict(values: list[bytes]) -> tuple[np.ndarray, np.ndarray, list]:
    """(token codes, per-value token counts, frequency-ordered dict)."""
    token_lists = [v.split(b" ") for v in values]
    counts = np.array([len(t) for t in token_lists], dtype=np.int64)
    flat = [t for lst in token_lists for t in lst]
    arr = np.empty(len(flat), dtype=object)
    arr[:] = flat
    codes, dictionary = dictenc.build_dictionary(arr)
    return codes.astype(np.int64), counts, dictionary


def encode(values: list[bytes]) -> tuple[bytes, dict]:
    n = len(values)
    codes, counts, dictionary = tokenize_dict(values)
    width = bitpack.width_for(max(len(dictionary) - 1, 0))
    dict_blob = dictenc.serialize_dictionary(dictionary)
    codes_blob = bitpack.pack(codes.astype(np.uint64), width)
    cw = bitpack.width_for(int(counts.max()) if n else 0)
    counts_blob = bitpack.pack(counts.astype(np.uint64), cw)

    meta = {
        "n": n,
        "n_tokens": int(len(codes)),
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


# ------------------------------------------------- shared-dict segments

def _backstop(raw: bytes) -> tuple[bytes, str | None]:
    """Per-part entropy backstop (same zstd-6 + gain gate as
    codecs._maybe_zlib, but part-local so segment skipping can skip
    the decompression too). Lazy import: codecs imports this module."""
    from .. import codecs

    z = codecs._zstd().compress(raw)
    if len(z) < codecs.ZLIB_MIN_GAIN * len(raw):
        return bytes(z), "zstd"
    return raw, None


def _unbackstop(blob: bytes, z: str | None, raw_len: int) -> bytes:
    if not z:
        return blob
    from .. import codecs

    return bytes(codecs._zstd().decompress(blob, raw_len))


def encode_shared(codes: np.ndarray, counts: np.ndarray, dictionary: list,
                  seg_rows: int) -> tuple[bytes, dict]:
    """Parquet-page-style layout: ONE dictionary for the whole block,
    independently decodable code segments of `seg_rows` values.

        payload = [dict part][seg_0][seg_1]...
        seg_i   = backstop(codes_blob_i + counts_blob_i)

    Unlike the generic seg: wrapper (per-segment dictionaries cost
    50-70% extra on words-coded text — measured, BENCH/ROUND3.md), the
    shared dictionary keeps the ratio at block level while a selective
    decode touches only the dict part + matching segments.
    """
    n = len(counts)
    width = bitpack.width_for(max(len(dictionary) - 1, 0))
    cw = bitpack.width_for(int(counts.max()) if n else 0)
    dict_blob = dictenc.serialize_dictionary(dictionary)
    dict_part, dz = _backstop(dict_blob)
    tok_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_offs[1:])
    parts = [dict_part]
    segs = []
    for r0 in range(0, n, seg_rows):
        r1 = min(r0 + seg_rows, n)
        t0, t1 = int(tok_offs[r0]), int(tok_offs[r1])
        codes_blob = bitpack.pack(codes[t0:t1].astype(np.uint64), width)
        counts_blob = bitpack.pack(counts[r0:r1].astype(np.uint64), cw)
        raw = codes_blob + counts_blob
        part, z = _backstop(raw)
        parts.append(part)
        segs.append({
            "n": r1 - r0, "n_tokens": t1 - t0,
            "codes_nbytes": len(codes_blob), "nbytes": len(part),
            "raw_nbytes": len(raw), "z": z,
        })
    meta = {
        "n": n, "dict_size": len(dictionary),
        "dict_nbytes": len(dict_blob), "dict_part_nbytes": len(dict_part),
        "dict_z": dz, "code_width": width, "count_width": cw, "segs": segs,
    }
    return b"".join(parts), meta


def shared_dictionary(payload: bytes, meta: dict) -> list:
    return dictenc.deserialize_dictionary(
        _unbackstop(payload[: meta["dict_part_nbytes"]], meta["dict_z"],
                    meta["dict_nbytes"])
    )


def iter_segments(payload: bytes, meta: dict, sel: np.ndarray | None = None):
    """Yield (row_offset, codes int64, counts int64) per segment, in
    order, skipping segments `sel` never selects (their bytes are
    neither sliced nor decompressed)."""
    off = meta["dict_part_nbytes"]
    r0 = 0
    for s in meta["segs"]:
        if sel is None or sel[r0 : r0 + s["n"]].any():
            raw = _unbackstop(payload[off : off + s["nbytes"]], s["z"], s["raw_nbytes"])
            codes = bitpack.unpack(
                raw[: s["codes_nbytes"]], meta["code_width"], s["n_tokens"]
            ).astype(np.int64)
            counts = bitpack.unpack(
                raw[s["codes_nbytes"] :], meta["count_width"], s["n"]
            ).astype(np.int64)
            yield r0, codes, counts
        off += s["nbytes"]
        r0 += s["n"]


def decode_shared(payload: bytes, meta: dict, sel: np.ndarray | None = None) -> list[bytes]:
    """All rows (sel=None) or only selected rows, in order."""
    n = meta["n"]
    if n == 0:
        return []
    dictionary = shared_dictionary(payload, meta)
    lut = np.empty(max(len(dictionary), 1), dtype=object)
    for i, v in enumerate(dictionary):
        lut[i] = v
    out: list[bytes] = []
    for r0, codes, counts in iter_segments(payload, meta, sel):
        toks = lut[codes]
        bounds = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        seg_sel = None if sel is None else sel[r0 : r0 + len(counts)]
        for i in range(len(counts)):
            if seg_sel is None or seg_sel[i]:
                out.append(b" ".join(toks[bounds[i] : bounds[i + 1]]))
    return out
