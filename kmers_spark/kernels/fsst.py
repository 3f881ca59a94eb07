"""FSST-style symbol-table string compression (vectorized, numpy-only).

A lightweight variant of FSST (Boncz/Neumann/Leis, VLDB'20 — see
PAPERS.md): a 255-entry table of 1- and 2-byte symbols learned from a
sample; code 255 is the escape (next output byte is a literal). The
reference's `Naive` table-lookup encode/decode
(/root/reference/src/encoding/naive.rs:116-136) is the 4-entry,
fixed-width degenerate case of this; here the table is learned and the
output is byte-aligned.

Everything is vectorized:
  * candidate pair positions found with isin() on a uint16 pair view;
  * greedy left-to-right non-overlap resolution = "take alternate
    positions within each run of consecutive candidates" (exact greedy);
  * matches never cross value boundaries, so per-value slices decode
    independently (the analog of the reference storing logical length
    out-of-band — SURVEY.md §2.2 D7).

Layout: payload = [sym_lens: n_sym u8][sym_bytes][per-value code counts,
bit-packed at minimum width][code stream]. meta = counts + section
sizes. After round 1, optional merge rounds grow symbols up to 8 bytes
(encode_arrays docstring); the decoder is length-generic so the format
is unchanged.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255   # codes 0..254; 255 reserved for escape
ROUND1_MAX = 208    # round-1 table cap: leave code space for merge rounds
MERGE_ROUNDS = 2    # pair-merge rounds on the code stream (symbols to 8 bytes)
MIN_MERGE_COUNT = 4
MAX_SYM_LEN = 8
# Merge-round LEARNING runs on a bounded leading sample of the stream
# (same regime as round-1 table training); the APPLY then processes the
# stream in cache-resident chunks with the FIXED tables. Whole-stream
# apply was the fsst/fsst_seg encode bottleneck: at tens of MB every
# intermediate (pair keys, masks, offsets — 2-8 bytes per input byte)
# falls out of cache, while seg:fsst did identical math 2 MB at a time
# ~8x faster. Chunking at value boundaries is exact: matches never
# cross values, so fixed-table chunked output == whole-stream output.
LEARN_MAX_BYTES = 4 << 20    # merge-learning sample cap
APPLY_CHUNK_BYTES = 2 << 20  # per-chunk input bytes for the apply pass


def train(sample_values: list[bytes], max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Learn a symbol table from sample byte-strings (list wrapper)."""
    if not sample_values:
        return []
    buf = np.frombuffer(b"".join(sample_values), dtype=np.uint8)
    lens = np.array([len(v) for v in sample_values], dtype=np.int64)
    return train_arrays(buf, lens, max_symbols)


def train_arrays(buf: np.ndarray, lens: np.ndarray, max_symbols: int = MAX_SYMBOLS,
                 round1_cap: int = ROUND1_MAX) -> list[bytes]:
    """Learn a symbol table from a concatenated uint8 buffer + value lens.

    All distinct single bytes in the sample get a code (so common bytes
    never pay the 2x escape penalty); remaining code space goes to the
    most frequent adjacent pairs (not crossing value boundaries).
    Deterministic: ties broken by byte value.
    """
    if buf.size == 0:
        return []
    singles, s_counts = np.unique(buf, return_counts=True)
    s_order = np.lexsort((singles, -s_counts))
    table: list[bytes] = [bytes([b]) for b in singles[s_order]]

    room = min(max_symbols, round1_cap) - len(table)
    if room > 0 and buf.size >= 2:
        ends = np.cumsum(lens)
        pair = buf[:-1].astype(np.uint16) << np.uint16(8) | buf[1:]
        valid = np.ones(buf.size - 1, dtype=bool)
        b = ends[:-1] - 1  # pairs spanning a value boundary (guard empty values)
        valid[b[(b >= 0) & (b < buf.size - 1)]] = False
        pairs, p_counts = np.unique(pair[valid], return_counts=True)
        keep = p_counts >= 4  # don't waste codes on rare pairs
        pairs, p_counts = pairs[keep], p_counts[keep]
        p_order = np.lexsort((pairs, -p_counts))[:room]
        table += [bytes([int(p) >> 8, int(p) & 0xFF]) for p in pairs[p_order]]
    return table[:max_symbols]


def _greedy_nonoverlap(cand: np.ndarray) -> np.ndarray:
    """Given sorted candidate start positions, return the greedy
    left-to-right non-overlapping subset (pairs have length 2, so only
    consecutive candidates conflict: within each run of consecutive
    positions keep indices 0, 2, 4, ...)."""
    if cand.size == 0:
        return cand
    run_start = np.concatenate(([True], np.diff(cand) > 1))
    run_id = np.cumsum(run_start) - 1
    run_first = cand[run_start]
    pos_in_run = cand - run_first[run_id]
    return cand[pos_in_run % 2 == 0]


def encode(values: list[bytes], table: list[bytes]) -> tuple[bytes, dict]:
    """Encode byte-strings with a trained table (list wrapper)."""
    buf = np.frombuffer(b"".join(values), dtype=np.uint8)
    lens = np.array([len(v) for v in values], dtype=np.int64)
    return encode_arrays(buf, lens, table)


def _round1_chunk(buf: np.ndarray, lens: np.ndarray, single_code: np.ndarray,
                  pair_lut: np.ndarray, have_pairs: bool
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply the FIXED round-1 table to one chunk of whole values ->
    (codes uint8, per-value code counts int64, normal mask — False on
    escape+literal positions, which never merge)."""
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    taken = np.zeros(buf.size, dtype=bool)
    if have_pairs and buf.size >= 2:
        pair = buf[:-1].astype(np.uint16) << np.uint16(8) | buf[1:]
        cand_mask = pair_lut[pair] != ESCAPE
        ends = starts + lens
        cross = ends[ends < buf.size] - 1  # last byte of a value can't start a pair
        cand_mask[cross[cross >= 0]] = False
        cand = _greedy_nonoverlap(np.flatnonzero(cand_mask))
        taken[cand] = True
    consumed = np.zeros(buf.size, dtype=bool)
    consumed[1:] = taken[:-1]

    sc = single_code[buf] if buf.size else np.empty(0, dtype=np.uint8)
    out_len = np.ones(buf.size, dtype=np.int64)          # single coded byte -> 1
    out_len[consumed] = 0                                 # swallowed by pair
    esc = (~taken) & (~consumed) & (sc == ESCAPE)
    out_len[esc] = 2                                      # escape + literal
    # taken pair start stays 1 (one pair code)

    out_off = np.concatenate(([0], np.cumsum(out_len)))
    total = int(out_off[-1])
    out = np.empty(total, dtype=np.uint8)
    normal = np.ones(total, dtype=bool)

    single_pos = (~taken) & (~consumed) & (sc != ESCAPE)
    out[out_off[:-1][single_pos]] = sc[np.flatnonzero(single_pos)]
    if taken.any():
        tpos = np.flatnonzero(taken)
        pair_vals = buf[tpos].astype(np.uint16) << np.uint16(8) | buf[tpos + 1]
        out[out_off[:-1][taken]] = pair_lut[pair_vals]
    if esc.any():
        epos = out_off[:-1][esc]
        out[epos] = ESCAPE
        out[epos + 1] = buf[np.flatnonzero(esc)]
        normal[epos] = False
        normal[epos + 1] = False

    enc_lens = out_off[starts + lens] - out_off[starts]
    return out, enc_lens, normal


def _merge_apply_chunk(codes: np.ndarray, enc_lens: np.ndarray,
                       normal: np.ndarray, luts: list[np.ndarray]
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Apply the FIXED learned merge LUTs (one per round) to one chunk's
    code stream -> (codes, per-value counts)."""
    n = len(enc_lens)
    value_id = np.repeat(np.arange(n, dtype=np.int64), enc_lens)
    for lut in luts:
        if codes.size < 2:
            break
        keys = codes[:-1].astype(np.uint16) << np.uint16(8) | codes[1:]
        ok = normal[:-1] & normal[1:] & (value_id[:-1] == value_id[1:])
        cand = _greedy_nonoverlap(np.flatnonzero(ok & (lut[keys] != ESCAPE)))
        if cand.size == 0:
            continue
        taken = np.zeros(codes.size, dtype=bool)
        taken[cand] = True
        consumed = np.zeros(codes.size, dtype=bool)
        consumed[1:] = taken[:-1]
        merged = codes.copy()
        merged[cand] = lut[keys[cand]]
        keep = ~consumed
        codes = merged[keep]
        normal = normal[keep]
        value_id = value_id[keep]
    return codes, np.bincount(value_id, minlength=n).astype(np.int64)


def _learn_merge_luts(codes: np.ndarray, enc_lens: np.ndarray,
                      normal: np.ndarray, table: list[bytes],
                      merge_rounds: int
                      ) -> tuple[list[np.ndarray], list[bytes]]:
    """Learn merge-round pair tables on the (sample) code stream:
    each round counts adjacent code pairs, admits the most frequent as
    new symbols, applies them to the sample, and the next round learns
    on the merged result. Returns (one uint16->code LUT per round, the
    grown symbol table)."""
    luts: list[np.ndarray] = []
    n = len(enc_lens)
    value_id = np.repeat(np.arange(n, dtype=np.int64), enc_lens)
    slen = np.zeros(256, dtype=np.int64)
    slen[: len(table)] = [len(s) for s in table]
    for _ in range(merge_rounds):
        room = MAX_SYMBOLS - len(table)
        if room <= 0 or codes.size < 2:
            break
        ok = (
            normal[:-1]
            & normal[1:]
            & (value_id[:-1] == value_id[1:])
            & (slen[codes[:-1]] + slen[codes[1:]] <= MAX_SYM_LEN)
        )
        if not ok.any():
            break
        keys = codes[:-1].astype(np.uint16) << np.uint16(8) | codes[1:]
        uniq, counts = np.unique(keys[ok], return_counts=True)
        keep = counts >= MIN_MERGE_COUNT
        uniq, counts = uniq[keep], counts[keep]
        if uniq.size == 0:
            break
        order = np.lexsort((uniq, -counts))[:room]
        new_pairs = uniq[order]
        pair2code = np.full(1 << 16, ESCAPE, dtype=np.uint8)
        for i, pk in enumerate(new_pairs):
            pair2code[pk] = len(table) + i
            slen[len(table) + i] = slen[pk >> 8] + slen[pk & 0xFF]
        table = table + [table[int(pk) >> 8] + table[int(pk) & 0xFF]
                         for pk in new_pairs]
        luts.append(pair2code)
        # apply to the sample so the next round learns on merged codes
        cand = _greedy_nonoverlap(np.flatnonzero(ok & (pair2code[keys] != ESCAPE)))
        if cand.size == 0:
            break
        taken = np.zeros(codes.size, dtype=bool)
        taken[cand] = True
        consumed = np.zeros(codes.size, dtype=bool)
        consumed[1:] = taken[:-1]
        merged = codes.copy()
        merged[cand] = pair2code[keys[cand]]
        keep_mask = ~consumed
        codes = merged[keep_mask]
        normal = normal[keep_mask]
        value_id = value_id[keep_mask]
    return luts, table


def encode_arrays(buf: np.ndarray, lens: np.ndarray, table: list[bytes],
                  merge_rounds: int = MERGE_ROUNDS) -> tuple[bytes, dict]:
    """Encode a concatenated uint8 buffer + per-value lens -> (payload, meta).

    Round 1 applies the trained 1-2 byte table; `merge_rounds` passes
    grow symbols up to MAX_SYM_LEN bytes by merging the most frequent
    adjacent *code* pairs — LEARNED on the leading LEARN_MAX_BYTES of
    the stream, then APPLIED with fixed LUTs. The apply processes the
    stream in APPLY_CHUNK_BYTES chunks of whole values: matches never
    cross value boundaries, so chunked output is bit-identical to a
    whole-stream pass while every intermediate stays cache-resident
    (the whole-stream pass was ~8x slower at tens of MB). Escape+
    literal pairs are atomic and never merge, preserving the decoder's
    invariant that every literal is immediately preceded by its escape.
    Deterministic: sample and chunk boundaries depend only on `lens`.
    """
    n = len(lens)
    table = list(table)

    single_code = np.full(256, ESCAPE, dtype=np.uint8)
    pair_lut = np.full(1 << 16, ESCAPE, dtype=np.uint8)
    have_pairs = False
    for code, s in enumerate(table):
        if len(s) == 1:
            single_code[s[0]] = code
        else:
            pair_lut[(s[0] << 8) | s[1]] = code
            have_pairs = True

    if buf.size == 0:
        sym_lens = np.array([len(s) for s in table], dtype=np.uint8)
        header = sym_lens.tobytes() + b"".join(table)
        meta = {"n": n, "n_symbols": len(table), "header_nbytes": len(header),
                "len_width": 0, "lens_nbytes": 0}
        return header, meta

    ends_all = np.cumsum(lens)

    # --- learn merge tables on a bounded leading sample of whole values
    luts: list[np.ndarray] = []
    if merge_rounds > 0:
        s_n = min(n, int(np.searchsorted(ends_all, LEARN_MAX_BYTES)) + 1)
        s_codes, s_lens, s_norm = _round1_chunk(
            buf[: int(ends_all[s_n - 1])], lens[:s_n],
            single_code, pair_lut, have_pairs,
        )
        luts, table = _learn_merge_luts(s_codes, s_lens, s_norm, table,
                                        merge_rounds)

    # --- chunked apply with the fixed tables
    code_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    pos, start_byte = 0, 0
    while pos < n:
        end = min(n, max(pos + 1, int(np.searchsorted(
            ends_all, start_byte + APPLY_CHUNK_BYTES)) + 1))
        cb = buf[start_byte: int(ends_all[end - 1])]
        codes, el, norm = _round1_chunk(cb, lens[pos:end],
                                        single_code, pair_lut, have_pairs)
        if luts:
            codes, el = _merge_apply_chunk(codes, el, norm, luts)
        code_parts.append(codes)
        len_parts.append(el)
        start_byte = int(ends_all[end - 1])
        pos = end
    codes = np.concatenate(code_parts)
    enc_lens = np.concatenate(len_parts)

    from . import bitpack

    sym_lens = np.array([len(s) for s in table], dtype=np.uint8)
    header = sym_lens.tobytes() + b"".join(table)
    lw = bitpack.width_for(int(enc_lens.max()) if n else 0)
    lens_blob = bitpack.pack(enc_lens.astype(np.uint64), lw)
    meta = {"n": n, "n_symbols": len(table), "header_nbytes": len(header),
            "len_width": lw, "lens_nbytes": len(lens_blob)}
    return header + lens_blob + codes.tobytes(), meta


def decode(payload: bytes, meta: dict) -> list[bytes]:
    out, bounds = decode_arrays(payload, meta)
    ob = out.tobytes()
    n = meta["n"]
    return [ob[bounds[i] : bounds[i + 1]] for i in range(n)]


def decode_arrays(payload: bytes, meta: dict) -> tuple[np.ndarray, np.ndarray]:
    """Decode to (uint8 buffer, int64 value offsets of n+1) — zero-copy
    friendly for building Arrow string arrays."""
    n = meta["n"]
    n_sym = meta["n_symbols"]
    sym_lens = np.frombuffer(payload, dtype=np.uint8, count=n_sym)
    sym_blob_len = int(sym_lens.sum())
    sym_flat = np.frombuffer(payload, dtype=np.uint8, count=sym_blob_len, offset=n_sym)
    sym_off = np.zeros(n_sym + 1, dtype=np.int64)
    np.cumsum(sym_lens, out=sym_off[1:])
    from . import bitpack

    base = meta["header_nbytes"]
    enc_lens = bitpack.unpack(
        payload[base : base + meta["lens_nbytes"]], meta["len_width"], n
    ).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=offs[1:])
    codes = np.frombuffer(payload, dtype=np.uint8, offset=base + meta["lens_nbytes"])

    if codes.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(n + 1, dtype=np.int64)

    # escape resolution: runs of consecutive 255s -> alternate are escapes
    esc_cand = np.flatnonzero(codes == ESCAPE)
    esc = np.zeros(codes.size, dtype=bool)
    # a 255 is an escape unless consumed as the literal of the escape before it;
    # but any byte can be a literal, so we must account for non-255 escapes'
    # literals too. An escape consumes exactly the next position. Walk runs of
    # candidate 255s, but a run's first element may itself be consumed if the
    # previous position is an escape whose literal it is — previous position is
    # 255 only within the run, and non-255 codes never consume. So the run-parity
    # rule is exact.
    if esc_cand.size:
        run_start = np.concatenate(([True], np.diff(esc_cand) > 1))
        run_id = np.cumsum(run_start) - 1
        run_first = esc_cand[run_start]
        pos_in_run = esc_cand - run_first[run_id]
        esc[esc_cand[pos_in_run % 2 == 0]] = True
    literal = np.zeros(codes.size, dtype=bool)
    literal[1:] = esc[:-1]

    out_len = np.zeros(codes.size, dtype=np.int64)
    normal = (~esc) & (~literal)
    lens64 = sym_lens.astype(np.int64)
    out_len[normal] = lens64[codes[normal]]
    out_len[literal] = 1

    out_off = np.concatenate(([0], np.cumsum(out_len)))
    total = int(out_off[-1])
    out = np.empty(total, dtype=np.uint8)

    # literals: copy own byte
    if literal.any():
        out[out_off[:-1][literal]] = codes[literal]
    # normal symbols: gather from sym_flat
    if normal.any():
        npos = np.flatnonzero(normal)
        reps = out_len[npos]
        dst = np.repeat(out_off[npos], reps) + _intra(reps)
        src = np.repeat(sym_off[codes[npos].astype(np.int64)], reps) + _intra(reps)
        out[dst] = sym_flat[src]

    # split per value: map encoded offsets -> decoded offsets
    # encoded offset offs[i] is a position in `codes`; decoded offset = out_off at it
    dec_bounds = out_off[offs.astype(np.int64)]
    return out, dec_bounds.astype(np.int64)


def _intra(reps: np.ndarray) -> np.ndarray:
    """[0..reps[0]), [0..reps[1]), ... concatenated; robust to zero reps
    (the cumsum-trick variant corrupted counters after a zero rep — the
    duplicate write at coinciding run ends clobbered the reset)."""
    total = int(reps.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    gid = np.repeat(np.arange(len(reps)), reps)
    starts = np.concatenate(([0], np.cumsum(reps)))[:-1]
    return np.arange(total, dtype=np.int64) - starts[gid]


# --------------------------------------------------- shared-table segments

def encode_shared_seg(buf: np.ndarray, lens: np.ndarray,
                      seg_rows: int) -> tuple[bytes, dict]:
    """fsst_seg: ONE symbol table for the whole block, independently
    decodable code segments of `seg_rows` values (parquet-page layout,
    the words_seg treatment applied to FSST — VERDICT r3 #7).

        payload = [backstop(table header)][seg_0][seg_1]...
        seg_i   = backstop(bitpacked enc_lens_i + code slice_i)

    The block is encoded ONCE with the normal whole-stream pipeline
    (sample-trained table + merge rounds, so the table quality equals
    plain fsst's), then the code stream is re-sliced at value
    boundaries — FSST matches never cross values, so every slice
    decodes independently against the shared table. Contrast seg:fsst,
    which trains a table per segment (table header cost × n_segs).
    """
    from .words import _backstop

    from . import bitpack

    n = len(lens)
    # train + encode exactly as the fsst codec does
    cut_n = min(n, 4096)
    cut = int(lens[:cut_n].sum())
    table = train_arrays(buf[:cut], lens[:cut_n])
    payload, m = encode_arrays(buf, lens, table)
    header = payload[: m["header_nbytes"]]
    enc_lens = np.zeros(n, dtype=np.int64)
    if m["lens_nbytes"]:
        enc_lens = bitpack.unpack(
            payload[m["header_nbytes"]: m["header_nbytes"] + m["lens_nbytes"]],
            m["len_width"], n,
        ).astype(np.int64)
    codes = payload[m["header_nbytes"] + m["lens_nbytes"]:]
    code_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=code_offs[1:])

    header_part, hz = _backstop(header)
    parts = [header_part]
    segs = []
    for r0 in range(0, n, seg_rows):
        r1 = min(r0 + seg_rows, n)
        seg_lens = enc_lens[r0:r1]
        lw = bitpack.width_for(int(seg_lens.max()) if r1 > r0 else 0)
        lens_blob = bitpack.pack(seg_lens.astype(np.uint64), lw)
        raw = lens_blob + codes[int(code_offs[r0]): int(code_offs[r1])]
        part, z = _backstop(raw)
        parts.append(part)
        segs.append({
            "n": r1 - r0, "len_width": lw, "lens_nbytes": len(lens_blob),
            "nbytes": len(part), "raw_nbytes": len(raw), "z": z,
        })
    meta = {
        "n": n, "n_symbols": m["n_symbols"],
        "header_nbytes": m["header_nbytes"],
        "header_part_nbytes": len(header_part), "header_z": hz,
        "segs": segs,
    }
    return b"".join(parts), meta


def decode_shared_seg_arrays(payload: bytes, meta: dict,
                             sel: np.ndarray | None = None
                             ) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 buffer, int64 offsets) over all rows — or, with `sel`,
    over the SELECTED rows only: segments no row selects are neither
    decompressed nor decoded (page skipping)."""
    from .words import _unbackstop

    header = _unbackstop(
        payload[: meta["header_part_nbytes"]], meta["header_z"],
        meta["header_nbytes"],
    )
    bufs: list[np.ndarray] = []
    offs_parts: list[np.ndarray] = []
    total = 0
    off = meta["header_part_nbytes"]
    r0 = 0
    for s in meta["segs"]:
        take = sel[r0: r0 + s["n"]] if sel is not None else None
        if take is None or take.any():
            raw = _unbackstop(payload[off: off + s["nbytes"]], s["z"],
                              s["raw_nbytes"])
            seg_meta = {
                "n": s["n"], "n_symbols": meta["n_symbols"],
                "header_nbytes": meta["header_nbytes"],
                "len_width": s["len_width"], "lens_nbytes": s["lens_nbytes"],
            }
            sbuf, soffs = decode_arrays(header + raw, seg_meta)
            if take is not None and not take.all():
                keep = np.flatnonzero(take)
                klens = (soffs[keep + 1] - soffs[keep])
                nk = int(klens.sum())
                src = np.repeat(soffs[keep], klens) + _intra(klens)
                sbuf = sbuf[src] if nk else np.zeros(0, dtype=np.uint8)
                soffs = np.zeros(len(keep) + 1, dtype=np.int64)
                np.cumsum(klens, out=soffs[1:])
            bufs.append(sbuf)
            offs_parts.append(soffs[1:] + total)
            total += int(soffs[-1])
        off += s["nbytes"]
        r0 += s["n"]
    if not bufs:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    return (
        np.concatenate(bufs) if bufs else np.zeros(0, dtype=np.uint8),
        np.concatenate(([0], np.concatenate(offs_parts))).astype(np.int64),
    )


def decode_shared_seg(payload: bytes, meta: dict,
                      sel: np.ndarray | None = None) -> list[bytes]:
    buf, offs = decode_shared_seg_arrays(payload, meta, sel)
    ob = buf.tobytes()
    return [ob[offs[i]: offs[i + 1]] for i in range(len(offs) - 1)]
