"""Segmented (scan-optimized) codecs: generic seg:<inner> wrapper and
shared-dictionary words_seg.

Both are OVERRIDE-ONLY (codecs.SEGMENTED_CODECS): segments trade
compression ratio for selective-decode speed; the numbers and the
decision live in BENCH/ROUND3.md. These tests pin the contracts:
byte-compatibility between the pandas and Arrow encoders, round-trip
identity, selected-decode == full-decode-then-filter (incl. nulls),
and end-to-end behavior through an encode_table store + scan_table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from kmers_spark import arrowcodecs, codecs


def _text_values(n, seed=0, null_frac=0.03):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(300)]
    out = []
    for _ in range(n):
        if rng.random() < null_frac:
            out.append(None)
        else:
            k = int(rng.integers(1, 12))
            out.append(" ".join(rng.choice(vocab, size=k)))
    return out


CASES = [
    ("seg:words", "string"),
    ("seg:fsst", "string"),
    ("seg:plain", "string"),
    ("seg:prefix", "string"),
    ("words_seg", "string"),
    ("words_seg", "binary"),
]


@pytest.mark.parametrize("codec,typ", CASES)
def test_bytecompat_and_roundtrip(codec, typ):
    vals = _text_values(codecs.SEG_ROWS * 2 + 777, seed=4)
    if typ == "binary":
        vals = [v.encode() if v is not None else None for v in vals]
    s = pd.Series(vals, dtype=object)
    arr = pa.array(vals, pa.string() if typ == "string" else pa.binary())

    p1, m1 = codecs.encode_column(s, codec, typ)
    p2, m2 = arrowcodecs.encode_column_arrow(arr, codec, typ)
    assert p1 == p2 and m1 == m2
    if codec == "words_seg":
        assert len(m1["words_seg"]["segs"]) == 3

    assert list(codecs.decode_column(p1, m1)) == vals
    assert arrowcodecs.decode_column_arrow(p2, m2).to_pylist() == vals


@pytest.mark.parametrize("codec,typ", CASES)
@pytest.mark.parametrize("pattern", ["clustered", "scattered", "none", "all"])
def test_selected_decode_equals_filter(codec, typ, pattern):
    n = codecs.SEG_ROWS * 2 + 100
    vals = _text_values(n, seed=9)
    if typ == "binary":
        vals = [v.encode() if v is not None else None for v in vals]
    s = pd.Series(vals, dtype=object)
    arr = pa.array(vals, pa.string() if typ == "string" else pa.binary())
    p, m = arrowcodecs.encode_column_arrow(arr, codec, typ)

    rng = np.random.default_rng(1)
    sel = np.zeros(n, dtype=bool)
    if pattern == "clustered":
        sel[100:400] = True  # whole segments stay unselected
    elif pattern == "scattered":
        sel = rng.random(n) < 0.01
    elif pattern == "all":
        sel[:] = True

    want = [v for v, k in zip(vals, sel) if k]
    got = arrowcodecs.decode_column_arrow_selected(p, m, sel).to_pylist()
    assert got == want

    pp, pm = codecs.encode_column(s, codec, typ)
    gotp = list(codecs.decode_column_selected(pp, pm, sel))
    assert gotp == want


def test_words_seg_ratio_tradeoff_documented():
    """The shared dictionary must keep words_seg strictly cheaper than
    naive per-segment dictionaries. (vs WHOLE-block words the sign is
    corpus-dependent: template-redundant html pays ~1.44× for segments
    — measured on the pages fixture, BENCH/ROUND3.md — while this
    random-token fixture has no cross-row redundancy and segments cost
    ~nothing; that asymmetry is exactly why the codec is override-only
    rather than auto-selected.)"""
    vals = _text_values(codecs.SEG_ROWS * 3, seed=2, null_frac=0.0)
    arr = pa.array(vals, pa.string())
    whole, _ = arrowcodecs.encode_column_arrow(arr, "words", "string")
    shared, _ = arrowcodecs.encode_column_arrow(arr, "words_seg", "string")
    naive, _ = arrowcodecs.encode_column_arrow(arr, "seg:words", "string")
    assert len(shared) < len(naive)
    assert len(shared) < 1.1 * len(whole)  # shared dict keeps it close here


def test_store_with_segmented_override_scans(spark, tmp_path):
    """e2e: a scan-optimized store round-trips bit-identically and
    scan_table over it stays correct (selected decode inside the
    kernel, zone pruning above)."""
    from kmers_spark import pages
    from kmers_spark.operators.decode import decode_table, scan_table
    from kmers_spark.operators.encode import encode_table

    out = str(tmp_path / "segstore")
    df = pages.pages_df(spark, 3000, seed=21, partitions=4).cache()
    encode_table(
        df, out, num_buckets=4, detect_skew=False,
        codec_overrides={"html": "words_seg", "text": "words_seg"},
    )
    back = decode_table(spark, out).toPandas().sort_values("url").reset_index(drop=True)
    want = df.toPandas().sort_values("url").reset_index(drop=True)
    assert back.equals(want)

    got = scan_table(spark, out, [("lang", "=", "de")]).toPandas()
    want_f = want[want["lang"] == "de"].reset_index(drop=True)
    got = got.sort_values("url").reset_index(drop=True)
    assert got.equals(want_f)
    assert len(got)


class TestFsstSeg:
    """fsst_seg: ONE shared symbol table + segmented code streams
    (words_seg's layout applied to FSST; VERDICT r3 #7). Measured
    decision in BENCH/ROUND4.md: adopt override-only — vs seg:fsst it
    encodes slower but compresses slightly better and selective-decodes
    faster (the per-segment tables it avoids cost header bytes and
    training per segment)."""

    def _series(self, n=3000):
        import pandas as pd

        vals = [f"http://h{i%5}.ex/p/{i}?" + "tok " * (i % 9) for i in range(n)]
        vals[7] = None
        return pd.Series(vals, dtype=object), vals

    def test_roundtrip_and_parity(self):
        import pyarrow as pa

        from kmers_spark import arrowcodecs, codecs

        s, vals = self._series()
        p1, m1 = codecs.encode_column(s, "fsst_seg", "string")
        p2, m2 = arrowcodecs.encode_column_arrow(
            pa.array(vals, type=pa.string()), "fsst_seg", "string")
        assert p1 == p2 and m1 == m2
        assert list(codecs.decode_column(p1, m1)) == vals
        assert arrowcodecs.decode_column_arrow(p2, m2).to_pylist() == vals
        assert len(m1["fsst_seg"]["segs"]) >= 1

    def test_selected_skips_segments(self, monkeypatch):
        import numpy as np

        from kmers_spark import codecs
        from kmers_spark.kernels import fsst, words

        monkeypatch.setattr(codecs, "SEG_ROWS", 256)
        s, vals = self._series(2000)
        p, m = codecs.encode_column(s, "fsst_seg", "string")
        assert len(m["fsst_seg"]["segs"]) == 8
        sel = np.zeros(2000, dtype=bool)
        sel[[3, 7, 300]] = True  # segments 0 and 1 only
        calls = []
        real = words._unbackstop

        def counting(payload, z, raw_n):
            calls.append(1)
            return real(payload, z, raw_n)

        monkeypatch.setattr(words, "_unbackstop", counting)
        # rebind inside fsst's functions (they import from words at call)
        got = list(codecs.decode_column_selected(p, m, sel))
        want = [vals[i] for i in np.flatnonzero(sel)]
        assert got == want
        # header + 2 of 8 segments decompressed
        assert len(calls) == 3

    def test_scan_store_with_fsst_seg_override(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from kmers_spark import pages
        from kmers_spark.operators import decode as dec, encode as enc

        df = pages.pages_df(spark, 1500, seed=31, partitions=2).cache()
        out = str(tmp_path / "snap")
        enc.encode_table(df, out, num_buckets=4, detect_skew=False,
                         codec_overrides={"url": "fsst_seg"})
        got = dec.scan_table(spark, out, [("lang", "=", "pl")]).toPandas() \
            .sort_values("url").reset_index(drop=True)
        want = df.filter(F.col("lang") == "pl").toPandas()[got.columns] \
            .sort_values("url").reset_index(drop=True)
        assert got.equals(want)
        full = dec.decode_colocated(spark, out).toPandas() \
            .sort_values("url").reset_index(drop=True)
        assert full.equals(df.toPandas()[full.columns]
                           .sort_values("url").reset_index(drop=True))
