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
