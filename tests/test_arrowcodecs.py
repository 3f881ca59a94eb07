"""Arrow-native codec path: byte-identical payloads to the pandas path,
and round-trips through the existing decoders."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kmers_spark import arrowcodecs, codecs


def _pd_series(arr: pa.Array, typ: str) -> pd.Series:
    if typ in ("string", "binary"):
        vals = arr.to_pylist()
        return pd.Series(vals, dtype=object)
    if typ.startswith("timestamp"):
        return pd.Series(arr.to_pandas()).astype("datetime64[us]")
    if typ == "int64":
        return pd.Series(arr.to_pylist(), dtype="Int64")
    return pd.Series(arr.to_pylist(), dtype=object)


STR_CODECS = ["plain", "dict", "dict_rle", "fsst", "words", "prefix"]


@pytest.mark.parametrize("codec", STR_CODECS)
def test_string_paths_byte_identical(codec):
    vals = (
        ["the quick fox", "", None, "the quick fox", "a  b ", "héllo wörld"]
        + [f"https://h{i % 5}.com/p/{i} tok{i % 7}" for i in range(200)]
        + [None, ""]
    )
    arr = pa.array(vals, type=pa.string())
    s = pd.Series(vals, dtype=object)
    p_pd, m_pd = codecs.encode_column(s, codec, "string")
    p_ar, m_ar = arrowcodecs.encode_column_arrow(arr, codec, "string")
    assert m_pd == m_ar
    assert p_pd == p_ar
    out = codecs.decode_column(p_ar, m_ar)
    for i, v in enumerate(vals):
        if v is None:
            assert out.iloc[i] is None
        else:
            assert out.iloc[i] == v


@pytest.mark.parametrize("codec", ["plain", "fsst", "words", "prefix", "dict"])
def test_binary_paths_byte_identical(codec):
    vals = [b"<html>\xff\xfe\x00</html>", b"", None, b"\x00" * 40, b"ab cd ef"] * 20
    arr = pa.array(vals, type=pa.binary())
    s = pd.Series(vals, dtype=object)
    p_pd, m_pd = codecs.encode_column(s, codec, "binary")
    p_ar, m_ar = arrowcodecs.encode_column_arrow(arr, codec, "binary")
    assert (p_pd, m_pd) == (p_ar, m_ar)
    out = codecs.decode_column(p_ar, m_ar)
    assert out.iloc[0] == vals[0] and out.iloc[2] is None


@pytest.mark.parametrize("codec", ["plain", "for_bitpack", "rle_int", "dict_rle_int"])
def test_int_paths_byte_identical(codec):
    vals = [1, 2, 2, None, -5, 2**62, 0] * 30
    arr = pa.array(vals, type=pa.int64())
    s = pd.Series(vals, dtype="Int64")
    p_pd, m_pd = codecs.encode_column(s, codec, "int64")
    p_ar, m_ar = arrowcodecs.encode_column_arrow(arr, codec, "int64")
    assert (p_pd, m_pd) == (p_ar, m_ar)
    out = codecs.decode_column(p_ar, m_ar)
    assert out.iloc[0] == 1 and out.iloc[3] is pd.NA


def test_timestamp_paths_byte_identical():
    base = 1_704_067_200_000_000
    vals = [base + i * 250_000 for i in range(500)] + [None]
    arr = pa.array(vals, type=pa.timestamp("us"))
    s = pd.Series(np.array([v if v is not None else 0 for v in vals], dtype=np.int64).view("datetime64[us]"))
    s[len(vals) - 1] = pd.NaT
    for codec in ("plain", "for_bitpack"):
        p_pd, m_pd = codecs.encode_column(s, codec, "timestamp")
        p_ar, m_ar = arrowcodecs.encode_column_arrow(arr, codec, "timestamp")
        assert (p_pd, m_pd) == (p_ar, m_ar), codec


def test_double_paths_byte_identical():
    vals = [1.5, -0.0, None, 3.25] * 10
    arr = pa.array(vals, type=pa.float64())
    s = pd.Series(vals, dtype=object)
    p_pd, m_pd = codecs.encode_column(s, "plain", "double")
    p_ar, m_ar = arrowcodecs.encode_column_arrow(arr, "plain", "double")
    assert (p_pd, m_pd) == (p_ar, m_ar)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=60))
def test_property_string_all_codecs(vals):
    arr = pa.array(vals, type=pa.string())
    s = pd.Series(vals, dtype=object)
    for codec in STR_CODECS:
        p_pd, m_pd = codecs.encode_column(s, codec, "string")
        p_ar, m_ar = arrowcodecs.encode_column_arrow(arr, codec, "string")
        assert (p_pd, m_pd) == (p_ar, m_ar), codec


def test_sliced_array_offsets():
    # Arrow slices carry a nonzero .offset — views must rebase correctly
    vals = [f"v{i} tok" for i in range(100)]
    arr = pa.array(vals).slice(13, 40)
    s = pd.Series(vals[13:53], dtype=object)
    for codec in ("plain", "fsst", "words", "prefix", "dict"):
        p_pd, m_pd = codecs.encode_column(s, codec, "string")
        p_ar, m_ar = arrowcodecs.encode_column_arrow(arr, codec, "string")
        assert (p_pd, m_pd) == (p_ar, m_ar), codec


class TestArrowDecode:
    CODECS_STR = ["plain", "dict", "dict_rle", "fsst", "words", "prefix"]

    def _roundtrip(self, vals, typ, codec):
        from kmers_spark import arrowcodecs

        atype = pa.string() if typ == "string" else pa.binary()
        arr = pa.array(vals, type=atype)
        p, m = arrowcodecs.encode_column_arrow(arr, codec, typ)
        out = arrowcodecs.decode_column_arrow(p, m)
        assert out.to_pylist() == vals, codec
        return out

    @pytest.mark.parametrize("codec", CODECS_STR)
    def test_string_decode(self, codec):
        vals = ["the quick fox", "", None, "the quick fox", "a  b "] + [
            f"https://h{i % 5}.com/p/{i} tok{i % 7}" for i in range(100)
        ]
        self._roundtrip(vals, "string", codec)

    @pytest.mark.parametrize("codec", ["plain", "fsst", "words", "prefix", "dict"])
    def test_binary_decode(self, codec):
        vals = [b"<html>\xff\xfe\x00</html>", b"", None, b"\x00" * 40, b"ab cd"] * 10
        self._roundtrip(vals, "binary", codec)

    @pytest.mark.parametrize("codec", ["plain", "for_bitpack", "rle_int", "dict_rle_int"])
    def test_int_decode(self, codec):
        from kmers_spark import arrowcodecs

        vals = [1, 2, 2, None, -5, 2**62, 0] * 10
        arr = pa.array(vals, type=pa.int64())
        p, m = arrowcodecs.encode_column_arrow(arr, codec, "int64")
        out = arrowcodecs.decode_column_arrow(p, m)
        assert out.to_pylist() == vals

    def test_timestamp_ntz_decode(self):
        from kmers_spark import arrowcodecs

        base = 1_704_067_200_000_000
        vals = [base + i * 250_000 for i in range(100)] + [None]
        arr = pa.array(vals, type=pa.timestamp("us"))
        p, m = arrowcodecs.encode_column_arrow(arr, "for_bitpack", "timestamp_ntz")
        out = arrowcodecs.decode_column_arrow(p, m)
        assert out.cast(pa.int64()).to_pylist() == vals

    def test_double_decode(self):
        from kmers_spark import arrowcodecs

        vals = [1.5, -0.0, None, 3.25]
        arr = pa.array(vals, type=pa.float64())
        p, m = arrowcodecs.encode_column_arrow(arr, "plain", "double")
        out = arrowcodecs.decode_column_arrow(p, m)
        assert out.to_pylist() == vals

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=60))
    def test_property_decode(self, vals):
        from kmers_spark import arrowcodecs

        arr = pa.array(vals, type=pa.string())
        for codec in self.CODECS_STR:
            p, m = arrowcodecs.encode_column_arrow(arr, codec, "string")
            out = arrowcodecs.decode_column_arrow(p, m)
            assert out.to_pylist() == vals, codec


class TestPrefixDecodePaths:
    """The columnwise vectorized front-coding decode and the sequential
    fallback (arrowcodecs._prefix_decode_arrow) must agree byte-for-byte;
    the deep-prefix guard picks the fallback without changing output."""

    @staticmethod
    def _roundtrip(vals):
        arr = pa.array(vals, type=pa.string())
        p, m = arrowcodecs.encode_column_arrow(arr, "prefix", "string")
        out = arrowcodecs.decode_column_arrow(p, m)
        assert out.to_pylist() == vals

    def test_sorted_urls_columnwise_path(self):
        rng = np.random.default_rng(11)
        vals = sorted(
            f"https://site{int(rng.integers(0, 20))}.example.com/p/{i}.html"
            for i in range(3000)
        )
        self._roundtrip(vals)

    def test_deep_lone_prefix_fallback_path(self):
        # one 5000-byte shared prefix among tiny rows: maxcps*n >> prefix
        # bytes, so the guard must route to the sequential copy
        vals = ["x" * 5000, "x" * 5000 + "y"] + ["z"] * 200
        self._roundtrip(vals)

    def test_empty_and_degenerate(self):
        for vals in ([], [""], ["", "", ""], ["a"], ["abc", "abc", "abc"],
                     ["ab", "a", "abc", "abd", ""]):
            self._roundtrip(vals)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(alphabet="abq/", max_size=40), max_size=80))
    def test_property_prefix_roundtrip(self, vals):
        self._roundtrip(vals)
