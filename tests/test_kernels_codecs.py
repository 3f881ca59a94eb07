"""dict / RLE / FOR / FSST kernel round-trips over boundary + dirty axes
(FIXTURES.md §4). All comparisons are byte-identical (north-rule invariant)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kmers_spark.kernels import dictenc, foren, fsst, rle


def _obj(vals):
    a = np.empty(len(vals), dtype=object)
    for i, v in enumerate(vals):
        a[i] = v
    return a


class TestDict:
    def test_roundtrip_and_freq_order(self):
        vals = _obj([b"en"] * 6 + [b"de"] * 3 + [b"fr"] * 1)
        payload, meta = dictenc.encode(vals)
        assert meta["dict_size"] == 3 and meta["code_width"] == 2
        out = dictenc.decode(payload, meta)
        assert list(out) == list(vals)
        # hot value gets code 0 (frequency-ordered assignment)
        dict_blob = payload[: meta["dict_nbytes"]]
        assert dictenc.deserialize_dictionary(dict_blob)[0] == b"en"

    def test_tie_broken_by_value(self):
        vals = _obj([b"b", b"a"])
        _, _ = dictenc.encode(vals)
        codes, d = dictenc.build_dictionary(vals)
        assert d == [b"a", b"b"] and list(codes) == [1, 0]

    @pytest.mark.parametrize("n", [0, 1, 31, 32, 33, 64, 65])
    def test_boundary_lengths(self, n):
        rng = np.random.default_rng(7)
        vals = _obj([f"v{rng.integers(0, 5)}".encode() for _ in range(n)])
        payload, meta = dictenc.encode(vals)
        assert list(dictenc.decode(payload, meta)) == list(vals)

    def test_all_identical_and_all_distinct(self):
        same = _obj([b"x"] * 50)
        p, m = dictenc.encode(same)
        assert m["code_width"] == 0
        assert list(dictenc.decode(p, m)) == list(same)
        uniq = _obj([f"u{i}".encode() for i in range(50)])
        p, m = dictenc.encode(uniq)
        assert list(dictenc.decode(p, m)) == list(uniq)

    def test_empty_string_value(self):
        vals = _obj([b"", b"a", b"", b""])
        p, m = dictenc.encode(vals)
        assert list(dictenc.decode(p, m)) == list(vals)


class TestRLE:
    def test_roundtrip(self):
        arr = np.array([0, 0, 0, 1, 1, 2, 0, 0], dtype=np.uint64)
        p, m = rle.encode(arr)
        assert m["n_runs"] == 4
        np.testing.assert_array_equal(rle.decode(p, m), arr)

    def test_degenerate_single_run(self):
        arr = np.zeros(1000, dtype=np.uint64)
        p, m = rle.encode(arr)
        assert m["n_runs"] == 1 and len(p) <= 3
        np.testing.assert_array_equal(rle.decode(p, m), arr)

    def test_alternating_worst_case(self):
        arr = np.tile([0, 1], 500).astype(np.uint64)
        p, m = rle.encode(arr)
        assert m["n_runs"] == 1000
        np.testing.assert_array_equal(rle.decode(p, m), arr)

    def test_empty(self):
        p, m = rle.encode(np.zeros(0, dtype=np.uint64))
        assert rle.decode(p, m).shape == (0,)


class TestFOR:
    def test_near_sorted_uses_delta(self):
        base = 1_700_000_000_000_000
        v = base + np.cumsum(np.random.default_rng(1).integers(0, 600, 5000))
        p, m = foren.encode(v.astype(np.int64))
        assert m["mode"] == "delta"
        np.testing.assert_array_equal(foren.decode(p, m), v)

    def test_random_uses_for(self):
        v = np.random.default_rng(2).integers(10**9, 10**9 + 10**6, 100).astype(np.int64)
        p, m = foren.encode(v)
        np.testing.assert_array_equal(foren.decode(p, m), v)

    def test_negatives_and_extremes(self):
        v = np.array([-(2**62), 2**62, 0, -1, 1], dtype=np.int64)
        p, m = foren.encode(v)
        np.testing.assert_array_equal(foren.decode(p, m), v)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=100))
    def test_property(self, vals):
        v = np.array(vals, dtype=np.int64)
        p, m = foren.encode(v)
        np.testing.assert_array_equal(foren.decode(p, m), v)


class TestFSST:
    def _roundtrip(self, values, sample=None):
        table = fsst.train(sample if sample is not None else values)
        payload, meta = fsst.encode(values, table)
        out = fsst.decode(payload, meta)
        assert out == values
        return payload, meta

    def test_basic_compression(self):
        vals = [b"http://example.com/page/" + str(i).encode() for i in range(200)]
        payload, meta = self._roundtrip(vals)
        raw = sum(len(v) for v in vals)
        assert len(payload) < raw  # actually compresses

    def test_empty_values_and_boundaries(self):
        vals = [b"", b"a", b"", b"ab" * 40, b"", b"x" * 31, b"y" * 32, b"z" * 33]
        self._roundtrip(vals)

    def test_no_boundary_crossing_pairs(self):
        # "ab" frequent but values end with 'a' and start with 'b':
        # matches must not merge across values
        vals = [b"ab" * 10, b"ba", b"a", b"b", b"ab"]
        self._roundtrip(vals)

    def test_bytes_unseen_in_sample_escape(self):
        table = fsst.train([b"aaaa"])
        payload, meta = fsst.encode([b"abc\xff\x00"], table)
        assert fsst.decode(payload, meta) == [b"abc\xff\x00"]

    def test_escape_byte_runs(self):
        # consecutive 0xFF literals stress the escape-run parity rule
        vals = [b"\xff" * 7, b"a\xff\xff", b"\xff"]
        table = fsst.train([b"hello"])  # 0xFF not in table -> escaped
        payload, meta = fsst.encode(vals, table)
        assert fsst.decode(payload, meta) == vals

    def test_binary_with_nuls(self):
        vals = [b"<html>\x00\xfe\x80</html>", b"\x00\x00\x00", b""]
        self._roundtrip(vals)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.binary(max_size=60), max_size=30))
    def test_property(self, vals):
        self._roundtrip(vals)

    def test_deterministic(self):
        vals = [b"the quick brown fox " * 3] * 10 + [b"jumps over"] * 5
        t1, t2 = fsst.train(vals), fsst.train(vals)
        assert t1 == t2
        p1, _ = fsst.encode(vals, t1)
        p2, _ = fsst.encode(vals, t2)
        assert p1 == p2


class TestWords:
    def _roundtrip(self, values):
        from kmers_spark.kernels import words

        payload, meta = words.encode(values)
        assert words.decode(payload, meta) == values
        return payload, meta

    def test_roundtrip_exact_spaces(self):
        # split(' ')/join(' ') must preserve runs of spaces and edges
        vals = [b"a b", b" leading", b"trailing ", b"double  space", b"", b" ", b"  "]
        self._roundtrip(vals)

    def test_compresses_zipf_text(self):
        vocab = [f"word{i}".encode() for i in range(64)]
        vals = [b" ".join(vocab[(i * 7 + j) % 64] for j in range(30)) for i in range(200)]
        payload, _ = self._roundtrip(vals)
        raw = sum(len(v) for v in vals)
        assert len(payload) < 0.35 * raw

    def test_column_layer_with_nulls(self):
        import pandas as pd

        from kmers_spark import codecs

        s = pd.Series(["the quick fox", None, "", "the quick fox", "a  b "], dtype=object)
        p, m = codecs.encode_column(s, "words", "string")
        out = codecs.decode_column(p, m)
        assert out[0] == "the quick fox" and out[1] is None
        assert out[2] == "" and out[4] == "a  b "

    def test_selector_picks_words_for_zipf_text(self):
        import pandas as pd

        from kmers_spark import selector

        vocab = [f"w{i}" for i in range(128)]
        s = pd.Series(
            [
                " ".join(vocab[(i * 37 + j * j * 11) % 128] for j in range(40)) + f" id{i}"
                for i in range(800)
            ]
        )
        stats = selector.column_stats(s, "string")
        assert selector.select_codec(stats, "string") == "words"


class TestPrefix:
    def _roundtrip(self, values):
        from kmers_spark.kernels import prefix

        payload, meta = prefix.encode(values)
        assert prefix.decode(payload, meta) == values
        return payload

    def test_roundtrip_sorted_urls(self):
        vals = sorted(f"https://host{i % 7}.example.com/path/{i}".encode() for i in range(300))
        payload = self._roundtrip(vals)
        assert len(payload) < 0.5 * sum(len(v) for v in vals)

    def test_unsorted_and_edges(self):
        self._roundtrip([b"b", b"a", b"", b"aa", b"a", b""])
        self._roundtrip([])
        self._roundtrip([b""])
        self._roundtrip([b"same", b"same", b"same"])

    def test_column_layer(self):
        import pandas as pd

        from kmers_spark import codecs

        s = pd.Series(sorted([f"https://h{i%3}.com/p/{i}" for i in range(50)]) + [None], dtype=object)
        p, m = codecs.encode_column(s, "prefix", "string")
        out = codecs.decode_column(p, m)
        assert list(out[:50]) == sorted([f"https://h{i%3}.com/p/{i}" for i in range(50)])
        assert out[50] is None
