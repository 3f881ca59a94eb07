"""bitpack round-trips across widths and boundary lengths (SURVEY.md §5.2b)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kmers_spark.kernels import bitpack

BOUNDARY_LENGTHS = [0, 1, 31, 32, 33, 63, 64, 65]


@pytest.mark.parametrize("width", [1, 2, 3, 5, 7, 8, 11, 16, 24, 32, 48, 64])
@pytest.mark.parametrize("n", BOUNDARY_LENGTHS)
def test_roundtrip(width, n):
    rng = np.random.default_rng(42)
    hi = (1 << width) - 1
    vals = rng.integers(0, hi, size=n, endpoint=True, dtype=np.uint64)
    buf = bitpack.pack(vals, width)
    assert len(buf) == bitpack.packed_nbytes(n, width) or n == 0
    out = bitpack.unpack(buf, width, n)
    np.testing.assert_array_equal(out, vals)


def test_two_bit_golden():
    # the reference's 2-bit layout: TAAGGATTCTAATCA codes, low-bits-first
    # packs to u32 118354563 / LE bytes [131,242,13,7] (naive.rs:296-355)
    codes = np.array([3, 0, 0, 2, 2, 0, 3, 3, 1, 3, 0, 0, 3, 1, 0], dtype=np.uint64)
    buf = bitpack.pack(codes, 2)
    assert list(buf) == [131, 242, 13, 7]
    word = int.from_bytes(buf, "little")
    assert word == 118354563


def test_width_zero_all_same():
    buf = bitpack.pack(np.zeros(100, dtype=np.uint64), 0)
    assert buf == b""
    np.testing.assert_array_equal(bitpack.unpack(buf, 0, 100), np.zeros(100, dtype=np.uint64))


def test_value_too_wide_raises():
    with pytest.raises(ValueError):
        bitpack.pack(np.array([4], dtype=np.uint64), 2)


def test_width_guard():
    # lesson of MASK_TABLE[32]=0 (reference kmer.rs:617): explicit bound check
    with pytest.raises(ValueError):
        bitpack.pack(np.array([1], dtype=np.uint64), 65)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 37) - 1), max_size=200),
    st.integers(min_value=37, max_value=64),
)
def test_roundtrip_property(vals, width):
    arr = np.array(vals, dtype=np.uint64)
    out = bitpack.unpack(bitpack.pack(arr, width), width, len(arr))
    np.testing.assert_array_equal(out, arr)


def test_lane_kernels_match_bitmatrix_oracle():
    """The allocation-lean lane kernels (widths 1-7 grouped-u64, 9-57
    8-phase strided OR) must produce byte-identical streams to the
    bit-matrix reference across widths, phases, and ragged lengths."""
    import numpy as np

    from kmers_spark.kernels import bitpack as bp

    rng = np.random.default_rng(1234)
    for width in (1, 2, 3, 5, 6, 7, 9, 11, 12, 13, 17, 21, 24, 31, 33,
                  40, 48, 51, 56, 57, 58, 63):
        for n in (1, 2, 7, 8, 9, 15, 16, 17, 997):
            codes = rng.integers(0, 1 << width, size=n, dtype=np.uint64)
            got = bp.pack(codes, width)
            assert got == bp._pack_bitmatrix(codes, width), (width, n)
            assert np.array_equal(bp.unpack(got, width, n), codes)
            assert np.array_equal(
                bp._unpack_bitmatrix(got, width, n), codes)


def test_unpack_tolerates_trailing_slack():
    """The bit-matrix implementation accepted buffers longer than
    packed_nbytes (trailing padding); the lane kernels must too."""
    import numpy as np

    from kmers_spark.kernels import bitpack as bp

    rng = np.random.default_rng(9)
    for width in (3, 5, 7, 13, 17, 33, 57):
        codes = rng.integers(0, 1 << width, size=101, dtype=np.uint64)
        buf = bp.pack(codes, width) + b"\x00" * 37  # slack
        assert np.array_equal(bp.unpack(buf, width, 101), codes)
