"""DNA domain kernels vs the reference's golden values (FIXTURES.md §3)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kmers_spark.kernels import domain

DNA = st.text(alphabet="ACGTacgt", min_size=1, max_size=32)


def test_golden_k15_pack():
    # naive.rs:296-355: TAAGGATTCTAATCA -> codes + u32 word 118354563
    codes = domain.seq_to_codes("TAAGGATTCTAATCA")
    assert list(codes) == [3, 0, 0, 2, 2, 0, 3, 3, 1, 3, 0, 0, 3, 1, 0]
    word = domain.pack_word(codes)
    assert word == 118354563
    assert domain.unpack_word(word, 15) == "taaggattctaatca"


def test_golden_k15_revcomp():
    word = domain.pack_word(domain.seq_to_codes("TAAGGATTCTAATCA"))
    rc = domain.revcomp_words(np.array([word], dtype=np.uint64), 15)[0]
    assert domain.unpack_word(int(rc), 15) == "tgattagaatcctta"
    assert domain.revcomp_str("TAAGGATTCTAATCA") == "TGATTAGAATCCTTA"


def test_case_insensitive():
    # kmer.rs:469-474: Kmer::from("aaa") == Kmer::from("AAA")
    a = domain.pack_word(domain.seq_to_codes("aCgT"))
    b = domain.pack_word(domain.seq_to_codes("ACGT"))
    assert a == b


def test_k33_rejected():
    # kmer.rs:477-485: 32 ok, 33 panics
    domain.pack_word(domain.seq_to_codes("A" * 32))
    with pytest.raises(ValueError):
        domain.pack_word(domain.seq_to_codes("A" * 33))


def test_invalid_symbol_sentinel():
    # encode_binary_u8 -> u64::MAX for invalid (mod.rs:40-50); ours -> 255
    codes = domain.seq_to_codes("ANc")
    assert codes[1] == domain.INVALID
    with pytest.raises(ValueError):
        domain.pack_word(codes)


def test_kmer_extraction_golden():
    # seq_vector.rs:342-356 / FIXTURES §3: ACTTGAT 3-mers act,ctt,ttg,tga,gat
    codes = domain.seq_to_codes("ACTTGAT")
    words = domain.kmer_words(codes, 3)
    assert [domain.unpack_word(int(w), 3) for w in words] == ["act", "ctt", "ttg", "tga", "gat"]


def test_valid_window_scan():
    # canonical_kmer_iterator.rs:165-189: windows containing invalid symbols skipped
    codes = domain.seq_to_codes("ACGNACGT")
    mask = domain.valid_windows(codes, 3)
    # windows at 0..5; those covering index 3 (N) invalid -> positions 1,2,3
    assert list(mask) == [True, False, False, False, True, True]
    assert list(domain.valid_windows(domain.seq_to_codes("ACG"), 3)) == [True]


def test_canonical_min():
    # kmer.rs:68-74: canonical = min(fw, rc)
    w = np.array([domain.pack_word(domain.seq_to_codes("taa"))], dtype=np.uint64)
    canon = domain.canonical_words(w, 3)[0]
    # rc(taa) = tta; min as packed words
    rc = domain.revcomp_words(w, 3)[0]
    assert canon == min(int(w[0]), int(rc))


@settings(max_examples=100, deadline=None)
@given(DNA)
def test_rc_involution(s):
    # quickcheck rc_identity (kmer.rs:280-284): rc(rc(x)) == x
    k = len(s)
    w = np.array([domain.pack_word(domain.seq_to_codes(s))], dtype=np.uint64)
    assert domain.revcomp_words(domain.revcomp_words(w, k), k)[0] == w[0]


@settings(max_examples=100, deadline=None)
@given(DNA)
def test_canonical_is_canonical(s):
    # quickcheck to_canonical_is_canonical (kmer.rs:286-290)
    k = len(s)
    w = np.array([domain.pack_word(domain.seq_to_codes(s))], dtype=np.uint64)
    c = domain.canonical_words(w, k)
    assert (domain.canonical_words(c, k) == c).all()


@settings(max_examples=60, deadline=None)
@given(DNA)
def test_pack_unpack_roundtrip(s):
    w = domain.pack_word(domain.seq_to_codes(s))
    assert domain.unpack_word(w, len(s)) == s.lower()


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ACGT", min_size=1, max_size=200))
def test_revcomp_words_match_string_domain(s):
    k = min(len(s), 31)
    words = domain.kmer_words(domain.seq_to_codes(s), k)
    rcs = domain.revcomp_words(words, k)
    for i in range(len(words)):
        sub = s[i : i + k]
        assert domain.unpack_word(int(rcs[i]), k) == domain.revcomp_str(sub).lower()


class TestMinimizers:
    def test_all_As_leftmost(self):
        # minimizers.rs:220-235 leftmost_mmer: ties keep the leftmost
        # in-window w-mer — positions advance as the window slides
        codes = domain.seq_to_codes("AAAAAAA")
        out = domain.minimizers(codes, k=5, w=3)
        assert out == [(0, 0), (0, 1), (0, 2)]

    def test_golden_lex_mmers(self):
        # minimizers.rs:238-290 mmers0/1/2 under LexHasher
        def lex(word):
            return int(domain.lex_keys(np.array([word], dtype=np.uint64), 3)[0])

        out = domain.minimizers(domain.seq_to_codes("AAACAAA"), 6, 3, hash_fn=lex)
        assert out == [(0, 0), (0, 4)]

        out = domain.minimizers(domain.seq_to_codes("AACCAAA"), 5, 3, hash_fn=lex)
        assert out == [(0b010000, 0), (0b010100, 1), (0b000000, 4)]

        out = domain.minimizers(domain.seq_to_codes("CACACACCAC"), 7, 3, hash_fn=lex)
        aca = 0b000100
        assert out == [(aca, 1), (aca, 1), (aca, 3), (aca, 3)]

    def test_lexicographic_golden(self):
        # LexHasher => lexicographically smallest w-mer (hash.rs:84-104);
        # identity on packed words is NOT lex order, so compare via brute force
        codes = domain.seq_to_codes("CACACACCAC")
        k, w = 5, 3
        out = domain.minimizers(codes, k, w)
        # brute-force oracle: min over window by (key, pos)
        wmers = domain.kmer_words(codes, w)
        for j, (val, pos) in enumerate(out):
            window = [(int(wmers[i]), i) for i in range(j, j + k - w + 1)]
            exp_val, exp_pos = min(window)
            assert (val, pos) == (exp_val, exp_pos)

    def test_deque_matches_bruteforce_random(self):
        rng = np.random.default_rng(42)
        s = "".join(rng.choice(list("ACGT"), 300))
        codes = domain.seq_to_codes(s)
        k, w = 12, 5
        out = domain.minimizers(codes, k, w)
        wmers = domain.kmer_words(codes, w)
        assert len(out) == len(s) - k + 1
        for j, (val, pos) in enumerate(out):
            window = [(int(wmers[i]), i) for i in range(j, j + k - w + 1)]
            assert (val, pos) == min(window)


# ------------------------------------------------------- multi-word (k > 32)
# Goldens mirror /root/reference/src/encoding/naive.rs:387-445 (k45pu64 /
# k65pu128); the u128 words are re-expressed as 3 little-endian u64s.

K45_SEQ = "TAAGGATTCTAATCATAAGGATTCTAATCATAAGGATTCTAATCA"
K45_WORDS = [3585846758293238403, 7397160]
K45_RC = "TGATTAGAATCCTTATGATTAGAATCCTTATGATTAGAATCCTTA"
K65_SEQ = "TAAGGATTCTAATCATAAGGATTCTAATCATAAGGATTCTAATCATAAGGATTCTAATCAGGGGG"
K65_U128 = (226115275135941975929349834069397860995, 2)
K65_RC = "CCCCCTGATTAGAATCCTTATGATTAGAATCCTTATGATTAGAATCCTTATGATTAGAATCCTTA"


def test_pack_batch_k45_golden():
    w = domain.pack_batch(domain.codes_matrix(np.array([K45_SEQ]), 45))
    assert w.tolist() == [K45_WORDS]
    assert domain.unpack_batch(w, 45).astype(str)[0] == K45_SEQ.lower()


def test_revcomp_batch_k45_golden():
    w = domain.pack_batch(domain.codes_matrix(np.array([K45_SEQ]), 45))
    rc = domain.unpack_batch(domain.revcomp_batch(w, 45), 45).astype(str)[0]
    assert rc == K45_RC.lower()


def test_pack_batch_k65_golden():
    lo, hi = K65_U128
    expect = [lo & (2**64 - 1), lo >> 64, (lo >> 128) | (hi & (2**64 - 1))]
    w = domain.pack_batch(domain.codes_matrix(np.array([K65_SEQ]), 65))
    assert w.tolist() == [expect]
    rc = domain.unpack_batch(domain.revcomp_batch(w, 65), 65).astype(str)[0]
    assert rc == K65_RC.lower()


def test_multiword_matches_single_word_below_32():
    rng = np.random.default_rng(3)
    seqs = np.array(["".join(rng.choice(list("ACGT"), 17)) for _ in range(64)])
    wb = domain.pack_batch(domain.codes_matrix(seqs, 17))
    assert wb.shape == (64, 1)
    for i, s in enumerate(seqs):
        assert int(wb[i, 0]) == domain.pack_word(domain.seq_to_codes(s))
        rc1 = domain.revcomp_words(wb[i : i + 1, 0].copy(), 17)[0]
        assert int(domain.revcomp_batch(wb[i : i + 1], 17)[0, 0]) == int(rc1)


def test_canonical_batch_is_packed_value_min():
    """canonical = min over the packed integer = min over the REVERSED
    string lex order (low bits hold the first base)."""
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), 45)) for _ in range(300)]
    wb = domain.pack_batch(domain.codes_matrix(np.array(seqs), 45))
    canon = domain.unpack_batch(domain.canonical_batch(wb, 45), 45).astype(str)
    rc_t = str.maketrans("ACGT", "TGCA")
    for c, s in zip(canon, seqs):
        expect = min(s, s.translate(rc_t)[::-1], key=lambda x: x[::-1])
        assert c.upper() == expect


def test_pack_batch_rejects_invalid():
    with pytest.raises(ValueError):
        domain.pack_batch(domain.codes_matrix(np.array(["ACGNA"]), 5))


# ----------------------------------------------------------------- xor10

def test_xor10_codes_are_arithmetic():
    # xor10.rs:17-22: code = (ascii >> 1) & 0b11 -> A=0 C=1 T=2 G=3;
    # case-insensitive because the ASCII case bit lands above the mask
    m = domain.xor10_codes_matrix(np.array(["ACTG", "actg"]), 4)
    assert m.tolist() == [[0, 1, 2, 3], [0, 1, 2, 3]]


def test_xor10_roundtrip_and_complement():
    seqs = np.array(["ACGTACGTAC", "TTTTTTTTTT", "GCGCGCGCGC"])
    codes = domain.xor10_codes_matrix(seqs, 10)
    words = domain.pack_batch(codes)
    assert [s.decode() for s in domain.xor10_unpack_batch(words, 10)] == list(seqs)
    comp = domain.pack_batch(domain.xor10_complement(codes))
    out = [s.decode() for s in domain.xor10_unpack_batch(comp, 10)]
    t = str.maketrans("ACGT", "TGCA")
    assert out == [s.translate(t) for s in seqs]


def test_xor10_multiword_k40():
    rng = np.random.default_rng(7)
    seqs = np.array(["".join(rng.choice(list("ACGT"), 40)) for _ in range(32)])
    words = domain.pack_batch(domain.xor10_codes_matrix(seqs, 40))
    assert words.shape == (32, 2)
    assert [s.decode() for s in domain.xor10_unpack_batch(words, 40)] == list(seqs)


def test_packed_seq_slice_random_access():
    """SeqVectorSlice semantics (seq_vector.rs:25-81): k-mer at any
    position from the packed bytes, touching <= 9 bytes per lookup."""
    rng = np.random.default_rng(11)
    s = "".join(rng.choice(list("ACGT"), 257))
    b = domain.pack_seq(s)
    assert len(b) == (257 * 2 + 7) // 8
    for k in (1, 9, 31, 32):
        poss = np.arange(0, 257 - k + 1)
        w = domain.slice_kmers_packed([b] * len(poss), poss, k)
        got = [x.decode() for x in domain.unpack_batch(w.reshape(-1, 1), k)]
        assert got == [s[p : p + k].lower() for p in poss]
    with pytest.raises(ValueError):
        domain.slice_kmers_packed([b], np.array([0]), 33)


class TestBufferViewKernels:
    """Whole-batch (buffer, offsets) kernels must be byte-identical to
    the per-document forms they replace (round-3 per-row-Python purge)."""

    def test_pack_seq_batch_matches_per_doc(self):
        import numpy as np
        from kmers_spark.kernels import domain as d

        rng = np.random.default_rng(11)
        seqs = [
            "".join(rng.choice(list("ACGTacgt"), rng.integers(0, 100)))
            for _ in range(500)
        ] + ["", "A", "ACG", "ACGT", "ACGTA"]
        data = np.frombuffer(b"".join(s.encode() for s in seqs), dtype=np.uint8)
        offs = np.zeros(len(seqs) + 1, np.int64)
        np.cumsum([len(s) for s in seqs], out=offs[1:])
        pdata, poffs = d.pack_seq_batch(data, offs)
        for i, s in enumerate(seqs):
            assert bytes(pdata[poffs[i]:poffs[i + 1]]) == d.pack_seq(s), (i, s)

    def test_pack_seq_batch_rejects_invalid(self):
        import numpy as np
        import pytest
        from kmers_spark.kernels import domain as d

        data = np.frombuffer(b"ACGNT", dtype=np.uint8)
        offs = np.array([0, 5], np.int64)
        with pytest.raises(ValueError, match="invalid"):
            d.pack_seq_batch(data, offs)

    def test_slice_view_matches_per_doc(self):
        import numpy as np
        from kmers_spark.kernels import domain as d

        rng = np.random.default_rng(12)
        k = 11
        seqs = [
            "".join(rng.choice(list("acgt"), rng.integers(k, 200)))
            for _ in range(400)
        ]
        bufs = [d.pack_seq(s) for s in seqs]
        pos = np.array([rng.integers(0, len(s) - k + 1) for s in seqs], np.int64)
        old = d.slice_kmers_packed(bufs, pos, k)
        data = np.frombuffer(b"".join(bufs), np.uint8)
        offs = np.zeros(len(bufs) + 1, np.int64)
        np.cumsum([len(b) for b in bufs], out=offs[1:])
        new = d.slice_kmers_packed_view(data, offs, pos, k)
        assert (old == new).all()
        # decoded k-mers equal the source substrings
        dec = d.unpack_batch(new.reshape(-1, 1), k).astype(str)
        for i, s in enumerate(seqs):
            assert dec[i] == s[pos[i]:pos[i] + k].lower()

    def test_slice_view_empty(self):
        import numpy as np
        from kmers_spark.kernels import domain as d

        out = d.slice_kmers_packed_view(
            np.zeros(0, np.uint8), np.array([0], np.int64), np.zeros(0, np.int64), 9
        )
        assert out.shape == (0,)
