"""UTF-8 layer tests, porting the reference's Utf8Spec golden corpus
(`tests/Data/Text/Utf8Spec.hs`) plus vectorized-codec round-trip properties."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from alfred_margaret_tpu.utils import utf8

FANCY_ALPHABET = "aAАБВБ2ÅÅå\U0001d11e\U0001f4a9ßẞ"


class TestCaseMapping:
    def test_to_lower_ascii_equiv(self):
        for cp in range(0x80):
            c = chr(cp)
            assert utf8.to_lower_ascii(c) == (c.lower() if "A" <= c <= "Z" else c)

    def test_lower_code_point_idempotent_bmp(self):
        # Char.toLower is idempotent on the BMP (Utf8Spec "is idempotent")
        tbl = utf8.LOWER_TABLE
        bmp = np.arange(0x10000)
        assert np.array_equal(tbl[tbl[bmp]], tbl[bmp])

    def test_lower_specials(self):
        assert utf8.lower_code_point("İ") == "i"  # İ
        assert utf8.lower_code_point("K") == "k"  # Kelvin
        assert utf8.lower_code_point("Å") == "å"  # Angstrom
        assert utf8.lower_code_point("ẞ") == "ß"  # ẞ -> ß
        assert utf8.lower_code_point("ϴ") == "θ"  # ϴ -> θ
        assert utf8.lower_code_point("Ω") == "ω"  # Ω (ohm) -> ω
        assert utf8.lower_code_point("Ǆ") == "ǆ"  # Ǆ -> ǆ
        assert utf8.lower_code_point("ǅ") == "ǆ"  # ǅ -> ǆ
        assert utf8.lower_code_point("Ⱥ") == "ⱥ"  # Ⱥ -> ⱥ (2B -> 3B)

    def test_unlower_goldens(self):
        assert utf8.unlower_code_point("A") == ""
        assert utf8.unlower_code_point("ẞ") == ""
        assert utf8.unlower_code_point("1") == "1"
        assert utf8.unlower_code_point("a") == "aA"
        assert utf8.unlower_code_point("ß") == "ẞß"
        assert utf8.unlower_code_point("i") == "İiI"
        assert [ord(c) for c in utf8.unlower_code_point("k")] == [0x212A, 0x6B, 0x4B]
        assert [ord(c) for c in utf8.unlower_code_point("å")] == [0x212B, 0xE5, 0xC5]

    def test_is_case_invariant(self):
        assert utf8.is_case_invariant("")
        assert utf8.is_case_invariant(".")
        assert utf8.is_case_invariant(".,;'123")
        assert utf8.is_case_invariant("\U0001f4a9")
        assert not utf8.is_case_invariant("a")
        assert not utf8.is_case_invariant("A..")
        assert not utf8.is_case_invariant("ß.")
        assert not utf8.is_case_invariant("ẞ")
        assert not utf8.is_case_invariant("İ")


class TestEncoding:
    @pytest.mark.parametrize(
        "char,expected",
        [
            ("$", [0x24]),
            ("€", [0xE2, 0x82, 0xAC]),
            ("£", [0xC2, 0xA3]),
            ("\U00010348", [0xF0, 0x90, 0x8D, 0x88]),
        ],
    )
    def test_unicode2utf8_goldens(self, char, expected):
        assert utf8.unicode2utf8(ord(char)) == expected
        assert list(char.encode()) == expected

    @given(st.text(min_size=0, max_size=200))
    def test_decode_encode_roundtrip(self, s):
        arr = utf8.to_u8(s)
        cps, starts, lens = utf8.decode_utf8_np(arr)
        assert "".join(map(chr, cps)) == s
        enc, out_lens = utf8.encode_utf8_np(cps)
        assert enc.tobytes() == s.encode()
        assert np.array_equal(out_lens, lens)

    def test_decode_utf8_surface(self):
        assert utf8.decode_utf8("héllo 𐍈💩".encode()) == "héllo 𐍈💩"
        # malformed input never raises: stray trail/lead bytes pass through
        # as single-byte pseudo code points (decode_code_point's rule) —
        # including 0xF5-0xF8 leads whose 4-byte decode exceeds U+10FFFF
        assert utf8.decode_utf8(b"\xff\x80ab") == "\xff\x80ab"
        assert utf8.decode_utf8(b"\xf7\xbf\xbf\xbfz") == "\xf7\xbf\xbf\xbfz"

    @given(st.text(alphabet=FANCY_ALPHABET, max_size=100))
    def test_decode_positions(self, s):
        arr = utf8.to_u8(s)
        cps, starts, lens = utf8.decode_utf8_np(arr)
        # starts/lens must tile the byte array exactly
        if len(cps):
            assert np.array_equal(starts + lens, np.append(starts[1:], len(arr)))
        else:
            assert len(arr) == 0


class TestSkipBackwards:
    def test_ascii(self):
        for n, expect in [(0, 3), (1, 2), (2, 1), (3, 0)]:
            assert utf8.skip_code_points_backwards("abcd", 3, n) == expect

    def test_moves_to_start_skip_zero(self):
        t = "\U0001f4a9\U0001f4a9"
        for idx in range(4):
            assert utf8.skip_code_points_backwards(t, idx, 0) == 0
        for idx in range(4, 8):
            assert utf8.skip_code_points_backwards(t, idx, 0) == 4

    def test_skip_one_multibyte(self):
        t = "\U0001f4a9\U0001f4a9"
        for idx in range(4, 8):
            assert utf8.skip_code_points_backwards(t, idx, 1) == 0

    def test_skip_multiple_multibyte(self):
        # a, İ, ẞ and 💩 have byte lengths 1, 2, 3 and 4
        t = "aİẞ\U0001f4a9ẞİa"
        cases = [
            (15, 0, 15), (15, 1, 13), (15, 2, 10), (15, 3, 6), (15, 4, 3),
            (15, 5, 1), (15, 6, 0), (14, 2, 6), (13, 2, 6), (10, 3, 1), (9, 3, 0),
        ]
        for idx, n, expect in cases:
            assert utf8.skip_code_points_backwards(t, idx, n) == expect

    def test_out_of_bounds(self):
        t = "\U0001f4a9\U0001f4a9"
        with pytest.raises(IndexError):
            utf8.skip_code_points_backwards(t, 8, 0)
        with pytest.raises(IndexError):
            utf8.skip_code_points_backwards(t, 7, 2)


class TestSlicing:
    def test_example(self):
        # Reference slices within a Text that itself has a nonzero offset
        # ("BCDEFGHIJKL" inside "ABCDEFGHIJKLMN"); our bytes are unsliced so
        # apply the offset directly.
        data = "BCDEFGHIJKL".encode()
        assert utf8.unsafe_slice_utf8(2, 6, data) == b"DEFGHI"
        assert utf8.unsafe_cut_utf8(2, 6, data) == (b"BC", b"JKL")

    @given(st.data())
    def test_cut_slice_complementary(self, data):
        text = b"BCDEFGHIJKL"
        begin = data.draw(st.integers(0, len(text)))
        length = data.draw(st.integers(0, len(text) - begin))
        prefix, suffix = utf8.unsafe_cut_utf8(begin, length, text)
        assert prefix + utf8.unsafe_slice_utf8(begin, length, text) + suffix == text


class TestLowerTransform:
    @given(st.text(max_size=300))
    @settings(max_examples=200)
    def test_matches_scalar_lowering(self, s):
        lt = utf8.lower_transform(s)
        assert lt.lowered.tobytes().decode("utf-8") == utf8.lower_str(s)

    @given(st.text(alphabet=FANCY_ALPHABET + "İȺȾ", max_size=80))
    @settings(max_examples=200)
    def test_raw_coordinates(self, s):
        """raw_start/raw_end per code point must tile the raw byte string."""
        lt = utf8.lower_transform(s)
        raw = s.encode()
        cps = [c for c in s]
        assert lt.n_code_points == len(cps)
        pos = 0
        for i, c in enumerate(cps):
            assert lt.raw_start[i] == pos
            pos += len(c.encode())
            assert lt.raw_end[i] == pos
        # cp_index maps every lowered byte to its source code point, monotonically
        lowered_lens = [len(utf8.lower_code_point(c).encode()) for c in cps]
        expected_cpidx = np.repeat(np.arange(len(cps)), lowered_lens)
        assert np.array_equal(lt.cp_index, expected_cpidx)

    def test_shrinking_and_growing(self):
        # İ (2B) lowers to i (1B); Ⱥ (2B) lowers to ⱥ (3B)
        lt = utf8.lower_transform("İxȺ")
        assert lt.lowered.tobytes() == "i x ⱥ".replace(" ", "").encode()
        assert lt.match_raw_end(1) == 2  # after 'i' -> after İ's 2 raw bytes
        assert lt.match_raw_end(2) == 3  # after 'x'
        assert lt.match_raw_end(5) == 5  # after ⱥ -> İ(2)+x(1)+Ⱥ(2)


class TestStrictStreamingLowering:
    """The strict streaming transducer contract (utf8.decode_strict): the
    scalar reference, the vectorized numpy path, and the native path must
    produce identical units and lowered bytes on ANY input — valid UTF-8,
    malformed soup, truncations, overlongs, surrogates."""

    CASES = [
        b"",
        b"plain ASCII with UPPER and lower 0123",
        "İstanbul STRASSE straße Ⱥx ǄǱ θΩ K Å 𝄞💩".encode(),
        b"\xc3",  # truncated 2-byte
        b"\xc3A",  # 2-byte interrupted by ASCII
        b"\x80\x81\xbf",  # orphan continuations
        b"\xc0\x81\xc1\xbf",  # overlong 2-byte forms (invalid leads)
        b"\xe0\x80\x80",  # overlong 3-byte
        b"\xed\xa0\x80",  # surrogate
        b"\xf4\x90\x80\x80",  # > U+10FFFF
        b"\xf0\x9f\x92",  # truncated 4-byte
        b"A\xc3\xa9\xffB\xe2\x84\xaaZ",  # mix valid/invalid
    ]

    def _soup(self):
        import numpy as np

        rng = np.random.default_rng(12)
        return bytes(rng.integers(0, 256, size=65536, dtype=np.uint8).tolist())

    def test_scalar_vs_numpy_units(self):
        import numpy as np

        from alfred_margaret_tpu.utils import utf8

        for raw in self.CASES + [self._soup()]:
            ref = utf8.lower_units_scalar(raw)
            arr = np.frombuffer(raw, dtype=np.uint8)
            lowered, starts, raw_lens, out_lens = utf8.lower_units_np(arr)
            assert [int(s) for s in starts] == [u[0] for u in ref], raw[:20]
            assert [int(l) for l in raw_lens] == [u[1] for u in ref], raw[:20]
            assert bytes(lowered) == b"".join(u[2] for u in ref), raw[:20]
            assert [int(o) for o in out_lens] == [len(u[2]) for u in ref]

    def test_native_vs_scalar(self):
        from alfred_margaret_tpu.utils import utf8

        if utf8._native_lib() is None:
            import pytest

            pytest.skip("native lib unavailable")
        for raw in self.CASES + [self._soup()]:
            ref = utf8.lower_units_scalar(raw)
            lt = utf8.lower_transform(raw, need_coords=True)
            assert bytes(lt.lowered) == b"".join(u[2] for u in ref), raw[:20]
            if not lt.identity:
                assert [int(s) for s in lt.raw_start] == [u[0] for u in ref]
            fast = utf8.lower_transform(raw, need_coords=False)
            assert bytes(fast.lowered) == bytes(lt.lowered), raw[:20]

    def test_oracle_matches_lowered_scan(self):
        """run_with_case(IGNORE_CASE) on raw bytes == CASE_SENSITIVE scan of
        the lowered stream, including on malformed input."""
        from alfred_margaret_tpu.models import ac
        from alfred_margaret_tpu.utils import utf8
        from alfred_margaret_tpu.utils.case import CASE_SENSITIVE, IGNORE_CASE

        needles = ["abc", "é", "k", "i", "ß"]
        m = ac.build([(utf8.lower_str(n), i) for i, n in enumerate(needles)])
        for raw in self.CASES + [self._soup()[:8000]]:
            lowered = utf8.lower_transform(raw, need_coords=False).lowered
            assert ac.count_matches(m, raw, IGNORE_CASE) == ac.count_matches(
                m, bytes(lowered), CASE_SENSITIVE
            ), raw[:20]
