import numpy as np
import pytest

from dsp_tpu.core.parse import (
    ParseError,
    construct_full_path,
    parse_freq,
    parse_len,
    parse_len_frac,
    parse_selector,
    parse_selector_masked,
    parse_timespec,
    selector_to_string,
    strtod,
)


class TestStrtod:
    def test_basic(self):
        assert strtod("1.5x") == (1.5, "x")
        assert strtod("-3e2k") == (-300.0, "k")
        assert strtod("abc") == (0.0, "abc")
        assert strtod(".5") == (0.5, "")


class TestParseFreq:
    def test_plain(self):
        assert parse_freq("440") == 440.0

    def test_k_suffix(self):
        assert parse_freq("1k") == 1000.0
        assert parse_freq("2.2k") == 2200.0

    def test_trailing_garbage(self):
        with pytest.raises(ParseError):
            parse_freq("1kHz")

    def test_empty(self):
        with pytest.raises(ParseError):
            parse_freq("")


class TestParseLen:
    def test_seconds_default(self):
        assert parse_len("1", 44100) == 44100

    def test_seconds_suffix(self):
        assert parse_len("0.5s", 48000) == 24000

    def test_millis(self):
        assert parse_len("10m", 44100) == 441

    def test_samples(self):
        assert parse_len("100S", 44100) == 100

    def test_negative(self):
        assert parse_len("-10m", 44100) == -441

    def test_frac(self):
        assert parse_len_frac("1.5S", 44100) == 1.5


class TestParseTimespec:
    def test_plain_seconds(self):
        v, rest = parse_timespec("2.5", 44100)
        assert v == int(round(2.5 * 44100))
        assert rest == ""

    def test_mm_ss(self):
        v, rest = parse_timespec("1:30", 44100)
        assert v == 90 * 44100

    def test_hh_mm_ss(self):
        v, rest = parse_timespec("1:00:01", 1000)
        assert v == 3601 * 1000

    def test_negative(self):
        v, rest = parse_timespec("-1:30", 1000)
        assert v == -90 * 1000

    def test_sample_suffix(self):
        v, rest = parse_timespec("500S", 44100)
        assert v == 500

    def test_rest_preserved(self):
        v, rest = parse_timespec("10+5", 1000)
        assert v == 10000 and rest == "+5"


class TestParseSelector:
    def check(self, s, n, expect):
        got = parse_selector(s, n)
        assert got.tolist() == expect, f"{s!r} -> {got}"

    def test_empty_all(self):
        self.check("", 4, [True] * 4)

    def test_dash_all(self):
        self.check("-", 4, [True] * 4)

    def test_open_right(self):
        self.check("2-", 5, [False, False, True, True, True])

    def test_open_left(self):
        self.check("-2", 5, [True, True, True, False, False])

    def test_list(self):
        self.check("1,3", 5, [False, True, False, True, False])

    def test_complex(self):
        self.check("1-3,5", 7, [False, True, True, True, False, True, False])

    def test_out_of_range(self):
        with pytest.raises(ParseError):
            parse_selector("5", 4)

    def test_malformed_range(self):
        with pytest.raises(ParseError):
            parse_selector("3-1", 5)

    def test_double_dash(self):
        with pytest.raises(ParseError):
            parse_selector("1--2", 5)

    def test_bad_char(self):
        with pytest.raises(ParseError):
            parse_selector("1;2", 5)

    def test_lone_comma(self):
        with pytest.raises(ParseError):
            parse_selector(",", 5)


class TestSelectorMasked:
    def test_indices_into_mask(self):
        # mask selects channels 1 and 3; ":0" inside means absolute channel 1
        mask = np.array([False, True, False, True])
        got = parse_selector_masked("0", mask)
        assert got.tolist() == [False, True, False, False]
        got = parse_selector_masked("1", mask)
        assert got.tolist() == [False, False, False, True]

    def test_all(self):
        mask = np.array([True, False, True])
        got = parse_selector_masked("-", mask)
        assert got.tolist() == [True, False, True]


class TestSelectorToString:
    def test_roundtrip(self):
        for s, n in [("0-2", 4), ("1,3", 5), ("0", 1), ("2-", 6)]:
            mask = parse_selector(s, n)
            s2 = selector_to_string(mask)
            assert parse_selector(s2, n).tolist() == mask.tolist()

    def test_two_adjacent_uses_comma(self):
        assert selector_to_string(np.array([True, True, False])) == "0,1"

    def test_range(self):
        assert selector_to_string(np.array([True, True, True])) == "0-2"


class TestFullPath:
    def test_substitutions(self):
        assert (
            construct_full_path(None, "/x/%r_%c.wav", 44100, 2) == "/x/44100_2.wav"
        )
        assert construct_full_path(None, "/x/%k.wav", 44100, 2) == "/x/44.1.wav"
        assert construct_full_path(None, "/x/100%%.wav", 44100, 2) == "/x/100%.wav"

    def test_relative_dir(self):
        assert construct_full_path("/base", "f.wav", 44100, 2) == "/base/f.wav"

    def test_absolute(self):
        assert construct_full_path("/base", "/f.wav", 44100, 2) == "/f.wav"

    def test_home(self, monkeypatch):
        monkeypatch.setenv("HOME", "/home/u")
        assert construct_full_path("/base", "~/f.wav", 44100, 2) == "/home/u/f.wav"
