"""Golden values per reference `test/unit/process/meta/TestHammingNumber.cpp:13-18`."""

from blah2_tpu.dsp.hamming import is_hamming, next_hamming


def test_golden_values():
    assert next_hamming(104) == 108
    assert next_hamming(3322) == 3375
    assert next_hamming(19043) == 19200


def test_strictly_greater():
    # next_hamming returns the first Hamming number strictly above the input.
    assert next_hamming(108) == 120
    assert next_hamming(1) == 2
    assert next_hamming(2) == 3


def test_is_hamming():
    assert is_hamming(6750)
    assert not is_hamming(6643)
    assert not is_hamming(7)


def test_sequence_consistency():
    # Brute-force cross-check over a small range.
    smooth = [v for v in range(1, 2000) if is_hamming(v)]
    for lo, hi in zip(smooth, smooth[1:]):
        assert next_hamming(lo) == hi


class TestFftTableLookup:
    """Measured fast-size table override of next_tpu_fft_size (the v5e FFT
    cliff is not capturable by any static factor rule: 768000 is 5-smooth,
    %128, and 10x slower than 1536000 — tools/fft_size_survey.py)."""

    def _with_table(self, monkeypatch, ms, fast=0.8):
        from blah2_tpu.dsp import hamming

        monkeypatch.setattr(hamming, "_FFT_TABLE",
                            (sorted(ms), dict(ms), fast))
        return hamming

    def test_fast_table_size_overrides_slow_heuristic(self, monkeypatch):
        h = self._with_table(monkeypatch,
                             {768000: 4.7, 786432: 0.05, 1536000: 0.44})
        # heuristic pick for 750410 is 768000 (measured slow); 786432 is
        # measured fast and within 1.35x -> table wins
        assert h.next_tpu_fft_size(750_410) == 786432

    def test_fast_heuristic_pick_stands(self, monkeypatch):
        h = self._with_table(monkeypatch,
                             {1536000: 0.44, 1572864: 2.8})
        assert h.next_tpu_fft_size(1_500_410) == 1536000

    def test_marginal_table_win_does_not_churn_programs(self, monkeypatch):
        # base measured 1.0 ms (not fast), alternative 0.7 ms: < 1.65x
        # better -> keep the heuristic pick (compiled-program stability)
        h = self._with_table(monkeypatch, {768000: 1.0, 786432: 0.7},
                             fast=0.8)
        assert h.next_tpu_fft_size(750_410) == 768000

    def test_overhead_cap(self, monkeypatch):
        # only fast size is >1.35x the request -> heuristic stands
        h = self._with_table(monkeypatch, {768000: 4.7, 1536000: 0.44})
        assert h.next_tpu_fft_size(750_410) == 768000

    def test_small_sizes_never_consult_table(self, monkeypatch):
        h = self._with_table(monkeypatch, {20480: 0.01})
        assert h.next_tpu_fft_size(10_000) == 10240

    def test_no_table_falls_back(self, monkeypatch):
        from blah2_tpu.dsp import hamming

        monkeypatch.setattr(hamming, "_FFT_TABLE", ())
        v = hamming.next_tpu_fft_size(750_410)
        assert v == 768000 and hamming.is_hamming(v) and v % 128 == 0

    def test_repo_table_if_present_is_wellformed(self, monkeypatch):
        from blah2_tpu.dsp import hamming

        monkeypatch.setattr(hamming, "_FFT_TABLE", None)
        t = hamming._fft_table()
        if t is None:
            return  # table not generated in this checkout
        sizes, ms, fast = t
        assert fast > 0 and sizes == sorted(ms)
        assert all(hamming.is_hamming(m) and m % 128 == 0 for m in sizes)
        # every choice the table makes must stay 5-smooth %128 and > value
        for value in (187_910, 375_410, 750_410, 1_000_410, 1_500_410):
            v = hamming.next_tpu_fft_size(value)
            assert v > value and hamming.is_hamming(v) and v % 128 == 0
