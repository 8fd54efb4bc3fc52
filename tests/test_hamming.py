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
