"""5-smooth ("Hamming number") FFT-size rounding.

FFT lengths whose prime factors are all in {2, 3, 5} run fastest on both FFTW
and XLA's TPU FFT, so correlation FFT sizes are rounded up to the next
5-smooth number.

Parity: reference `src/process/meta/HammingNumber.{h,cpp}` implements the same
rounding via a lazy Hamming-sequence iterator (`next_hamming`,
`HammingNumber.cpp:38-48`), with golden values 104→108, 3322→3375, 19043→19200
(`test/unit/process/meta/TestHammingNumber.cpp:13-18`). This implementation
instead searches the 3-exponent lattice directly, which is simpler and O(log³ n).
"""

from __future__ import annotations


def is_hamming(value: int) -> bool:
    """True if ``value`` has no prime factor other than 2, 3, 5."""
    if value < 1:
        return False
    for p in (2, 3, 5):
        while value % p == 0:
            value //= p
    return value == 1


def next_hamming(value: int) -> int:
    """Smallest 5-smooth number strictly greater than ``value``.

    Matches the reference semantics: ``next_hamming(v)`` returns the first
    Hamming number > v (so an already-smooth v is rounded *up* to the next one).
    """
    if value < 1:
        return 1
    best = None
    # Enumerate 2^a * 3^b * 5^c just above `value` over the exponent lattice.
    p5 = 1
    while p5 <= 5 * (value + 1):
        p35 = p5
        while p35 <= 3 * (value + 1):
            # smallest power of two making p35 * 2^a > value
            candidate = p35
            while candidate <= value:
                candidate *= 2
            if best is None or candidate < best:
                best = candidate
            p35 *= 3
        p5 *= 5
    return best


def round_fft_size(value: int, round_hamming: bool = True) -> int:
    """Round an FFT size up to a 5-smooth length if requested."""
    return next_hamming(value) if round_hamming else value


_FFT_TABLE = None  # lazy: (sorted sizes, {size: ms}, fast threshold)


def _fft_table():
    """Measured per-size FFT runtimes (tools/fft_size_survey.py), or None."""
    global _FFT_TABLE
    if _FFT_TABLE is None:
        import json
        import os

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fft_table_v5e.json")
        try:
            with open(path) as f:
                doc = json.load(f)
            ms = {int(k): float(v) for k, v in doc["sizes_ms"].items()}
            _FFT_TABLE = (sorted(ms), ms, float(doc["fast_threshold_ms"]))
        except (OSError, KeyError, ValueError):
            _FFT_TABLE = ()
    return _FFT_TABLE or None


def next_tpu_fft_size(value: int) -> int:
    """Smallest TPU-compiler-and-performance-safe FFT length >= ``value``.

    INCLUSIVE, unlike the reference's ``next_hamming``: an FFT length
    that is already TPU-fast is kept. The strictly-greater semantics
    bumped an already-good size to the next lattice point — e.g. the
    r4 scaling calibration's P=8 proxy got 10368 (2^7*3^4) instead of
    its own nfft 10240 (2^11*5). A direct on-chip pair measurement
    (tools/probe_fft_pair.py, r5) found both sizes equally fast at that
    batch shape, so the bump was benign THERE — but paying extra padding
    to reach a structurally weaker factorisation is the wrong default,
    and in the cliffy >100k regime (768000 vs 1536000) it is 10x wrong.

    Empirically (probed on v5e via the XLA TPU compiler and timed on chip):
      - large FFTs need a sufficient power-of-2 factor to COMPILE: 2·3⁵·5⁵
        and 2²·5⁸ crash the compiler while 2⁵·3⁴·5⁴ and 2¹²·3·5³ compile;
      - FFT RUNTIME falls off a cliff without a large power-of-2 factor:
        batched 10000-point (2⁴·5⁴) runs ~10× slower than 10240-point
        (2¹¹·5); a 1.5M-point (2⁵·3·5⁶) FFT takes ~196 ms where the
        1536000-point (2¹²·3·5³) runs in ~1 ms;
      - and NO static factor rule is sufficient: 768000 = 2¹¹·3·5³ (5-smooth,
        %128) measures 4.7 ms while 1536000 — twice the work — runs 0.44 ms.

    Policy: 5-smooth and divisible by 128 once the length exceeds 1024
    (below that, any 5-smooth size is fine and padding overhead matters
    more than factor shape). Above 100k — the cliffy regime — a measured
    fast-size table (`fft_table_v5e.json`, generated on-chip by
    tools/fft_size_survey.py) overrides the heuristic: the smallest
    measured-fast size within 1.35× of the request wins; the heuristic
    choice stands when the table shows it fast, doesn't cover the range,
    or offers no ≥1.65× improvement (program-cache stability: a marginal
    table win must not invalidate compiled geometries).
    """
    v = value - 1  # inclusive: next_hamming is strictly-greater
    while True:
        v = next_hamming(v)
        if v <= 1024 or v % 128 == 0:
            break
    if value < 100_000:
        return v
    table = _fft_table()
    if table is None:
        return v
    sizes, ms, fast = table
    base_ms = ms.get(v)
    if base_ms is None:
        # The heuristic pick is unmeasured: no evidence it is slow, so the
        # cache-stability policy ("table only wins at >=1.65x measured
        # improvement") keeps it. Overriding on faith would move compiled
        # program geometry without measurement.
        return v
    limit = int(value * 1.35)
    cands = [m for m in sizes if value <= m <= limit]
    if not cands:
        return v
    best = min(cands, key=lambda m: (ms[m], m))
    # Override only on a decisive (>=1.65x) MEASURED win — whether or not
    # the base clears the absolute fast threshold. r5 example: 192000
    # measures 0.34 ms (under the 0.8 threshold, but 6x slower than
    # 196608 = 2^16*3); the clutter stage runs ~6 such transforms per
    # CPI, so "fast enough in absolute terms" still cost ~1.7 ms/CPI in
    # the P=8 scaling proxy.
    if ms[best] > 0.6 * base_ms:
        return v
    return best
