"""CPI overlap (process.data.overlap): sliding-window extraction.

The reference parses this key but never implements it
(`config/config.yml:23`); here overlap f gives CPI windows that advance by
n·(1−f) samples.
"""

import numpy as np
import pytest

from blah2_tpu.config import config_from_dict
from blah2_tpu.runtime.radar import RadarRuntime


def _cfg(overlap):
    return config_from_dict({
        "capture": {"fs": 40_000, "fc": 100_000_000,
                    "type": "Synthetic"},
        "process": {
            "data": {"cpi": 0.1, "buffer": 4, "overlap": overlap},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -50, "dopplerMax": 50},
            "clutter": {"enable": False},
            "detection": {"enable": False},
        },
    })


@pytest.mark.parametrize("overlap,expect_adv_frac", [(0.0, 1.0), (0.5, 0.5),
                                                     (0.75, 0.25)])
def test_extract_windows_slide(overlap, expect_adv_frac):
    rt = RadarRuntime(_cfg(overlap))
    n = rt.n_samples
    assert rt.advance == max(1, int(round(n * expect_adv_frac)))

    # Push a recognisable ramp into both buffers.
    total = 4 * n
    ramp = (np.arange(total) + 1j * 0).astype(np.complex64)
    rt.buffer1.push(ramp)
    rt.buffer2.push(ramp)

    starts = []
    for _ in range(3):
        got = rt._extract_cpi(timeout=0.1)
        assert got is not None
        x, y = got
        assert len(x) == n and len(y) == n
        # window must be a contiguous ramp slice
        np.testing.assert_array_equal(np.real(x),
                                      np.arange(x[0].real, x[0].real + n))
        np.testing.assert_array_equal(np.real(y), np.real(x))
        starts.append(int(x[0].real))

    assert starts == [0, rt.advance, 2 * rt.advance]


def test_overlap_validation():
    with pytest.raises(ValueError, match="overlap"):
        RadarRuntime(_cfg(1.0))
    with pytest.raises(ValueError, match="overlap"):
        RadarRuntime(_cfg(-0.1))


def test_runtime_runs_with_overlap():
    """Full loop: overlap 0.5 doubles the CPI rate from one stream."""
    cfg = _cfg(0.5)
    rt = RadarRuntime(cfg)
    n = rt.n_samples
    # ring capacity is 4n (buffer: 4) — stay within it
    x = (np.random.default_rng(0).standard_normal(4 * n)
         ).astype(np.complex64)
    rt.buffer1.push(x)
    rt.buffer2.push(x)
    # 4n samples → 1 full window + 6 advances of n/2 = 7 CPIs available;
    # ask for 4 to keep it quick.
    rt.run(n_cpis=4, quiet=True)
    assert rt.n_cpis_done == 4
    # 4 CPIs consumed n + 3·(n/2) samples
    consumed = n + 3 * rt.advance
    assert len(rt.buffer1) == 4 * n - consumed


def test_overflow_seam_resyncs_tails():
    """If the drop-oldest ring overflows between extractions, the kept tail
    is discontinuous — the runtime must discard it and rebuild a fresh
    window (still a contiguous ramp slice)."""
    rt = RadarRuntime(_cfg(0.5))
    n = rt.n_samples
    cap = rt.buffer1.capacity
    ramp = (np.arange(cap) + 0j).astype(np.complex64)
    rt.buffer1.push(ramp)
    rt.buffer2.push(ramp)

    got = rt._extract_cpi(timeout=0.1)
    assert got is not None and int(got[0][0].real) == 0

    # Overflow: push enough to drop unread samples.
    more = (np.arange(cap, 2 * cap + n) + 0j).astype(np.complex64)
    rt.buffer1.push(more)
    rt.buffer2.push(more)
    assert rt.buffer1.dropped > 0

    got = rt._extract_cpi(timeout=0.1)
    assert got is not None
    x, y = got
    # fresh full window (tail discarded), contiguous, channels aligned
    assert len(x) == n
    np.testing.assert_array_equal(np.real(x),
                                  np.arange(x[0].real, x[0].real + n))
    np.testing.assert_array_equal(np.real(y), np.real(x))


def test_native_ring_dropped_counter():
    from blah2_tpu.native import available, make_ring_buffer

    if not available():
        import pytest as _pytest
        _pytest.skip("native runtime not built")
    rb = make_ring_buffer(100)
    assert getattr(rb, "dropped", None) == 0
    rb.push((np.arange(150) + 0j).astype(np.complex64))
    assert rb.dropped == 50
