"""Reference-channel spectrum monitor.

Parity with reference `src/process/spectrum/SpectrumAnalyser.{h,cpp}`:
decimation = n // bandwidth, n_spectrum = n // decimation, nfft =
n_spectrum · decimation (`SpectrumAnalyser.cpp:16-19`); FFT + fftshift-style
index permutation (k + nfft//2 + 1) mod nfft + stride-decimation
(`SpectrumAnalyser.cpp:41-55`).

Intentional divergences:
  - the center frequency is plumbed from config instead of the hardcoded
    204.64 MHz (`SpectrumAnalyser.cpp:66`; flagged in SURVEY §2.1);
  - the reference's frequency-axis loop runs a signed range on an unsigned
    counter (`for (i = -nSpectrum/2; i < nSpectrum/2; ...)` with uint32 i,
    `SpectrumAnalyser.cpp:62`), which never executes — we emit the intended
    n_spectrum-point axis;
  - the decimated bins are computed by polyphase folding + one small FFT
    instead of a full-CPI FFT: selecting every `decimation`-th bin (offset r)
    of an nfft-point FFT equals an n_spectrum-point FFT of the twiddle-folded
    sequence, turning a multi-megapoint FFT into a reduction plus a tiny FFT.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class SpectrumAnalyser:
    def __init__(
        self,
        n_samples: int,
        bandwidth: float = 2000.0,
        fc: float = 204_640_000.0,
        dtype=jnp.complex64,
        n_spectrum: int | None = None,
        offset_even: bool | None = None,
    ):
        """Default geometry is the reference's: decimation = n/bandwidth,
        n_spectrum = n//decimation. ``n_spectrum`` overrides the bin count
        directly (sub-CPI analysers pin it to the full-CPI analyser's so
        every spectrum row shares one frequency axis), with decimation =
        n//n_spectrum; ``offset_even`` then coerces the decimation's
        parity (down by one) so the half-bin frequency offset — which the
        axis formula keys on decimation parity — matches the full-CPI
        analyser's too."""
        self.n_samples = int(n_samples)
        self.bandwidth = float(bandwidth)
        self.fc = float(fc)
        self.dtype = dtype

        if n_spectrum is None:
            self.decimation = int(self.n_samples / self.bandwidth)
            self.n_spectrum = self.n_samples // self.decimation
        else:
            self.n_spectrum = int(n_spectrum)
            self.decimation = self.n_samples // self.n_spectrum
            if offset_even is not None and \
                    (self.decimation % 2 == 0) != offset_even:
                self.decimation -= 1
            if self.decimation < 1:
                raise ValueError(
                    f"n_samples={self.n_samples} too short for "
                    f"{self.n_spectrum} spectrum bins")
        self.nfft = self.n_spectrum * self.decimation

        ns, dec, nfft = self.n_spectrum, self.decimation, self.nfft

        # Output bin k of the reference is F[(k*dec + nfft//2 + 1) mod nfft].
        # Decompose each selected index as q*dec + r.
        sel = (np.arange(ns, dtype=np.int64) * dec + nfft // 2 + 1) % nfft
        r_off = sel % dec
        assert np.all(r_off == r_off[0]), "stride offset must be uniform"
        self._r = int(r_off[0])
        # After folding with offset r, bin k of the small FFT is F[k*dec + r];
        # selected output k corresponds to small-FFT bin q = sel // dec.
        self._perm = (sel // dec).astype(np.int32)

        # Twiddle for the fold: w[j] = exp(-2πi j r / nfft), j over nfft,
        # reshaped (dec, ns) to fold chunks of length ns.
        tw = np.exp(-2j * np.pi * self._r * np.arange(nfft, dtype=np.float64) / nfft)
        self._twiddle = tw.reshape(dec, ns).astype(np.dtype(dtype))

        # Frequency axis in kHz (intended reference semantics,
        # `SpectrumAnalyser.cpp:58-68`).
        offset = self.bandwidth / 2.0 if dec % 2 == 0 else 0.0
        idx = np.arange(-(ns // 2), ns - ns // 2, dtype=np.float64)
        self.frequency_khz = ((idx * self.bandwidth) + offset + self.fc) / 1000.0

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Complex decimated spectrum, shape (n_spectrum,)."""
        x = x[: self.nfft].astype(self.dtype)
        folded = jnp.sum(
            x.reshape(self.decimation, self.n_spectrum) * self._twiddle, axis=0
        )
        return self.finish(folded)

    def twiddle_padded(self, pad_to: int) -> np.ndarray:
        """Flat fold twiddle zero-extended to ``pad_to`` samples. The zero
        extension doubles as the k < nfft mask: contributions from samples
        at global index ≥ nfft vanish."""
        tw = self._twiddle.reshape(-1)
        out = np.zeros(pad_to, dtype=tw.dtype)
        out[: tw.shape[0]] = np.asarray(tw)
        return out

    def fold_partial(self, x_loc: jnp.ndarray, offset,
                     tw_pad: jnp.ndarray, bucket_origin=0) -> jnp.ndarray:
        """Local contribution to the folded (n_spectrum,) vector from a
        contiguous block at global sample ``offset``.

        This is the sharded form of the fold in ``__call__``: each rank
        folds its own pulse-sharded time block, and the (n_spectrum,)
        partials psum over the pulse axis — moving n_spectrum·8 bytes per
        rank instead of the block itself. (Computing the spectrum outside
        the shard_map let GSPMD all-gather the full nfft-sample CPI per
        rank — 6 MB/CPI at the default config, 2.7× the sharded input
        bytes; caught by `parallel/commstats` HLO auditing, r3.)

        ``bucket_origin``: global sample index of fold bucket 0 — 0 for
        the full-CPI spectrum; a segment's start for sub-CPI spectra
        (whose twiddle rows are zero outside their segment, so the zero
        extension doubles as the segment mask).
        """
        ns = self.n_spectrum
        L = x_loc.shape[-1]
        tw_loc = jax.lax.dynamic_slice(tw_pad, (offset,), (L,))
        prod = x_loc.astype(self.dtype) * tw_loc
        pad = (-L) % ns
        if pad:
            prod = jnp.pad(prod, (0, pad))
        local = jnp.sum(prod.reshape(-1, ns), axis=0)
        # Bucket j of the fold is (offset − bucket_origin + i) mod ns for
        # local i: rotate the local sums to bucket alignment.
        return jnp.roll(local, (offset - bucket_origin) % ns)

    def finish(self, folded: jnp.ndarray) -> jnp.ndarray:
        """Small n_spectrum-point FFT + reference bin permutation."""
        f = jnp.fft.fft(folded)
        return jnp.take(f, self._perm)

    @staticmethod
    def to_db(spectrum: jnp.ndarray) -> jnp.ndarray:
        return 10.0 * jnp.log10(jnp.abs(spectrum))
