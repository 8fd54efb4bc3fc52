/* Minimal FFTW3-compatible shim for compiling the reference DSP core as a
 * test oracle (the image ships no libfftw3). Correctness-only: arbitrary-n
 * complex DFTs via Bluestein's algorithm over an iterative radix-2 core,
 * matching FFTW's conventions exactly — FFTW_FORWARD = e^{-2pi i/n},
 * FFTW_BACKWARD = e^{+2pi i/n}, both UNNORMALISED, in-place supported,
 * plans capture (n, sign, in, out) and read the buffer at execute time.
 * Validated against numpy.fft in tests/test_oracle.py.
 */
#ifndef ORACLE_FFTW3_SHIM_H
#define ORACLE_FFTW3_SHIM_H

#include <cmath>
#include <complex>
#include <cstring>
#include <vector>

typedef double fftw_complex[2];

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE (0U)

namespace fftw_shim {

typedef std::complex<double> cpx;

inline void fft_pow2(std::vector<cpx> &a, int sign) {
  const size_t n = a.size();
  if (n < 2) return;
  /* bit-reversal permutation */
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = sign * 2.0 * M_PI / (double)len;
    const cpx wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cpx w(1.0, 0.0);
      for (size_t k = 0; k < len / 2; k++) {
        cpx u = a[i + k];
        cpx v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}

/* DFT of arbitrary length via Bluestein: X_k = c_k * (a (*) b)[k] with
 * a_j = x_j c_j, c_m = e^{sign i pi m^2 / n}, b_m = conj(c_m); the phase
 * m^2/n is reduced mod 2n in integer arithmetic so large n stays exact. */
inline void dft(const cpx *in, cpx *out, long long n, int sign) {
  if (n <= 0) return;
  if ((n & (n - 1)) == 0) {
    std::vector<cpx> a(in, in + n);
    fft_pow2(a, sign);
    std::memcpy(out, a.data(), (size_t)n * sizeof(cpx));
    return;
  }
  long long m = 1;
  while (m < 2 * n - 1) m <<= 1;
  std::vector<cpx> c((size_t)n);
  for (long long k = 0; k < n; k++) {
    long long q = (k * k) % (2 * n);
    double ang = sign * M_PI * (double)q / (double)n;
    c[(size_t)k] = cpx(std::cos(ang), std::sin(ang));
  }
  std::vector<cpx> a((size_t)m, cpx(0, 0)), b((size_t)m, cpx(0, 0));
  for (long long k = 0; k < n; k++) a[(size_t)k] = in[k] * c[(size_t)k];
  for (long long k = 0; k < n; k++) {
    b[(size_t)k] = std::conj(c[(size_t)k]);
    if (k) b[(size_t)(m - k)] = std::conj(c[(size_t)k]);
  }
  fft_pow2(a, -1);
  fft_pow2(b, -1);
  for (long long k = 0; k < m; k++) a[(size_t)k] *= b[(size_t)k];
  fft_pow2(a, +1);
  const double inv_m = 1.0 / (double)m;
  for (long long k = 0; k < n; k++)
    out[k] = c[(size_t)k] * a[(size_t)k] * inv_m;
}

struct plan {
  int n;
  int sign;
  fftw_complex *in;
  fftw_complex *out;
};

}  // namespace fftw_shim

typedef fftw_shim::plan *fftw_plan;

inline fftw_plan fftw_plan_dft_1d(int n, fftw_complex *in, fftw_complex *out,
                                  int sign, unsigned /*flags*/) {
  return new fftw_shim::plan{n, sign, in, out};
}

inline void fftw_execute(fftw_plan p) {
  const fftw_shim::cpx *src =
      reinterpret_cast<const fftw_shim::cpx *>(p->in);
  fftw_shim::cpx *dst = reinterpret_cast<fftw_shim::cpx *>(p->out);
  if (p->in == p->out) {
    std::vector<fftw_shim::cpx> tmp(src, src + p->n);
    fftw_shim::dft(tmp.data(), dst, p->n, p->sign);
  } else {
    fftw_shim::dft(src, dst, p->n, p->sign);
  }
}

inline void fftw_destroy_plan(fftw_plan p) { delete p; }

inline int fftw_init_threads(void) { return 1; }
inline void fftw_plan_with_nthreads(int) {}
inline void fftw_cleanup_threads(void) {}

#endif /* ORACLE_FFTW3_SHIM_H */
