// Batched Leaver continued-fraction evaluation for Kerr QNMs.
//
// Native hot loop of the offline spectrum-table builder: the backward
// recursion over the CF tail is inherently sequential in the term index,
// so it is implemented here in C++ (the Python/NumPy fallback in
// radial.py/_cf_vec_a is ~100x slower).  Exposed to Python via ctypes
// (see cf_native.py).
//
// Semantics mirror qnmfits_tpu.spectrum.solver._cf_vec_a exactly:
//   * Leaver (1985) Kerr radial three-term recurrence, 2M=1 units.
//   * n_inv-times inverted CF (overtone selection).
//   * Tail started at depth N from the Nollert-style expansion
//     r_N = 1 + u/sqrt(N) + v/N, u = -sqrt(-2 i b omega), Re(u) <= 0.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcf_kernel.so cf_kernel.cpp

#include <complex>
#include <cmath>

// CF recursions suffer catastrophic cancellation for deep overtones near
// extremal spin; evaluate in 80-bit long double to keep the noise floor
// ~3 digits below double.
using real_t = long double;
using cplx = std::complex<real_t>;

namespace {

struct Coeffs {
  cplx c0, c1, c2, c3, c4;
};

inline Coeffs leaver_coeffs(int s, int m, real_t a, cplx omega, cplx A) {
  const real_t b = std::sqrt((real_t)1.0 - (real_t)4.0 * a * a);
  const cplx I((real_t)0.0, (real_t)1.0);
  const cplx phi = omega / (real_t)2.0 - a * (real_t)m;
  Coeffs c;
  c.c0 = (real_t)(1.0 - s) - I * omega - ((real_t)2.0 * I / b) * phi;
  c.c1 = (real_t)-4.0 + (real_t)2.0 * I * omega * ((real_t)2.0 + b) + ((real_t)4.0 * I / b) * phi;
  c.c2 = (real_t)(s + 3.0) - (real_t)3.0 * I * omega - ((real_t)2.0 * I / b) * phi;
  c.c3 = omega * omega * ((real_t)4.0 + (real_t)2.0 * b - a * a) -
         (real_t)2.0 * a * (real_t)m * omega - (real_t)(s + 1.0) +
         ((real_t)2.0 + b) * I * omega - A +
         (((real_t)4.0 * omega + (real_t)2.0 * I) / b) * phi;
  c.c4 = (real_t)(s + 1.0) - (real_t)2.0 * omega * omega -
         (real_t)(2.0 * s + 3.0) * I * omega -
         (((real_t)4.0 * omega + (real_t)2.0 * I) / b) * phi;
  return c;
}

inline void abg(real_t n, const Coeffs& c, cplx& alpha, cplx& beta,
                cplx& gamma) {
  alpha = n * n + (c.c0 + (real_t)1.0) * n + c.c0;
  beta = (real_t)-2.0 * n * n + (c.c1 + (real_t)2.0) * n + c.c3;
  gamma = n * n + (c.c2 - (real_t)3.0) * n + c.c4 - c.c2 + (real_t)2.0;
}

inline cplx cf_one(int s, int m, real_t a, cplx omega, cplx A, int n_inv,
                   int N) {
  const Coeffs c = leaver_coeffs(s, m, a, omega, A);
  const real_t b = std::sqrt((real_t)1.0 - (real_t)4.0 * a * a);
  const cplx I((real_t)0.0, (real_t)1.0);

  // Upward (finite) part.
  cplx U((real_t)0.0, (real_t)0.0), alpha_prev((real_t)0.0, (real_t)0.0);
  for (int k = 0; k <= n_inv; ++k) {
    cplx al, be, ga;
    abg((real_t)k, c, al, be, ga);
    U = (k == 0) ? be : be - alpha_prev * ga / U;
    alpha_prev = al;
  }

  // Nollert-style tail init.
  cplx u = -std::sqrt((real_t)-2.0 * I * b * omega);
  if (u.real() > (real_t)0.0) u = -u;
  const cplx A1 = c.c0 + (real_t)1.0;
  const cplx G1 = c.c2 - (real_t)3.0;
  const cplx v = (u * u + (real_t)0.5 + G1 - A1) / (real_t)2.0;

  cplx alN, beN, gaN;
  abg((real_t)N, c, alN, beN, gaN);
  cplx T = -alN * ((real_t)1.0 + u / std::sqrt((real_t)N) + v / (real_t)N);

  // Backward recursion: T_k = alpha_k gamma_{k+1} / (beta_{k+1} - T_{k+1}).
  cplx al_k1, be_k1, ga_k1;
  abg((real_t)N, c, al_k1, be_k1, ga_k1);
  for (int k = N - 1; k >= n_inv; --k) {
    cplx al_k, be_k, ga_k;
    abg((real_t)k, c, al_k, be_k, ga_k);
    // need gamma_{k+1}, beta_{k+1} (from previous iteration's k-level).
    T = al_k * ga_k1 / (be_k1 - T);
    be_k1 = be_k;
    ga_k1 = ga_k;
  }
  return U - T;
}

}  // namespace

extern "C" {

// Batched CF evaluation.  All arrays length B; a, n_inv per element.
void radial_cf_batch(int B, const double* omega_re, const double* omega_im,
                     const double* a, const double* A_re, const double* A_im,
                     int s, int m, const int* n_inv, int N, double* out_re,
                     double* out_im) {
  for (int i = 0; i < B; ++i) {
    const cplx w((real_t)omega_re[i], (real_t)omega_im[i]);
    const cplx A((real_t)A_re[i], (real_t)A_im[i]);
    const cplx r = cf_one(s, m, (real_t)a[i], w, A, n_inv[i], N);
    out_re[i] = (double)r.real();
    out_im[i] = (double)r.imag();
  }
}

}  // extern "C"
