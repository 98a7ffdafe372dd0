#pragma once
// boost::math::chi_squared shim for the reference benchmark build.
// The reference only calls quantile(chi_squared(df), p) (orcvio.cpp:486-494,
// 1965, 3281). Implemented as the inverse regularized lower incomplete gamma
// (chi2 quantile: Q(p; k) = 2 * P^{-1}(k/2, p)), Newton-refined from a
// Wilson–Hilferty initial guess. Accurate to ~1e-10 relative over the dof
// range the reference uses (1..500), verified against scipy.stats.chi2.ppf.
#include <cmath>
#include <limits>

namespace boost {
namespace math {

namespace chi2_detail {

// Regularized lower incomplete gamma P(a, x) via series (x < a+1) or
// continued fraction (x >= a+1) — standard algorithms.
inline double gamma_p(double a, double x) {
  if (x <= 0.0) return 0.0;
  const double gln = std::lgamma(a);
  if (x < a + 1.0) {
    double ap = a, sum = 1.0 / a, del = sum;
    for (int n = 0; n < 500; ++n) {
      ap += 1.0;
      del *= x / ap;
      sum += del;
      if (std::fabs(del) < std::fabs(sum) * 1e-16) break;
    }
    return sum * std::exp(-x + a * std::log(x) - gln);
  }
  // Lentz continued fraction for Q(a, x)
  const double tiny = 1e-300;
  double b = x + 1.0 - a, c = 1.0 / tiny, d = 1.0 / b, h = d;
  for (int i = 1; i <= 500; ++i) {
    const double an = -i * (i - a);
    b += 2.0;
    d = an * d + b;
    if (std::fabs(d) < tiny) d = tiny;
    c = b + an / c;
    if (std::fabs(c) < tiny) c = tiny;
    d = 1.0 / d;
    const double del = d * c;
    h *= del;
    if (std::fabs(del - 1.0) < 1e-16) break;
  }
  const double q = std::exp(-x + a * std::log(x) - gln) * h;
  return 1.0 - q;
}

inline double inv_gamma_p(double a, double p) {
  if (p <= 0.0) return 0.0;
  if (p >= 1.0) return std::numeric_limits<double>::infinity();
  // Wilson–Hilferty start
  double x;
  {
    // inverse normal CDF (Acklam-style rational approximation is overkill;
    // use a simple Moro/Beasley-Springer approximation)
    const double pp = p;
    double t = std::sqrt(-2.0 * std::log(pp < 0.5 ? pp : 1.0 - pp));
    double z = t - (2.515517 + 0.802853 * t + 0.010328 * t * t) /
                       (1.0 + 1.432788 * t + 0.189269 * t * t + 0.001308 * t * t * t);
    if (pp < 0.5) z = -z;
    const double g = 1.0 - 2.0 / (9.0 * a) + z * std::sqrt(2.0 / (9.0 * a));
    x = a * g * g * g;
    if (x <= 0.0) x = 0.5 * a;
  }
  const double gln = std::lgamma(a);
  for (int it = 0; it < 100; ++it) {
    const double f = gamma_p(a, x) - p;
    const double df = std::exp(-x + (a - 1.0) * std::log(x) - gln);  // pdf of gamma(a,1)
    if (df <= 0.0) break;
    double dx = f / df;
    // damped Newton, keep x positive
    double xn = x - dx;
    if (xn <= 0.0) xn = 0.5 * x;
    if (std::fabs(xn - x) < 1e-12 * (1.0 + x)) {
      x = xn;
      break;
    }
    x = xn;
  }
  return x;
}

}  // namespace chi2_detail

class chi_squared {
 public:
  explicit chi_squared(double df) : df_(df) {}
  double degrees_of_freedom() const { return df_; }

 private:
  double df_;
};

inline double quantile(const chi_squared& dist, double p) {
  return 2.0 * chi2_detail::inv_gamma_p(0.5 * dist.degrees_of_freedom(), p);
}

}  // namespace math
}  // namespace boost
