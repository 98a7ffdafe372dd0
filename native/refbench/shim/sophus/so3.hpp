// Minimal Sophus shim for building the reference benchmark binary.
// The reference (/root/reference) only uses Sophus::SO3d::exp(v).matrix()
// and Sophus::SE3d::exp(x).matrix() (se3_ops.hpp:94,119; orcvio.cpp:919,
// 2083, 4331, 4497, 4542). This header provides exactly that, implemented
// from the standard closed-form Rodrigues / SE(3) exponential formulas.
#pragma once
#include <Eigen/Dense>
#include <cmath>

namespace Sophus {

class SO3d {
 public:
  explicit SO3d(const Eigen::Matrix3d& R) : R_(R) {}
  static Eigen::Matrix3d hat(const Eigen::Vector3d& w) {
    Eigen::Matrix3d W;
    W << 0, -w.z(), w.y(), w.z(), 0, -w.x(), -w.y(), w.x(), 0;
    return W;
  }
  static SO3d exp(const Eigen::Vector3d& w) {
    const double theta = w.norm();
    const Eigen::Matrix3d W = hat(w);
    Eigen::Matrix3d R;
    if (theta < 1e-10) {
      R = Eigen::Matrix3d::Identity() + W + 0.5 * W * W;
    } else {
      R = Eigen::Matrix3d::Identity() + (std::sin(theta) / theta) * W +
          ((1.0 - std::cos(theta)) / (theta * theta)) * W * W;
    }
    return SO3d(R);
  }
  const Eigen::Matrix3d& matrix() const { return R_; }

 private:
  Eigen::Matrix3d R_;
};

}  // namespace Sophus
