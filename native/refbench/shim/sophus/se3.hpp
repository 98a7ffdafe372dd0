#pragma once
// See so3.hpp for scope of this shim.
#include "sophus/so3.hpp"

namespace Sophus {

class SE3d {
 public:
  SE3d(const Eigen::Matrix3d& R, const Eigen::Vector3d& t) : T_(Eigen::Matrix4d::Identity()) {
    T_.topLeftCorner<3, 3>() = R;
    T_.topRightCorner<3, 1>() = t;
  }
  // xi = [rho (translation part); phi (rotation part)] — Sophus convention.
  static SE3d exp(const Eigen::Matrix<double, 6, 1>& xi) {
    const Eigen::Vector3d rho = xi.head<3>();
    const Eigen::Vector3d phi = xi.tail<3>();
    const double theta = phi.norm();
    const Eigen::Matrix3d W = SO3d::hat(phi);
    Eigen::Matrix3d V;
    if (theta < 1e-10) {
      V = Eigen::Matrix3d::Identity() + 0.5 * W + W * W / 6.0;
    } else {
      const double t2 = theta * theta;
      V = Eigen::Matrix3d::Identity() + ((1.0 - std::cos(theta)) / t2) * W +
          ((theta - std::sin(theta)) / (t2 * theta)) * W * W;
    }
    return SE3d(SO3d::exp(phi).matrix(), V * rho);
  }
  const Eigen::Matrix4d& matrix() const { return T_; }

 private:
  Eigen::Matrix4d T_;
};

}  // namespace Sophus
