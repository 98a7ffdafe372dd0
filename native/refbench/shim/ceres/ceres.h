// Compile-only Ceres shim for the reference benchmark build.
// Ceres is used ONLY by the dynamic initializer's global SfM BA
// (initial_sfm.cpp:243-294). EuRoC sequences start stationary, so the
// flexible initializer succeeds via the STATIC path and the Ceres solve is
// never reached at benchmark time. This stub satisfies the compiler; Solve()
// reports failure so that, were dynamic init ever attempted, initialStructure
// would simply return false (same behavior as an unconverged BA).
#pragma once
#include <limits>

namespace ceres {

enum TerminationType { CONVERGENCE, NO_CONVERGENCE, FAILURE };
enum LinearSolverType { DENSE_SCHUR, SPARSE_SCHUR, DENSE_QR };

class CostFunction {
 public:
  virtual ~CostFunction() {}
};

template <typename Functor, int kNumResiduals, int... Ns>
class AutoDiffCostFunction : public CostFunction {
 public:
  explicit AutoDiffCostFunction(Functor* f) : f_(f) {}
  ~AutoDiffCostFunction() override { delete f_; }

 private:
  Functor* f_;
};

class LocalParameterization {
 public:
  virtual ~LocalParameterization() {}
};

class QuaternionParameterization : public LocalParameterization {};

class Problem {
 public:
  void AddParameterBlock(double*, int) {}
  void AddParameterBlock(double*, int, LocalParameterization*) {}
  void SetParameterBlockConstant(double*) {}
  template <typename... Blocks>
  void AddResidualBlock(CostFunction* cost, void* loss, Blocks... blocks) {
    delete cost;
    (void)loss;
  }
};

class Solver {
 public:
  struct Options {
    LinearSolverType linear_solver_type = DENSE_SCHUR;
    bool minimizer_progress_to_stdout = false;
    double max_solver_time_in_seconds = 0.0;
  };
  struct Summary {
    TerminationType termination_type = FAILURE;
    double final_cost = std::numeric_limits<double>::max();
    const char* BriefReport() const { return "refbench ceres stub: no solve"; }
  };
};

inline void Solve(const Solver::Options&, Problem*, Solver::Summary* summary) {
  summary->termination_type = FAILURE;
  summary->final_cost = std::numeric_limits<double>::max();
}

}  // namespace ceres
