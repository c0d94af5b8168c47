// Drop-in replacement for the reference's CeresSolver used by the headless
// measurement harness. Ceres is not available in this image, so this header
// is force-included (g++ -include) ahead of every TU: it defines the include
// guard of /root/reference/src/pose_graph/ceres_pose_graph_solver.h, so the
// real header (which needs ceres/ceres.h) is skipped, and provides a
// `roborts_slam::CeresSolver` with the same interface and semantics:
//
//  - AddNode:        id -> (x, y, normalized yaw)   (ceres_pose_graph_solver.cpp:63-83)
//  - AddConstraint:  relative pose from EdgeLinkInfo + information =
//                    covariance^{-1}, symmetrized   (:85-141)
//  - Compute:        minimize sum_e r^T Λ r with
//                    r = [R(yaw_a)^T (p_b - p_a) - z_t; norm(yaw_b - yaw_a - z_yaw)]
//                    (the PoseGraph2dErrorTerm of ceres_types.h:87-134),
//                    gauge fixed by holding the first pose constant (:212-216),
//                    <= 50 iterations (:40-45).
//
// The optimizer here is Levenberg-Marquardt over sparse normal equations
// (Eigen SimplicialLDLT) instead of Ceres' trust-region + SPARSE_NORMAL_
// CHOLESKY; both converge to the same stationary point of the identical cost,
// which is what the ATE measurement needs. Solve wall-time is reported
// separately so it is not conflated with Ceres' exact speed.
#ifndef ROBORTS_SLAM_POSE_GRAPH_CERES_POSE_GRAPH_SOLVER_H
#define ROBORTS_SLAM_POSE_GRAPH_CERES_POSE_GRAPH_SOLVER_H

#include <chrono>
#include <cmath>
#include <iostream>
#include <map>
#include <utility>
#include <vector>

#include <Eigen/Dense>
#include <Eigen/Sparse>

#include "pose_graph/pose_graph.h"
#include "slam/sensor_data_manager.h"

namespace roborts_slam {

namespace harness_solver {

inline double NormalizeAngleH(double a) {
  const double two_pi = 2.0 * M_PI;
  return a - two_pi * std::floor((a + M_PI) / two_pi);
}

struct ConstraintH {
  int id_begin;
  int id_end;
  Eigen::Vector3d z;             // (x, y, yaw) measured relative pose
  Eigen::Matrix3d information;   // covariance^{-1}
};

// Accumulated solve statistics, read by the harness main().
struct SolveStats {
  int solves = 0;
  int iterations = 0;
  double total_seconds = 0.0;
  int last_num_poses = 0;
  int last_num_constraints = 0;
};

inline SolveStats& stats() {
  static SolveStats s;
  return s;
}

}  // namespace harness_solver

class CeresSolver : public PoseGraphSolver<roborts_slam::RangeDataContainer2d> {
 public:
  CeresSolver() {}
  ~CeresSolver() override {}

  void Clear() override { corrections_.clear(); }

  void Compute() override {
    auto t0 = std::chrono::steady_clock::now();
    int iters = Optimize();
    auto& st = harness_solver::stats();
    st.solves += 1;
    st.iterations += iters;
    st.total_seconds +=
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();
    st.last_num_poses = static_cast<int>(poses_.size());
    st.last_num_constraints = static_cast<int>(constraints_.size());

    for (const auto& kv : poses_) {
      corrections_.push_back(std::make_pair(
          kv.first, Pose2d(kv.second(0), kv.second(1), kv.second(2))));
    }
  }

  const PoseWithIdVector& GetCorrections() const override {
    return corrections_;
  }

  void AddNode(Vertex<roborts_slam::RangeDataContainer2d>::Ptr vertex_ptr)
      override {
    const Pose2d sensor_pose = vertex_ptr->GetDataContainer()->sensor_pose();
    const int id = vertex_ptr->GetDataContainer()->id();
    if (poses_.find(id) != poses_.end()) {
      std::cerr << "harness solver: duplicate vertex " << id << std::endl;
      return;
    }
    poses_[id] = Eigen::Vector3d(
        sensor_pose[0], sensor_pose[1],
        harness_solver::NormalizeAngleH(sensor_pose[2]));
  }

  void AddConstraint(Edge<roborts_slam::RangeDataContainer2d>::Ptr edge_ptr)
      override {
    harness_solver::ConstraintH c;
    c.id_begin = edge_ptr->GetSource()->GetDataContainer()->id();
    c.id_end = edge_ptr->GetTarget()->GetDataContainer()->id();
    if (poses_.find(c.id_begin) == poses_.end() ||
        poses_.find(c.id_end) == poses_.end()) {
      std::cerr << "harness solver: constraint references unknown pose"
                << std::endl;
      return;
    }
    const Pose2d diff = edge_ptr->GetLinkInfo()->GetPoseDifference();
    c.z = Eigen::Vector3d(diff(0), diff(1), diff(2));
    // Same symmetrization as ceres_pose_graph_solver.cpp:116-139.
    const Eigen::Matrix3d p = edge_ptr->GetLinkInfo()->GetCovariance().inverse();
    Eigen::Matrix3d info;
    info << p(0, 0), p(0, 1), p(0, 2),
            p(0, 1), p(1, 1), p(1, 2),
            p(0, 2), p(1, 2), p(2, 2);
    c.information = info;
    constraints_.push_back(c);
  }

  void GetGraph(
      std::vector<Eigen::Vector2d>& nodes,
      std::vector<std::pair<Eigen::Vector2d, Eigen::Vector2d>>& edges)
      override {
    for (const auto& kv : poses_) {
      nodes.push_back(kv.second.head<2>());
    }
    for (const auto& c : constraints_) {
      edges.emplace_back(poses_[c.id_begin].head<2>(),
                         poses_[c.id_end].head<2>());
    }
  }

 private:
  // Levenberg-Marquardt on the SPA cost; returns the iteration count.
  int Optimize() {
    if (constraints_.empty() || poses_.size() < 2) return 0;

    // Dense index <- pose id (std::map iterates in id order; index 0 is the
    // first pose, which is held constant for gauge like the reference).
    std::map<int, int> index;
    std::vector<int> ids;
    for (const auto& kv : poses_) {
      index[kv.first] = static_cast<int>(ids.size());
      ids.push_back(kv.first);
    }
    const int n = static_cast<int>(ids.size());
    Eigen::VectorXd x(3 * n);
    for (int i = 0; i < n; ++i) x.segment<3>(3 * i) = poses_[ids[i]];

    double lambda = 1e-6;
    double cost = Cost(x, index);
    int iter = 0;
    for (; iter < kMaxIterations; ++iter) {
      Eigen::VectorXd g;
      std::vector<Eigen::Triplet<double>> trips;
      BuildNormalEquations(x, index, &trips, &g);

      bool stepped = false;
      for (int attempt = 0; attempt < 8 && !stepped; ++attempt) {
        std::vector<Eigen::Triplet<double>> damped = trips;
        for (int i = 3; i < 3 * n; ++i) {  // first pose pinned: skip its block
          damped.emplace_back(i, i, lambda * (1.0 + DiagAt(trips, i)));
        }
        // Pin pose 0 (gauge): identity block, zero gradient.
        for (int i = 0; i < 3; ++i) damped.emplace_back(i, i, 1.0);
        Eigen::VectorXd g_pinned = g;
        g_pinned.head<3>().setZero();

        Eigen::SparseMatrix<double> H(3 * n, 3 * n);
        H.setFromTriplets(damped.begin(), damped.end());
        Eigen::SimplicialLDLT<Eigen::SparseMatrix<double>> ldlt(H);
        if (ldlt.info() != Eigen::Success) {
          lambda *= 10.0;
          continue;
        }
        Eigen::VectorXd dx = ldlt.solve(-g_pinned);
        Eigen::VectorXd x_new = x + dx;
        for (int i = 0; i < n; ++i) {
          x_new(3 * i + 2) = harness_solver::NormalizeAngleH(x_new(3 * i + 2));
        }
        const double new_cost = Cost(x_new, index);
        if (new_cost < cost) {
          x = x_new;
          const double decrease = cost - new_cost;
          cost = new_cost;
          lambda = std::max(1e-12, lambda * 0.3);
          stepped = true;
          if (dx.lpNorm<Eigen::Infinity>() < 1e-10 ||
              decrease < 1e-12 * (1.0 + cost)) {
            iter++;
            goto done;
          }
        } else {
          lambda *= 10.0;
        }
      }
      if (!stepped) break;
    }
  done:
    for (int i = 0; i < n; ++i) poses_[ids[i]] = x.segment<3>(3 * i);
    return iter;
  }

  static double DiagAt(const std::vector<Eigen::Triplet<double>>& trips,
                       int i) {
    // Only used for LM scaling; O(nnz) per call would be slow, so we return 0
    // and rely on the additive lambda (classic Levenberg damping).
    (void)trips;
    (void)i;
    return 0.0;
  }

  double Cost(const Eigen::VectorXd& x, const std::map<int, int>& index) const {
    double cost = 0.0;
    for (const auto& c : constraints_) {
      const Eigen::Vector3d r = Residual(x, index, c);
      cost += r.dot(c.information * r);
    }
    return 0.5 * cost;
  }

  static Eigen::Vector3d Residual(const Eigen::VectorXd& x,
                                  const std::map<int, int>& index,
                                  const harness_solver::ConstraintH& c) {
    const int ia = 3 * index.at(c.id_begin);
    const int ib = 3 * index.at(c.id_end);
    const double ca = std::cos(x(ia + 2));
    const double sa = std::sin(x(ia + 2));
    const double dx = x(ib) - x(ia);
    const double dy = x(ib + 1) - x(ia + 1);
    Eigen::Vector3d r;
    r(0) = ca * dx + sa * dy - c.z(0);
    r(1) = -sa * dx + ca * dy - c.z(1);
    r(2) = harness_solver::NormalizeAngleH(x(ib + 2) - x(ia + 2) - c.z(2));
    return r;
  }

  void BuildNormalEquations(const Eigen::VectorXd& x,
                            const std::map<int, int>& index,
                            std::vector<Eigen::Triplet<double>>* trips,
                            Eigen::VectorXd* g) const {
    const int dim = static_cast<int>(x.size());
    g->setZero(dim);
    for (const auto& c : constraints_) {
      const int ia = 3 * index.at(c.id_begin);
      const int ib = 3 * index.at(c.id_end);
      const double ca = std::cos(x(ia + 2));
      const double sa = std::sin(x(ia + 2));
      const double dx = x(ib) - x(ia);
      const double dy = x(ib + 1) - x(ia + 1);

      const Eigen::Vector3d r = Residual(x, index, c);

      // Jacobians of the PoseGraph2dErrorTerm residual.
      Eigen::Matrix3d Ja = Eigen::Matrix3d::Zero();
      Ja(0, 0) = -ca; Ja(0, 1) = -sa; Ja(0, 2) = -sa * dx + ca * dy;
      Ja(1, 0) = sa;  Ja(1, 1) = -ca; Ja(1, 2) = -ca * dx - sa * dy;
      Ja(2, 2) = -1.0;
      Eigen::Matrix3d Jb = Eigen::Matrix3d::Zero();
      Jb(0, 0) = ca;  Jb(0, 1) = sa;
      Jb(1, 0) = -sa; Jb(1, 1) = ca;
      Jb(2, 2) = 1.0;

      const Eigen::Matrix3d JaT_L = Ja.transpose() * c.information;
      const Eigen::Matrix3d JbT_L = Jb.transpose() * c.information;
      const Eigen::Matrix3d Haa = JaT_L * Ja;
      const Eigen::Matrix3d Hab = JaT_L * Jb;
      const Eigen::Matrix3d Hbb = JbT_L * Jb;
      for (int i = 0; i < 3; ++i) {
        for (int j = 0; j < 3; ++j) {
          trips->emplace_back(ia + i, ia + j, Haa(i, j));
          trips->emplace_back(ia + i, ib + j, Hab(i, j));
          trips->emplace_back(ib + i, ia + j, Hab(j, i));
          trips->emplace_back(ib + i, ib + j, Hbb(i, j));
        }
      }
      g->segment<3>(ia) += JaT_L * r;
      g->segment<3>(ib) += JbT_L * r;
    }
  }

  static constexpr int kMaxIterations = 50;  // ceres_pose_graph_solver.cpp:41

  PoseWithIdVector corrections_;
  std::map<int, Eigen::Vector3d> poses_;
  std::vector<harness_solver::ConstraintH> constraints_;
};

}  // namespace roborts_slam

#endif  // ROBORTS_SLAM_POSE_GRAPH_CERES_POSE_GRAPH_SOLVER_H
