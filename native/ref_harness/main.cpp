// Headless measurement harness for the reference RoboRTS-Edu-SLAM core.
//
// Compiles the reference's SlamProcessor + matchers + pose graph
// (/root/reference/src/slam, scan_match, map, pose_graph, util) without ROS
// or Ceres (stub headers under stubs/, drop-in solver in solver_impl.h), and
// replays a simulated scan log through the exact front-end/back-end pipeline
// the node runs (roborts_slam_node.cpp:89-137, 290-311). Outputs:
//   - per-scan wall time + kept/rejected, as "HARNESS scan ..." stdout lines
//   - per-stage timings via the reference's own TIMER macros (-DSLAM_TIME_DEBUG)
//   - final (loop-closure-corrected) trajectory CSV for ATE evaluation
//
// Usage: ref_harness <log.refbin> <params.txt> <out_traj.csv> [--realtime N]
//   --realtime N : pace the replay at N x recorded real time (gives the
//                  back-end thread the same time budget as live operation).
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <string>
#include <thread>
#include <vector>

#include "param_config.h"
#include "slam/sensor_data_manager.h"
#include "slam/slam_processor.h"

namespace {

struct RefLog {
  int n_scans = 0;
  int n_beams = 0;
  double angle_min = 0, angle_max = 0, angle_inc = 0;
  double range_min = 0, range_max = 0;
  std::vector<double> times;             // (N)
  std::vector<Eigen::Vector3d> odom;     // (N)
  std::vector<Eigen::Vector3d> gt;       // (N)
  std::vector<std::vector<float>> ranges;  // (N, B)
};

bool LoadRefLog(const std::string& path, RefLog* log) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return false;
  char magic[8];
  in.read(magic, 8);
  if (std::strncmp(magic, "REFLOG1", 7) != 0) return false;
  int32_t n_scans, n_beams;
  in.read(reinterpret_cast<char*>(&n_scans), 4);
  in.read(reinterpret_cast<char*>(&n_beams), 4);
  double hdr[5];
  in.read(reinterpret_cast<char*>(hdr), sizeof(hdr));
  log->n_scans = n_scans;
  log->n_beams = n_beams;
  log->angle_min = hdr[0];
  log->angle_max = hdr[1];
  log->angle_inc = hdr[2];
  log->range_min = hdr[3];
  log->range_max = hdr[4];
  log->times.resize(n_scans);
  log->odom.resize(n_scans);
  log->gt.resize(n_scans);
  log->ranges.assign(n_scans, std::vector<float>(n_beams));
  for (int i = 0; i < n_scans; ++i) {
    double rec[7];
    in.read(reinterpret_cast<char*>(rec), sizeof(rec));
    log->times[i] = rec[0];
    log->odom[i] = Eigen::Vector3d(rec[1], rec[2], rec[3]);
    log->gt[i] = Eigen::Vector3d(rec[4], rec[5], rec[6]);
    in.read(reinterpret_cast<char*>(log->ranges[i].data()), 4 * n_beams);
  }
  return static_cast<bool>(in);
}

// Mirrors SlamNode::BuildRangeDataContainer (roborts_slam_node.cpp:290-311):
// polar->cartesian with the (range_min, range_threshold) gate, sensor origin
// at zero, sensor pose seeded with the last accepted estimate.
std::shared_ptr<roborts_slam::RangeDataContainer2d> BuildContainer(
    const RefLog& log, int i, double range_threshold,
    const Eigen::Vector3d& last_best_pose) {
  auto container = std::make_shared<roborts_slam::RangeDataContainer2d>(
      log.n_beams);
  container->set_sensor_origin(Eigen::Vector2d::Zero());
  double angle = log.angle_min;
  for (int j = 0; j < log.n_beams; ++j) {
    const double dist = log.ranges[i][j];
    if (dist > log.range_min && dist < range_threshold) {
      container->AddDataPoint(
          Eigen::Vector2d(std::cos(angle) * dist, std::sin(angle) * dist));
    }
    angle += log.angle_inc;
  }
  container->set_sensor_pose(last_best_pose);
  return container;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::cerr << "usage: ref_harness <log.refbin> <params.txt> <out.csv>"
                 " [--realtime N] [--final-optimize]" << std::endl;
    return 2;
  }
  const std::string log_path = argv[1];
  const std::string param_path = argv[2];
  const std::string out_path = argv[3];
  double realtime = 0.0;
  bool final_optimize = false;
  for (int a = 4; a < argc; ++a) {
    if (std::string(argv[a]) == "--realtime" && a + 1 < argc) {
      realtime = std::stod(argv[++a]);
    } else if (std::string(argv[a]) == "--final-optimize") {
      final_optimize = true;
    }
  }

  RefLog log;
  if (!LoadRefLog(log_path, &log)) {
    std::cerr << "failed to load " << log_path << std::endl;
    return 1;
  }
  std::cout << "HARNESS loaded scans=" << log.n_scans
            << " beams=" << log.n_beams << std::endl;

  ros::stub::LoadParams(param_path);
  ros::NodeHandle nh;
  auto param = std::make_shared<roborts_slam::ParamConfig>(nh);
  auto sdm = std::make_shared<roborts_slam::SensorDataManager>();

  auto range_finder = std::make_unique<roborts_slam::LaserRangeFinder>(
      log.angle_min, log.angle_max, log.angle_inc, log.range_min,
      log.range_max);
  sdm->SetRangeFinder(std::move(range_finder));
  sdm->GetRangeFinder()->set_range_threshold_scale(
      param->range_threshold_scale());
  const double range_threshold = sdm->GetRangeFinder()->range_threshold();

  // Leaked on purpose: ~SlamProcessor joins a back-end thread whose condvar
  // loop (slam_processor.cpp:396-398) never rechecks back_end_running_, so
  // destruction would hang; we _Exit after writing results instead.
  auto* proc = new roborts_slam::SlamProcessor(param, sdm,
                                               param->map_resolution());

  Eigen::Vector3d last_best = Eigen::Vector3d::Zero();
  std::vector<int> kept_log_index;  // data id -> log scan index
  const auto wall_start = std::chrono::steady_clock::now();
  const double t_start = log.times.empty() ? 0.0 : log.times[0];
  double total_ms = 0.0;

  for (int i = 0; i < log.n_scans; ++i) {
    if (realtime > 0.0) {
      const double target = (log.times[i] - t_start) / realtime;
      const double elapsed =
          std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                        wall_start)
              .count();
      if (target > elapsed) {
        std::this_thread::sleep_for(
            std::chrono::duration<double>(target - elapsed));
      }
    }

    auto container = BuildContainer(log, i, range_threshold, last_best);
    sdm->AddSensorData(container, roborts_slam::OdometryData(log.odom[i]));
    const int id = sdm->current_data_index();

    const auto t0 = std::chrono::steady_clock::now();
    const bool ok = proc->process();
    const double ms =
        std::chrono::duration<double, std::milli>(
            std::chrono::steady_clock::now() - t0)
            .count();
    total_ms += ms;

    const bool kept = (sdm->current_data_index() == id);
    if (kept) {
      if (static_cast<int>(kept_log_index.size()) != id) {
        std::cerr << "HARNESS id mismatch: kept=" << kept_log_index.size()
                  << " id=" << id << std::endl;
      }
      kept_log_index.push_back(i);
    }
    if (ok) last_best = proc->current_sensor_pose();

    std::cout << "HARNESS scan " << i << " id " << id << " kept " << kept
              << " ok " << ok << " ms " << ms << std::endl;
  }

  // Let the back-end thread drain its buffer (it holds back_end_mutex_ while
  // working, so a short poll is enough in practice).
  std::this_thread::sleep_for(std::chrono::seconds(3));
  if (final_optimize) {
    proc->ForceGraphOptimize();
    std::this_thread::sleep_for(std::chrono::seconds(1));
  }

  const auto& st = roborts_slam::harness_solver::stats();
  std::cout << "HARNESS total_front_end_ms " << total_ms << " scans "
            << log.n_scans << " kept " << kept_log_index.size() << std::endl;
  std::cout << "HARNESS solver solves " << st.solves << " iters "
            << st.iterations << " ms " << (st.total_seconds * 1000.0)
            << " last_poses " << st.last_num_poses << " last_constraints "
            << st.last_num_constraints << std::endl;

  std::ofstream out(out_path);
  out << "log_index,data_id,x,y,yaw,gt_x,gt_y,gt_yaw,odom_x,odom_y,odom_yaw\n";
  out.precision(12);
  for (size_t id = 0; id < kept_log_index.size(); ++id) {
    const int li = kept_log_index[id];
    const Eigen::Vector3d p = sdm->GetSensorPose(static_cast<int>(id));
    out << li << "," << id << "," << p(0) << "," << p(1) << "," << p(2) << ","
        << log.gt[li](0) << "," << log.gt[li](1) << "," << log.gt[li](2)
        << "," << log.odom[li](0) << "," << log.odom[li](1) << ","
        << log.odom[li](2) << "\n";
  }
  out.close();
  std::cout << "HARNESS wrote " << out_path << std::endl;
  std::cout.flush();

  std::_Exit(0);
}
