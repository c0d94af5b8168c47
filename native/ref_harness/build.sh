#!/bin/bash
# Build the headless reference-measurement harness.
#
# The reference sources are compiled UNMODIFIED from /root/reference/src.
# Missing third-party deps are satisfied by:
#   - Eigen:  the full Eigen distro bundled with the tensorflow wheel
#   - ros/glog/boost::timer: stub headers under stubs/
#   - Ceres:  solver_impl.h is force-included; it pre-defines the include
#     guard of ceres_pose_graph_solver.h and provides a drop-in CeresSolver
#     (sparse LM on the identical SPA cost).
# -DSLAM_TIME_DEBUG enables the reference's own per-stage TIMER output
# (src/util/slam_util.h:61-65).
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference/src
EIGEN=$(python -c "import sysconfig,os;p=os.path.join(sysconfig.get_paths()['purelib'],'tensorflow','include');print(p if os.path.isdir(p) else '')")
if [ ! -d "${EIGEN}/Eigen" ]; then
  echo "Eigen not found under ${EIGEN}" >&2
  exit 1
fi

OUT="${HERE}/ref_harness"
g++ -O2 -std=c++14 -pthread \
  -DSLAM_TIME_DEBUG \
  -include "${HERE}/solver_impl.h" \
  -I "${HERE}/stubs" \
  -I "${REF}" \
  -isystem "${EIGEN}" \
  "${HERE}/main.cpp" \
  "${REF}/slam/slam_processor.cpp" \
  "${REF}/pose_graph/range_scan_pose_graph.cpp" \
  -o "${OUT}"
echo "built ${OUT}"
