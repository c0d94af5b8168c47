// Minimal boost::timer stub (wall-clock, not CPU clock like the deprecated
// boost V1 timer; the reference front end is single-threaded so wall == CPU
// for the stages we measure). Used by the TIMER_* macros in
// /root/reference/src/util/slam_util.h:63-65 when built with
// -DSLAM_TIME_DEBUG.
#ifndef REF_HARNESS_BOOST_TIMER_HPP
#define REF_HARNESS_BOOST_TIMER_HPP

#include <chrono>

namespace boost {

class timer {
 public:
  timer() : start_(clock::now()) {}
  void restart() { start_ = clock::now(); }
  double elapsed() const {
    return std::chrono::duration<double>(clock::now() - start_).count();
  }

 private:
  using clock = std::chrono::steady_clock;
  clock::time_point start_;
};

}  // namespace boost

#endif  // REF_HARNESS_BOOST_TIMER_HPP
