// Native scan-log runtime: mmap'd binary log reader + decode worker.
//
// The reference ingests scans through ROS callbacks and converts each
// LaserScan to cartesian points with range gating on the callback thread
// (BuildRangeDataContainer, roborts_slam_node.cpp:290-311). Offline, that
// conversion (trig per beam, gating, padding to the fixed point count) is
// pure CPU work on the engine's critical path; this runtime moves it into
// native code with a prefetching decode thread so the Python engine pops
// ready-made fixed-shape point/mask buffers.
//
// File format "RSLG" v1 (little endian):
//   header: char[4] magic, u32 version, u64 n_scans, u32 n_beams,
//           u8 has_gt, u8 pad[3],
//           f64 angle_min, angle_max, range_min, range_max, range_thresh_scale
//   then per scan, contiguous fixed-stride records:
//           f64 time, f64 odom[3], f64 gt[3] (iff has_gt), f32 ranges[n_beams]
//
// C API (ctypes-friendly); all functions return 0 on success.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

#pragma pack(push, 1)
struct Header {
  char magic[4];
  uint32_t version;
  uint64_t n_scans;
  uint32_t n_beams;
  uint8_t has_gt;
  uint8_t pad[3];
  double angle_min, angle_max, range_min, range_max, range_thresh_scale;
};
#pragma pack(pop)

struct Log {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t bytes = 0;
  Header hdr{};
  size_t record_stride = 0;
  const uint8_t* records = nullptr;

  // decode pipeline
  int max_points = 0;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::atomic<bool> stop{false};
  struct Slot {
    std::vector<float> points;  // (max_points, 2)
    std::vector<uint8_t> mask;  // (max_points,)
    int n_valid = 0;
    double time = 0, odom[3] = {0, 0, 0};
    long index = -1;
    bool ready = false;
  };
  std::vector<Slot> ring;
  size_t head = 0, tail = 0, count = 0;  // ring occupancy
  long next_index = 0;
  std::vector<double> cos_tab, sin_tab;
};

const double* rec_time(const Log* lg, uint64_t i) {
  return reinterpret_cast<const double*>(lg->records + i * lg->record_stride);
}
const double* rec_odom(const Log* lg, uint64_t i) {
  return rec_time(lg, i) + 1;
}
const double* rec_gt(const Log* lg, uint64_t i) {
  return lg->hdr.has_gt ? rec_time(lg, i) + 4 : nullptr;
}
const float* rec_ranges(const Log* lg, uint64_t i) {
  return reinterpret_cast<const float*>(
      lg->records + i * lg->record_stride + sizeof(double) * (4 + (lg->hdr.has_gt ? 3 : 0)));
}

void decode_one(const Log* lg, uint64_t i, float* pts, uint8_t* mask,
                int* n_valid) {
  // polar -> cartesian with the reference's gating
  // (roborts_slam_node.cpp:295-307): keep range_min < r < range_threshold,
  // front-packed into the fixed-shape buffer.
  const Header& h = lg->hdr;
  const float* r = rec_ranges(lg, i);
  const double thresh =
      h.range_min + h.range_thresh_scale * (h.range_max - h.range_min);
  int n = 0;
  const int B = static_cast<int>(h.n_beams);
  const int MP = lg->max_points;
  for (int b = 0; b < B && n < MP; ++b) {
    const double rr = r[b];
    if (rr > h.range_min && rr < thresh && std::isfinite(rr)) {
      pts[2 * n] = static_cast<float>(rr * lg->cos_tab[b]);
      pts[2 * n + 1] = static_cast<float>(rr * lg->sin_tab[b]);
      mask[n] = 1;
      ++n;
    }
  }
  for (int k = n; k < MP; ++k) {
    pts[2 * k] = 0.f;
    pts[2 * k + 1] = 0.f;
    mask[k] = 0;
  }
  *n_valid = n;
}

void worker_main(Log* lg) {
  while (true) {
    std::unique_lock<std::mutex> lk(lg->mu);
    lg->cv_full.wait(lk, [&] {
      return lg->stop.load() || (lg->count < lg->ring.size() &&
                                 lg->next_index <
                                     static_cast<long>(lg->hdr.n_scans));
    });
    if (lg->stop.load()) return;
    if (lg->next_index >= static_cast<long>(lg->hdr.n_scans)) return;
    Log::Slot& slot = lg->ring[lg->head];
    const long idx = lg->next_index++;
    lg->head = (lg->head + 1) % lg->ring.size();
    lg->count++;
    lk.unlock();

    decode_one(lg, idx, slot.points.data(), slot.mask.data(), &slot.n_valid);
    slot.time = *rec_time(lg, idx);
    std::memcpy(slot.odom, rec_odom(lg, idx), 3 * sizeof(double));
    slot.index = idx;

    lk.lock();
    slot.ready = true;
    lg->cv_empty.notify_one();
  }
}

}  // namespace

extern "C" {

void* rslg_open(const char* path, int max_points, int ring_slots) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* lg = new Log();
  lg->fd = fd;
  lg->base = static_cast<const uint8_t*>(base);
  lg->bytes = st.st_size;
  std::memcpy(&lg->hdr, lg->base, sizeof(Header));
  if (std::memcmp(lg->hdr.magic, "RSLG", 4) != 0 || lg->hdr.version != 1) {
    munmap(base, st.st_size);
    ::close(fd);
    delete lg;
    return nullptr;
  }
  lg->record_stride = sizeof(double) * (4 + (lg->hdr.has_gt ? 3 : 0)) +
                      sizeof(float) * lg->hdr.n_beams;
  lg->records = lg->base + sizeof(Header);
  lg->max_points = max_points;
  const int B = static_cast<int>(lg->hdr.n_beams);
  lg->cos_tab.resize(B);
  lg->sin_tab.resize(B);
  for (int b = 0; b < B; ++b) {
    const double a =
        lg->hdr.angle_min +
        (lg->hdr.angle_max - lg->hdr.angle_min) * (B > 1 ? b / double(B - 1) : 0.0);
    lg->cos_tab[b] = std::cos(a);
    lg->sin_tab[b] = std::sin(a);
  }
  if (ring_slots > 0) {
    lg->ring.resize(ring_slots);
    for (auto& s : lg->ring) {
      s.points.resize(2 * max_points);
      s.mask.resize(max_points);
    }
    lg->worker = std::thread(worker_main, lg);
  }
  return lg;
}

int rslg_meta(void* h, uint64_t* n_scans, uint32_t* n_beams, int* has_gt,
              double* laser5) {
  auto* lg = static_cast<Log*>(h);
  *n_scans = lg->hdr.n_scans;
  *n_beams = lg->hdr.n_beams;
  *has_gt = lg->hdr.has_gt;
  laser5[0] = lg->hdr.angle_min;
  laser5[1] = lg->hdr.angle_max;
  laser5[2] = lg->hdr.range_min;
  laser5[3] = lg->hdr.range_max;
  laser5[4] = lg->hdr.range_thresh_scale;
  return 0;
}

// random access (no pipeline): decode scan i into caller buffers
int rslg_decode(void* h, uint64_t i, float* points, uint8_t* mask,
                int* n_valid, double* time, double* odom, double* gt) {
  auto* lg = static_cast<Log*>(h);
  if (i >= lg->hdr.n_scans) return -1;
  decode_one(lg, i, points, mask, n_valid);
  *time = *rec_time(lg, i);
  std::memcpy(odom, rec_odom(lg, i), 3 * sizeof(double));
  if (lg->hdr.has_gt && gt) std::memcpy(gt, rec_gt(lg, i), 3 * sizeof(double));
  return 0;
}

// streaming: pop the next prefetched scan (blocks; returns -1 at EOF)
long rslg_next(void* h, float* points, uint8_t* mask, int* n_valid,
               double* time, double* odom) {
  auto* lg = static_cast<Log*>(h);
  std::unique_lock<std::mutex> lk(lg->mu);
  if (lg->count == 0 &&
      lg->next_index >= static_cast<long>(lg->hdr.n_scans))
    return -1;
  lg->cv_empty.wait(lk, [&] {
    return lg->stop.load() ||
           (lg->count > 0 && lg->ring[lg->tail].ready);
  });
  if (lg->stop.load()) return -1;
  Log::Slot& slot = lg->ring[lg->tail];
  std::memcpy(points, slot.points.data(),
              sizeof(float) * 2 * lg->max_points);
  std::memcpy(mask, slot.mask.data(), lg->max_points);
  *n_valid = slot.n_valid;
  *time = slot.time;
  std::memcpy(odom, slot.odom, 3 * sizeof(double));
  const long idx = slot.index;
  slot.ready = false;
  lg->tail = (lg->tail + 1) % lg->ring.size();
  lg->count--;
  lg->cv_full.notify_one();
  return idx;
}

void rslg_close(void* h) {
  auto* lg = static_cast<Log*>(h);
  if (lg->worker.joinable()) {
    lg->stop.store(true);
    lg->cv_full.notify_all();
    lg->cv_empty.notify_all();
    lg->worker.join();
  }
  munmap(const_cast<uint8_t*>(lg->base), lg->bytes);
  ::close(lg->fd);
  delete lg;
}

}  // extern "C"
