// Single-core CPU baseline of the reference's correlative-match hot loop.
//
// The reference (RoboRTS-Edu-SLAM) publishes no benchmark numbers and its
// timer macros are compiled out (slam_util.h:61-65), so BASELINE.md requires
// *measuring* the serial workload. This program re-implements, from the
// algorithm spec, exactly the per-scan work of the reference front end
// (MultiResolutionCorrelateScanMatcher::ScanMatch,
// correlate_scan_matcher.h:505-614): for each of the three tiers, rotate the
// scan per search angle (the AngleSearchLookUpTable), then for every
// (angle, x, y) candidate sum subsampled map probabilities. Compiled -O2,
// single thread — the reference's execution model.
//
// Output: one line "cpu_scans_per_sec <value>".
//
// Default workload: pseudo-random map content + a synthetic flower scan
// (worst case for score-gated code). With optional argv[3]/argv[4] it
// instead scores REAL content — a raw float32 W*H match map file and a
// scan file (float32: cx, cy in cells, then P pairs of sensor-local point
// coords in meters) — produced by `bench.py --scene <name>` from the
// reference's own benchmark scenes.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

struct Tier {
  double space_size, space_res, angle_off, angle_res;
  int use_points;
};

struct Cand {
  double x, y, angle, score;
  bool operator>(const Cand& o) const { return score > o.score; }
};

int main(int argc, char** argv) {
  // sim-config tier parameters (config/simulatin_param.yaml:51-70)
  Tier tiers[3] = {
      {0.6, 0.05, 0.523, 0.0349, 100},   // coarse
      {0.2, 0.02, 0.175, 0.0349, 100},   // fine
      {0.02, 0.01, 0.0349, 0.00349, 100} // super-fine
  };
  const double map_res = 0.01;           // fine map (all tiers run on it)
  const int W = 2048, H = 2048;          // fine map extent (~20m)
  const int P = (argc > 1) ? atoi(argv[1]) : 1081;  // beams (willow lidar)
  const int iters = (argc > 2) ? atoi(argv[2]) : 20;

  std::vector<float> map_probs((size_t)W * H);
  std::vector<double> px, py;
  double cx = W / 2.0, cy = H / 2.0;
  int P_eff = P;
  if (argc > 4) {
    // real-content mode: raw float32 map + scan files (see header comment)
    FILE* mf = fopen(argv[3], "rb");
    if (!mf || fread(map_probs.data(), 4, map_probs.size(), mf) !=
                   map_probs.size()) {
      fprintf(stderr, "bad map file %s\n", argv[3]);
      return 1;
    }
    fclose(mf);
    FILE* sf = fopen(argv[4], "rb");
    if (!sf) {
      fprintf(stderr, "bad scan file %s\n", argv[4]);
      return 1;
    }
    fseek(sf, 0, SEEK_END);
    long n_f = ftell(sf) / 4;
    fseek(sf, 0, SEEK_SET);
    P_eff = (int)((n_f - 2) / 2);
    std::vector<float> buf(n_f);
    if (fread(buf.data(), 4, n_f, sf) != (size_t)n_f) {
      fprintf(stderr, "bad scan file %s\n", argv[4]);
      return 1;
    }
    fclose(sf);
    cx = buf[0];
    cy = buf[1];
    px.resize(P_eff);
    py.resize(P_eff);
    for (int i = 0; i < P_eff; ++i) {
      px[i] = buf[2 + 2 * i] / map_res;
      py[i] = buf[3 + 2 * i] / map_res;
    }
  } else {
    for (size_t i = 0; i < map_probs.size(); ++i)
      map_probs[i] = (float)((i * 2654435761u & 0xffff) / 65535.0);
    px.resize(P);
    py.resize(P);
    for (int i = 0; i < P; ++i) {
      double ang = -2.35 + 4.7 * i / (P - 1);
      double r = 3.0 + 2.0 * std::sin(5 * ang);
      px[i] = r * std::cos(ang) / map_res;
      py[i] = r * std::sin(ang) / map_res;
    }
  }
  volatile double sink = 0.0;

  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it) {
    for (const Tier& t : tiers) {
      int n_angles = (int)(std::floor(t.angle_off * 2 / t.angle_res) + 1);
      int n_space = (int)(std::lround(t.space_size / t.space_res) + 1);
      int use = t.use_points;
      int step = (P_eff < 2 * use) ? 1 : P_eff / (use - 1);

      // angle lookup table: rotate all points per angle
      std::vector<double> rx((size_t)n_angles * P_eff), ry((size_t)n_angles * P_eff);
      for (int a = 0; a < n_angles; ++a) {
        double ang = -t.angle_off + a * t.angle_res;
        double c = std::cos(ang), s = std::sin(ang);
        for (int i = 0; i < P_eff; ++i) {
          rx[(size_t)a * P_eff + i] = c * px[i] - s * py[i];
          ry[(size_t)a * P_eff + i] = s * px[i] + c * py[i];
        }
      }

      double space_step = t.space_res / map_res;
      double x0 = cx - (t.space_size / map_res) * 0.5;
      double y0 = cy - (t.space_size / map_res) * 0.5;
      // candidate scoring (the reference records every candidate,
      // correlate_scan_matcher.h:568-583)
      std::vector<Cand> cands;
      cands.reserve((size_t)n_angles * n_space * n_space);
      for (int a = 0; a < n_angles; ++a) {
        const double* rxa = &rx[(size_t)a * P_eff];
        const double* rya = &ry[(size_t)a * P_eff];
        double angle = -t.angle_off + a * t.angle_res;
        for (int xi = 0; xi < n_space; ++xi) {
          double x = x0 + xi * space_step;
          for (int yi = 0; yi < n_space; ++yi) {
            double y = y0 + yi * space_step;
            double score = 0.0;
            for (int pi = 0; pi < P_eff; pi += step) {
              int gx = (int)(rxa[pi] + x + 0.5);
              int gy = (int)(rya[pi] + y + 0.5);
              if (gx >= 0 && gx < W && gy >= 0 && gy < H)
                score += map_probs[(size_t)gy * W + gx];
            }
            cands.push_back({x, y, angle, score / use});
          }
        }
      }
      // center penalty (correlate_scan_matcher.h:718-745)
      for (Cand& c : cands) {
        double d2 = ((c.x - cx) * (c.x - cx) + (c.y - cy) * (c.y - cy)) *
                    map_res * map_res;
        double dp = std::max(1.0 - 0.4 * d2 / (t.space_size / 2), 0.5);
        double ap = std::max(1.0 - 0.25 * c.angle * c.angle / 0.349, 0.9);
        c.score *= dp * ap;
      }
      // sort + tie-averaged best (:607-611, :670-710)
      std::sort(cands.begin(), cands.end(), std::greater<Cand>());
      double bs = cands.front().score, sx = 0, sy = 0, tx = 0, ty = 0, sw = 0;
      for (const Cand& c : cands) {
        if (c.score < bs - 1e-2) break;
        sx += c.x * c.score; sy += c.y * c.score;
        tx += std::cos(c.angle) * c.score; ty += std::sin(c.angle) * c.score;
        sw += c.score;
      }
      // positional + angular covariance over top-20 (:887-1019)
      double bound = std::min(bs - 0.1, 0.5), norm = 0, axx = 0, axy = 0,
             ayy = 0;
      int cnt = 0;
      for (const Cand& c : cands) {
        if (c.score <= bound || cnt >= 20) break;
        double dx2 = c.x - sx / sw, dy2 = c.y - sy / sw;
        axx += dx2 * dx2 * c.score; axy += dx2 * dy2 * c.score;
        ayy += dy2 * dy2 * c.score; norm += c.score; cnt++;
      }
      sink += bs + sx + norm + axx + axy + ayy + tx + ty;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  printf("cpu_scans_per_sec %.4f\n", iters / secs);
  printf("ms_per_scan %.3f\n", 1000.0 * secs / iters);
  return 0;
}
