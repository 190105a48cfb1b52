// ASan/UBSan driver for the native projection core (SURVEY.md §5 lists the
// reference as having no sanitizer story; this closes it for our one native
// component). Exercises project_scan with adversarial inputs — non-finite
// coordinates (raw .bin files can carry them), zero/denormal points, huge
// magnitudes, single-point scans, all-quadrant orderings, and a realistic
// random scan — in both spherical and scan-unfolding modes.
//
// Build + run (tests/test_native_sanitize.py):
//   g++ -g -O1 -std=c++17 \
//       -fsanitize=address,undefined,float-cast-overflow \
//       -fno-sanitize-recover=all tools/sanitize_projection.cc \
//       r2dm_tpu/data/native/projection.cc -o /tmp/sanitize_projection
// (float-cast-overflow is NOT in g++'s 'undefined' group — it is the check
// that catches the NaN->int bin cast this harness was written for)
//   /tmp/sanitize_projection
// Exit 0 with no sanitizer report = clean.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <vector>

extern "C" int project_scan(const float* points, int64_t n, int H, int W,
                            int scan_unfolding, float min_depth,
                            float max_depth, float* out);

namespace {

constexpr int kH = 64;
constexpr int kW = 256;

void run_case(const char* name, const std::vector<float>& pts) {
  const int64_t n = (int64_t)pts.size() / 4;
  for (int unfold = 0; unfold <= 1; ++unfold) {
    std::vector<float> out((size_t)kH * kW * 6, 0.0f);
    const int rc =
        project_scan(pts.data(), n, kH, kW, unfold, 1.45f, 80.0f, out.data());
    if (rc != 0) {
      std::fprintf(stderr, "case %s (unfold=%d): rc=%d\n", name, unfold, rc);
      std::exit(1);
    }
    // touch every output so ASan sees the reads too, and assert the depth
    // channel stays finite: a non-finite point must be SKIPPED, not binned
    // (a NaN depth poisons its z-buffer cell for all later valid returns)
    double acc = 0.0;
    for (float v : out) acc += std::isfinite(v) ? v : 0.0;
    for (size_t c = 0; c < (size_t)kH * kW; ++c) {
      if (std::isnan(out[c * 6 + 4])) {
        std::fprintf(stderr, "case %s (unfold=%d): NaN depth at cell %zu\n",
                     name, unfold, c);
        std::exit(1);
      }
    }
    std::printf("case %-16s unfold=%d n=%lld acc=%.3f\n", name, unfold,
                (long long)n, acc);
  }
}

}  // namespace

int main() {
  const float nan = std::numeric_limits<float>::quiet_NaN();
  const float inf = std::numeric_limits<float>::infinity();

  run_case("empty", {});
  run_case("single", {1.0f, 2.0f, -0.5f, 0.3f});
  run_case("zeros", std::vector<float>(4 * 16, 0.0f));
  run_case("nan_coords", {nan, nan, nan, nan, 1.0f, nan, 0.0f, 0.5f,
                          nan, 0.0f, 1.0f, 0.1f, 0.0f, 0.0f, nan, 0.2f});
  run_case("inf_coords", {inf, 1.0f, 0.0f, 0.1f, -inf, -1.0f, 2.0f, 0.2f,
                          1.0f, inf, -inf, 0.3f, -1.0f, -inf, inf, 0.4f});
  run_case("huge", {3e38f, -3e38f, 3e38f, 1.0f, -3e38f, 3e38f, -3e38f, 1.0f});
  run_case("tiny", {1e-38f, -1e-38f, 1e-38f, 0.0f, -1e-38f, 1e-38f, 0.0f, 0.0f});
  // straight-up z: z/d rounding can brush past 1 before asin
  run_case("vertical", {0.0f, 0.0f, 5.0f, 0.1f, 0.0f, 0.0f, -5.0f, 0.1f,
                        1e-30f, 0.0f, 5.0f, 0.1f});

  // quadrant-ordering stress for the unfolding ring recovery: many full
  // revolutions (more rings than H) plus a partial one
  {
    std::vector<float> pts;
    for (int ring = 0; ring < kH + 8; ++ring) {
      const int m = 32 + (ring % 5);
      for (int j = 0; j < m; ++j) {
        const float a = 2.0f * 3.14159265f * j / m;
        const float r = 5.0f + 0.01f * ring;
        pts.push_back(r * std::cos(a));
        pts.push_back(-r * std::sin(a));  // clockwise like the HDL-64E
        pts.push_back(-1.0f + 0.03f * ring);
        pts.push_back(0.5f);
      }
    }
    run_case("many_rings", pts);
  }

  // realistic random scan (seeded LCG so the run is reproducible)
  {
    uint32_t s = 12345;
    auto rnd = [&s]() {
      s = s * 1664525u + 1013904223u;
      return (float)(s >> 8) / (float)(1 << 24);
    };
    std::vector<float> pts;
    for (int i = 0; i < 120000; ++i) {
      const float a = 2.0f * 3.14159265f * rnd();
      const float r = 1.0f + 79.0f * rnd();
      pts.push_back(r * std::cos(a));
      pts.push_back(r * std::sin(a));
      pts.push_back(-2.0f + 4.0f * rnd());
      pts.push_back(rnd());
    }
    run_case("random_scan", pts);
  }

  std::puts("sanitize_projection: all cases clean");
  return 0;
}
