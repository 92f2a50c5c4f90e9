// Hard-NMS reference implementation — the C++ test oracle.
//
// Role-parity with the reference's CPU NMS (/root/reference/kernels/nms/
// nms.cc:4-20 provides a C++ hard_nms the harness diffs against): written
// from scratch with the classic greedy algorithm — sort candidates by score,
// keep a box iff its IoU with every already-kept box is below the threshold.
// Exposed with a plain C ABI and loaded via ctypes (tests/test_native.py);
// the Pallas NMS kernel (leetcuda_tpu/ops/nms.py) must agree with it.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

inline float iou(const float* a, const float* b) {
  // boxes are (x1, y1, x2, y2)
  const float ix1 = std::max(a[0], b[0]);
  const float iy1 = std::max(a[1], b[1]);
  const float ix2 = std::min(a[2], b[2]);
  const float iy2 = std::min(a[3], b[3]);
  const float iw = std::max(0.0f, ix2 - ix1);
  const float ih = std::max(0.0f, iy2 - iy1);
  const float inter = iw * ih;
  const float area_a = std::max(0.0f, a[2] - a[0]) * std::max(0.0f, a[3] - a[1]);
  const float area_b = std::max(0.0f, b[2] - b[0]) * std::max(0.0f, b[3] - b[1]);
  const float uni = area_a + area_b - inter;
  return uni > 0.0f ? inter / uni : 0.0f;
}

}  // namespace

extern "C" {

// boxes: (n, 4) row-major x1,y1,x2,y2; scores: (n,).
// Writes kept box indices (original indexing, score-descending order) into
// `keep` (capacity max_keep) and returns the kept count.
int hard_nms(const float* boxes, const float* scores, int n,
             float iou_threshold, int* keep, int max_keep) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int i, int j) { return scores[i] > scores[j]; });

  int kept = 0;
  for (int oi = 0; oi < n && kept < max_keep; ++oi) {
    const int i = order[oi];
    bool suppressed = false;
    for (int kj = 0; kj < kept; ++kj) {
      if (iou(boxes + 4 * i, boxes + 4 * keep[kj]) > iou_threshold) {
        suppressed = true;
        break;
      }
    }
    if (!suppressed) keep[kept++] = i;
  }
  return kept;
}

}  // extern "C"
