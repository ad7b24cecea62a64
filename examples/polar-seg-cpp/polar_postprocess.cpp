#include "polar_postprocess.h"

#include <numeric>

namespace polar {

std::vector<Detection> postprocess(const float* prediction, int nc,
                                   int num_anchors, float conf_thres,
                                   float iou_thres, int max_det) {
  const int stride = num_anchors;  // channel-major layout: pred[c * A + a]
  std::vector<Detection> cands;
  cands.reserve(1024);
  for (int a = 0; a < num_anchors; ++a) {
    float best = -1.f;
    int best_c = -1;
    for (int c = 0; c < nc; ++c) {
      const float s = prediction[(4 + c) * stride + a];
      if (s > best) {
        best = s;
        best_c = c;
      }
    }
    if (best < conf_thres) continue;
    Detection d;
    for (int k = 0; k < 4; ++k) d.box[k] = prediction[k * stride + a];
    d.score = best;
    d.cls = best_c;
    const int off = 4 + nc;
    for (int r = 0; r < kNumRays; ++r) {
      d.seg_x[r] = prediction[(off + r) * stride + a];
      d.seg_y[r] = prediction[(off + kNumRays + r) * stride + a];
      d.seg_valid[r] = prediction[(off + 2 * kNumRays + r) * stride + a] > 0.5f;
    }
    cands.push_back(d);
  }

  std::sort(cands.begin(), cands.end(),
            [](const Detection& a, const Detection& b) { return a.score > b.score; });

  // class-aware greedy NMS (same semantics as ops/nms.py: a box survives iff
  // no higher-scored SURVIVOR of the same class overlaps it above iou_thres)
  std::vector<Detection> keep;
  for (const auto& d : cands) {
    bool suppressed = false;
    for (const auto& k : keep) {
      if (k.cls == d.cls && iou(k.box, d.box) > iou_thres) {
        suppressed = true;
        break;
      }
    }
    if (!suppressed) {
      keep.push_back(d);
      if (static_cast<int>(keep.size()) >= max_det) break;
    }
  }
  return keep;
}

std::vector<uint8_t> rasterize(const Detection& det, int height, int width) {
  // collapse invalid vertices onto the previous valid one (circular)
  float xs[kNumRays], ys[kNumRays];
  int last_valid = -1;
  for (int i = kNumRays - 1; i >= 0; --i)
    if (det.seg_valid[i]) last_valid = i;
  bool any_valid = last_valid >= 0;
  // find the most recent valid index at or before i, wrapping
  int prev = -1;
  for (int i = 0; i < kNumRays; ++i)
    if (det.seg_valid[i]) prev = i;  // ends at LAST valid (for wrap-before-first)
  for (int i = 0; i < kNumRays; ++i) {
    if (det.seg_valid[i]) prev = i;
    const int src = any_valid ? prev : i;
    xs[i] = det.seg_x[src];
    ys[i] = det.seg_y[src];
  }

  std::vector<uint8_t> mask(static_cast<size_t>(height) * width, 0);
  if (!any_valid) return mask;
  for (int y = 0; y < height; ++y) {
    const float py = static_cast<float>(y);
    for (int x = 0; x < width; ++x) {
      const float px = static_cast<float>(x);
      int crossings = 0;
      for (int e = 0; e < kNumRays; ++e) {
        const int j = (e + 1) % kNumRays;
        const bool cond = (ys[e] > py) != (ys[j] > py);
        if (!cond) continue;
        const float denom = (ys[j] == ys[e]) ? 1.f : (ys[j] - ys[e]);
        const float xi = xs[e] + (py - ys[e]) / denom * (xs[j] - xs[e]);
        if (px < xi) ++crossings;
      }
      mask[static_cast<size_t>(y) * width + x] = crossings & 1;
    }
  }
  return mask;
}

}  // namespace polar
