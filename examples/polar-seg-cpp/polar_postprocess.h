// Polar contour-regression postprocess — C++ deploy-side library.
//
// Consumes the framework's exported prediction tensor (see
// engine/exporter.py metadata: (4 + nc + 108, A) float32 per image, where the
// 108 = 36 seg-x | 36 seg-y | 36 valid flags and boxes are xyxy pixels) and
// produces final instances: confidence filter -> class-aware greedy NMS ->
// polygon mask rasterization (even-odd rule, matching ops/raster.py).
//
// This is the deploy consumer the reference's C++ examples lack: their
// YOLOv8-CPP-Inference / YOLOv8-ONNXRuntime-CPP demos are detection-only
// (SURVEY.md §2.9); polar decode + fill never existed in C++.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace polar {

constexpr int kNumRays = 36;

struct Detection {
  float box[4];  // x1, y1, x2, y2
  float score;
  int cls;
  float seg_x[kNumRays];
  float seg_y[kNumRays];
  bool seg_valid[kNumRays];
};

inline float iou(const float* a, const float* b) {
  const float x1 = std::max(a[0], b[0]);
  const float y1 = std::max(a[1], b[1]);
  const float x2 = std::min(a[2], b[2]);
  const float y2 = std::min(a[3], b[3]);
  const float inter = std::max(0.f, x2 - x1) * std::max(0.f, y2 - y1);
  const float area_a = std::max(0.f, a[2] - a[0]) * std::max(0.f, a[3] - a[1]);
  const float area_b = std::max(0.f, b[2] - b[0]) * std::max(0.f, b[3] - b[1]);
  return inter / (area_a + area_b - inter + 1e-7f);
}

// prediction: (4 + nc + 108, num_anchors) row-major. Returns detections after
// class-aware greedy NMS, highest score first, capped at max_det.
std::vector<Detection> postprocess(const float* prediction, int nc,
                                   int num_anchors, float conf_thres = 0.25f,
                                   float iou_thres = 0.7f, int max_det = 300);

// Even-odd polygon fill over the valid contour vertices (invalid vertices
// collapse onto the previous valid one, exactly like ops/raster.py).
std::vector<uint8_t> rasterize(const Detection& det, int height, int width);

}  // namespace polar
