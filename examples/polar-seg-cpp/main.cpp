// Demo / parity driver: read a raw prediction dump produced by the Python
// framework, run the C++ polar postprocess, emit results as text.
//
// Dump format (little-endian):
//   int32 nc, int32 num_anchors, int32 height, int32 width,
//   float32 conf_thres, float32 iou_thres,
//   float32 prediction[(4 + nc + 108) * num_anchors]   (channel-major)
//
// Output (stdout): one line per detection
//   x1 y1 x2 y2 score cls mask_area
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "polar_postprocess.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <dump.bin> [max_det]\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  int32_t nc, na, h, w;
  float conf, iou_t;
  if (std::fread(&nc, 4, 1, f) != 1 || std::fread(&na, 4, 1, f) != 1 ||
      std::fread(&h, 4, 1, f) != 1 || std::fread(&w, 4, 1, f) != 1 ||
      std::fread(&conf, 4, 1, f) != 1 || std::fread(&iou_t, 4, 1, f) != 1) {
    std::fprintf(stderr, "bad header\n");
    return 1;
  }
  const size_t n = static_cast<size_t>(4 + nc + 108) * na;
  std::vector<float> pred(n);
  if (std::fread(pred.data(), 4, n, f) != n) {
    std::fprintf(stderr, "short read\n");
    return 1;
  }
  std::fclose(f);

  const int max_det = argc > 2 ? std::atoi(argv[2]) : 300;
  auto dets = polar::postprocess(pred.data(), nc, na, conf, iou_t, max_det);
  for (const auto& d : dets) {
    auto mask = polar::rasterize(d, h, w);
    long area = 0;
    for (uint8_t v : mask) area += v;
    std::printf("%.4f %.4f %.4f %.4f %.6f %d %ld\n", d.box[0], d.box[1],
                d.box[2], d.box[3], d.score, d.cls, area);
  }
  return 0;
}
