// End-to-end C++ consumer of the framework's NATIVE ONNX export: load the
// opset-12 artifact written by yolo_contour_regression_tpu/onnx/export.py
// with OpenCV-DNN, run the forward pass (polar ray decode is already IN the
// graph), then reuse the C++ polar postprocess (NMS + even-odd raster).
//
// This is the counterpart of the reference's examples/YOLOv8-CPP-Inference
// (cv::dnn + ONNX) — except that demo must re-implement the decode the torch
// exporter drops, while this graph hands back decoded contours directly.
//
// usage: polar_onnx_demo <model.onnx> <image> [imgsz] [conf] [iou] [max_det]
// output: one line per detection "x1 y1 x2 y2 score cls mask_area"
//         (letterbox-space pixels at the model's imgsz; imgsz must match the
//         export — see <model>.metadata.json)
#include <cstdio>
#include <cstdlib>
#include <vector>

#include <opencv2/dnn.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "polar_postprocess.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <model.onnx> <image> [imgsz] [conf] [iou] [max_det]\n",
                 argv[0]);
    return 2;
  }
  const int imgsz = argc > 3 ? std::atoi(argv[3]) : 640;
  const float conf = argc > 4 ? std::atof(argv[4]) : 0.25f;
  const float iou = argc > 5 ? std::atof(argv[5]) : 0.7f;
  const int max_det = argc > 6 ? std::atoi(argv[6]) : 300;

  cv::dnn::Net net = cv::dnn::readNetFromONNX(argv[1]);
  cv::Mat img = cv::imread(argv[2]);
  if (img.empty()) {
    std::fprintf(stderr, "cannot read %s\n", argv[2]);
    return 1;
  }

  // the exported input is (1, 3, S, S) RGB in [0,1]; square-resize like the
  // python AutoBackend's letterbox with scaleup (exact for square inputs)
  cv::Mat blob = cv::dnn::blobFromImage(
      img, 1.0 / 255.0, cv::Size(imgsz, imgsz), cv::Scalar(), /*swapRB=*/true,
      /*crop=*/false);
  net.setInput(blob);
  cv::Mat out = net.forward();  // (1, 4+nc+108, A)

  const int c = out.size[1], na = out.size[2];
  const int nc = c - 4 - 108;
  auto dets = polar::postprocess(reinterpret_cast<const float*>(out.data), nc,
                                 na, conf, iou, max_det);
  for (const auto& d : dets) {
    auto mask = polar::rasterize(d, imgsz, imgsz);
    long area = 0;
    for (uint8_t v : mask) area += v;
    std::printf("%.4f %.4f %.4f %.4f %.6f %d %ld\n", d.box[0], d.box[1],
                d.box[2], d.box[3], d.score, d.cls, area);
  }
  return 0;
}
