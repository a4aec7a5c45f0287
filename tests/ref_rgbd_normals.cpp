// Test-oracle tool: run the REAL cv::rgbd::RgbdNormals (LINEMOD method,
// window 5) on a fixture depth image, exactly as the reference constructs
// it (/root/reference/src/rgbd.cpp:202-206), and dump the per-pixel
// normals as raw float32 [H, W, 3] for the scene-loader parity test
// (tests/test_scene_oracle.py). Built on demand against the system
// OpenCV 4.6 (the same-generation rgbd module the reference links).
//
// Usage: ref_rgbd_normals <depth.png> <out.bin> <fx> <cx> <fy> <cy>
#include <cstdio>
#include <cstdlib>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/rgbd.hpp>

int main(int argc, char** argv) {
  if (argc != 7) {
    std::fprintf(stderr, "usage: %s depth.png out.bin fx cx fy cy\n",
                 argv[0]);
    return 2;
  }
  cv::Mat depth = cv::imread(argv[1], cv::IMREAD_UNCHANGED);
  if (depth.empty() || depth.type() != CV_16UC1) {
    std::fprintf(stderr, "depth image must be 16UC1\n");
    return 2;
  }
  double fx = std::atof(argv[3]), cx = std::atof(argv[4]);
  double fy = std::atof(argv[5]), cy = std::atof(argv[6]);
  // K layout mirrors rgbd.cpp:202: {fx, 0, cx; 0, fy, cy; 0, 0, 1} from the
  // intrinsics vector ordered {fx, cx, fy, cy}
  cv::Mat K = (cv::Mat_<double>(3, 3) << fx, 0, cx, 0, fy, cy, 0, 0, 1);
  cv::rgbd::RgbdNormals normals_computer(
      depth.rows, depth.cols, CV_32F, K, 5,
      cv::rgbd::RgbdNormals::RGBD_NORMALS_METHOD_LINEMOD);
  cv::Mat normals;
  normals_computer(depth, normals);
  cv::Mat_<cv::Vec3f> n3f;
  normals.convertTo(n3f, CV_32FC3);
  FILE* f = std::fopen(argv[2], "wb");
  if (!f) return 2;
  std::fwrite(n3f.data, sizeof(float),
              static_cast<size_t>(depth.rows) * depth.cols * 3, f);
  std::fclose(f);
  std::printf("%d %d\n", depth.rows, depth.cols);
  return 0;
}
