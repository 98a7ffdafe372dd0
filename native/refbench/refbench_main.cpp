// Reference benchmark runner: drives the UPSTREAM OrcVIO C++ front end +
// estimator (compiled unmodified from /root/reference) over a EuRoC-format
// sequence, without the Pangolin viewer, and reports wall-clock timing plus
// a TUM-format trajectory. This binary exists solely to measure the
// reference implementation's fps and accuracy on THIS machine so that
// BENCH_r*.json carries a measured denominator (BASELINE.md requires
// "measure reference fps on this machine"), replacing round 1's estimate.
//
// Loop structure mirrors app/orcvioMain.cpp:104-198 (load imu+images, feed
// the <0.05 s-lookahead IMU buffer, processImage -> processFeatures, timed
// with cv::getTickCount) minus all visualization.
#include <cstdio>
#include <iostream>
#include <string>
#include <vector>

#include "utils/DataReader.hpp"

#include "opencv2/core.hpp"
#include "opencv2/imgcodecs.hpp"

#include "sensors/ImageData.hpp"

#include "orcvio/image_processor.h"
#include "orcvio/orcvio.h"

#include "Eigen/Dense"
#include "Eigen/Geometry"

int main(int argc, char** argv) {
  if (argc != 6) {
    std::cerr << "Usage: refbench imu_data.csv cam_data.csv img_dir config.yaml traj_out.txt"
              << std::endl;
    return 1;
  }

  std::vector<orcvio::ImuData> allImuData;
  std::vector<orcvio::ImgInfo> allImgInfo;
  orcvio::loadImuFile(argv[1], allImuData);
  orcvio::loadImageList(argv[2], allImgInfo);
  if (allImuData.empty() || allImgInfo.empty()) {
    std::cerr << "refbench: empty imu or image list" << std::endl;
    return 1;
  }
  const std::string img_dir(argv[3]);
  std::string config_file(argv[4]);  // non-const: reference ctors take string&

  orcvio::ImageProcessorPtr img_processor(new orcvio::ImageProcessor(config_file));
  if (!img_processor->initialize()) {
    std::cerr << "refbench: ImageProcessor init failed" << std::endl;
    return 1;
  }
  orcvio::OrcVIOPtr estimator(new orcvio::OrcVIO(config_file));
  if (!estimator->initialize()) {
    std::cerr << "refbench: OrcVIO init failed" << std::endl;
    return 1;
  }

  FILE* traj = std::fopen(argv[5], "w");
  if (!traj) {
    std::cerr << "refbench: cannot open trajectory output " << argv[5] << std::endl;
    return 1;
  }

  size_t imu_idx = 0;
  std::vector<orcvio::ImuData> imu_buffer;
  double total_fe = 0.0, total_be = 0.0;
  long frames = 0, published = 0;

  for (size_t j = 0; j < allImgInfo.size(); ++j) {
    // image names in data.csv have a trailing newline char, as in
    // orcvioMain.cpp:108
    std::string name = allImgInfo[j].imgName;
    while (!name.empty() && (name.back() == '\n' || name.back() == '\r')) name.pop_back();
    orcvio::ImageDataPtr img(new orcvio::ImgData);
    img->timeStampToSec = allImgInfo[j].timeStampToSec;
    img->image = cv::imread(img_dir + "/" + name, cv::IMREAD_GRAYSCALE);
    if (img->image.empty()) {
      std::cerr << "refbench: missing image " << name << std::endl;
      continue;
    }

    while (imu_idx < allImuData.size() &&
           allImuData[imu_idx].timeStampToSec - img->timeStampToSec < 0.05) {
      imu_buffer.push_back(allImuData[imu_idx]);
      ++imu_idx;
    }

    orcvio::MonoCameraMeasurementPtr features = new orcvio::MonoCameraMeasurement;
    int64 t0 = cv::getTickCount();
    bool processed = img_processor->processImage(img, imu_buffer, features);
    int64 t1 = cv::getTickCount();
    total_fe += double(t1 - t0) / cv::getTickFrequency();
    ++frames;

    bool pub = false;
    if (processed) {
      int64 t2 = cv::getTickCount();
      pub = estimator->processFeatures(features, imu_buffer);
      int64 t3 = cv::getTickCount();
      total_be += double(t3 - t2) / cv::getTickFrequency();
    }
    delete features;

    if (pub) {
      ++published;
      Eigen::Isometry3d Tbw = estimator->getTbw();
      Eigen::Quaterniond q(Tbw.linear());
      Eigen::Vector3d p = Tbw.translation();
      std::fprintf(traj, "%.9f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n",
                   img->timeStampToSec, p.x(), p.y(), p.z(), q.x(), q.y(), q.z(), q.w());
    }
  }
  std::fclose(traj);

  const double total = total_fe + total_be;
  std::printf(
      "{\"frames\": %ld, \"published\": %ld, \"frontend_s\": %.4f, \"backend_s\": %.4f, "
      "\"total_s\": %.4f, \"fps\": %.2f}\n",
      frames, published, total_fe, total_be, total, total > 0 ? frames / total : 0.0);
  return 0;
}
