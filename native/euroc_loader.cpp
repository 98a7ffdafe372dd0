// Native EuRoC dataset loader: CSV parsing, PNG grayscale decode, threaded
// prefetch, per-frame IMU binning.
//
// TPU-native-framework equivalent of the reference's host-side data layer
// (include/utils/DataReader.hpp loadImuFile/loadImageList, the System
// image/IMU buffering in ros_wrapper/src/orcvio/src/System.cpp): the Python
// filter loop consumes frames through a ctypes API; decoding runs in a
// background thread pool so the accelerator never waits on libpng.
//
// Build: g++ -O2 -shared -fPIC -o libeuroc_loader.so euroc_loader.cpp -lpng -lpthread
// (no other dependencies; see orcvio_tpu/dataio/native.py).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ImuSample {
  double t;
  double gyro[3];
  double acc[3];
};

struct Frame {
  double t;
  std::string path;
};

struct DecodedImage {
  int width = 0, height = 0;
  std::vector<float> pixels;  // grayscale [0, 255]
  bool ready = false;
};

struct Loader {
  std::vector<ImuSample> imu;
  std::vector<Frame> frames;
  std::vector<double> gt_t;
  std::vector<double> gt_p;   // 3 per entry
  std::vector<double> gt_q;   // 4 per entry, xyzw

  // prefetch state
  std::vector<DecodedImage> cache;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> next_job{0};
  std::atomic<bool> stop{false};
  int ahead = 0;
  std::atomic<int> consumer_pos{0};
};

bool decode_png_gray(const std::string& path, DecodedImage* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<png_byte> row(png_get_rowbytes(png, info));
  out->width = (int)w;
  out->height = (int)h;
  out->pixels.resize((size_t)w * h);
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->pixels.data() + (size_t)y * w;
    for (png_uint_32 x = 0; x < w; ++x) dst[x] = (float)row[x];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

std::vector<std::string> split_csv_line(const std::string& line) {
  std::vector<std::string> out;
  std::stringstream ss(line);
  std::string item;
  while (std::getline(ss, item, ',')) out.push_back(item);
  return out;
}

bool file_exists(const std::string& p) {
  std::ifstream f(p);
  return f.good();
}

}  // namespace

extern "C" {

void* el_open(const char* root_c) {
  std::string root(root_c);
  if (file_exists(root + "/mav0/imu0/data.csv")) root += "/mav0";
  auto* L = new Loader();

  {  // IMU: ns, wx, wy, wz, ax, ay, az  (DataReader.hpp:67 loadImuFile)
    std::ifstream f(root + "/imu0/data.csv");
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty() || line[0] == '#') continue;
      auto c = split_csv_line(line);
      if (c.size() < 7) continue;
      ImuSample s;
      s.t = std::stod(c[0]) * 1e-9;
      for (int i = 0; i < 3; ++i) s.gyro[i] = std::stod(c[1 + i]);
      for (int i = 0; i < 3; ++i) s.acc[i] = std::stod(c[4 + i]);
      L->imu.push_back(s);
    }
  }
  {  // camera list (DataReader.hpp:31 loadImageList)
    std::ifstream f(root + "/cam0/data.csv");
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty() || line[0] == '#') continue;
      auto c = split_csv_line(line);
      if (c.size() < 2) continue;
      Frame fr;
      fr.t = std::stod(c[0]) * 1e-9;
      std::string name = c[1];
      while (!name.empty() && (name.back() == '\r' || name.back() == '\n' || name.back() == ' '))
        name.pop_back();
      fr.path = root + "/cam0/data/" + name;
      L->frames.push_back(fr);
    }
  }
  {  // groundtruth (dataset_reader.h:50)
    std::ifstream f(root + "/state_groundtruth_estimate0/data.csv");
    std::string line;
    while (f && std::getline(f, line)) {
      if (line.empty() || line[0] == '#') continue;
      auto c = split_csv_line(line);
      if (c.size() < 8) continue;
      L->gt_t.push_back(std::stod(c[0]) * 1e-9);
      for (int i = 0; i < 3; ++i) L->gt_p.push_back(std::stod(c[1 + i]));
      // EuRoC gt quaternion is w,x,y,z -> store xyzw
      double qw = std::stod(c[4]), qx = std::stod(c[5]), qy = std::stod(c[6]), qz = std::stod(c[7]);
      L->gt_q.push_back(qx);
      L->gt_q.push_back(qy);
      L->gt_q.push_back(qz);
      L->gt_q.push_back(qw);
    }
  }
  L->cache.resize(L->frames.size());
  return L;
}

int el_num_frames(void* h) { return (int)((Loader*)h)->frames.size(); }
int el_num_imu(void* h) { return (int)((Loader*)h)->imu.size(); }
int el_num_gt(void* h) { return (int)((Loader*)h)->gt_t.size(); }

void el_frame_times(void* h, double* out) {
  auto* L = (Loader*)h;
  for (size_t i = 0; i < L->frames.size(); ++i) out[i] = L->frames[i].t;
}

void el_copy_imu(void* h, double* t, double* gyro, double* acc) {
  auto* L = (Loader*)h;
  for (size_t i = 0; i < L->imu.size(); ++i) {
    t[i] = L->imu[i].t;
    for (int j = 0; j < 3; ++j) {
      gyro[3 * i + j] = L->imu[i].gyro[j];
      acc[3 * i + j] = L->imu[i].acc[j];
    }
  }
}

void el_copy_gt(void* h, double* t, double* p, double* q) {
  auto* L = (Loader*)h;
  memcpy(t, L->gt_t.data(), L->gt_t.size() * sizeof(double));
  memcpy(p, L->gt_p.data(), L->gt_p.size() * sizeof(double));
  memcpy(q, L->gt_q.data(), L->gt_q.size() * sizeof(double));
}

// Per-frame IMU binning: frame k gets samples in (t_{k-1}+td, t_k+td+0.5/rate]
// (batchImuProcessing time bound, orcvio.cpp:686). Outputs (K, slab[, 3]).
void el_bin_imu(void* h, int slab, double td, double imu_rate_hint,
                double* out_t, double* out_gyro, double* out_acc, uint8_t* out_mask) {
  auto* L = (Loader*)h;
  const int K = (int)L->frames.size();
  const double th = 0.5 / imu_rate_hint;
  size_t start = 0;
  memset(out_mask, 0, (size_t)K * slab);
  for (int k = 0; k < K; ++k) {
    const double bound = L->frames[k].t + td + th;
    size_t end = start;
    while (end < L->imu.size() && L->imu[end].t <= bound) ++end;
    size_t n = end - start;
    size_t s0 = start;
    if ((int)n > slab) {  // keep the newest samples
      s0 = end - slab;
      n = slab;
    }
    for (size_t i = 0; i < n; ++i) {
      const ImuSample& s = L->imu[s0 + i];
      size_t o = (size_t)k * slab + i;
      out_t[o] = s.t;
      for (int j = 0; j < 3; ++j) {
        out_gyro[3 * o + j] = s.gyro[j];
        out_acc[3 * o + j] = s.acc[j];
      }
      out_mask[o] = 1;
    }
    start = end;
  }
}

int el_image_size(void* h, int* w_out, int* h_out) {
  auto* L = (Loader*)h;
  if (L->frames.empty()) return -1;
  DecodedImage img;
  if (!decode_png_gray(L->frames[0].path, &img)) return -2;
  *w_out = img.width;
  *h_out = img.height;
  return 0;
}

// Background decode pool: workers decode frames in consumption order, at most
// `ahead` frames past the consumer.
void el_start_prefetch(void* h, int n_threads, int ahead) {
  auto* L = (Loader*)h;
  L->ahead = ahead;
  L->stop = false;
  L->next_job = 0;
  for (int i = 0; i < n_threads; ++i) {
    L->workers.emplace_back([L]() {
      while (!L->stop) {
        int k = L->next_job.fetch_add(1);
        if (k >= (int)L->frames.size()) break;
        // throttle: stay within `ahead` of the consumer
        while (!L->stop && k > L->consumer_pos.load() + L->ahead)
          std::this_thread::sleep_for(std::chrono::milliseconds(1));
        if (L->stop) break;
        DecodedImage img;
        decode_png_gray(L->frames[k].path, &img);
        {
          std::lock_guard<std::mutex> lk(L->mu);
          L->cache[k] = std::move(img);
          L->cache[k].ready = true;
        }
        L->cv.notify_all();
      }
    });
  }
}

// Blocking fetch of frame k as float32 grayscale; frees the cache slot.
int el_get_image(void* h, int k, float* out, int max_pixels) {
  auto* L = (Loader*)h;
  if (k < 0 || k >= (int)L->frames.size()) return -1;
  L->consumer_pos.store(k);
  DecodedImage img;
  if (!L->workers.empty()) {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv.wait(lk, [&] { return L->cache[k].ready; });
    img = std::move(L->cache[k]);
    L->cache[k] = DecodedImage();
  } else {
    if (!decode_png_gray(L->frames[k].path, &img)) return -2;
  }
  int n = img.width * img.height;
  if (n > max_pixels) return -3;
  memcpy(out, img.pixels.data(), (size_t)n * sizeof(float));
  return n;
}

void el_close(void* h) {
  auto* L = (Loader*)h;
  L->stop = true;
  L->cv.notify_all();
  for (auto& t : L->workers)
    if (t.joinable()) t.join();
  delete L;
}

}  // extern "C"
