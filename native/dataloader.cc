// Native host data-loader core for deepfake_vit_tpu.
//
// The reference feeds its GPU with torch DataLoader worker *processes*
// (src/data/dataset.py:218-243); this is the TPU framework's native
// equivalent: a C++ thread pool that decodes face crops (libjpeg/libpng via
// OpenCV's C++ imgcodecs), converts BGR→RGB, resizes, normalizes with
// ImageNet statistics, and writes directly into a caller-owned NHWC float32
// batch buffer — no Python objects, no GIL, one memcpy-free pass per image.
//
// Exposed as a minimal C ABI consumed from Python via ctypes
// (deepfake_vit_tpu/data/native_loader.py). Build: native/build.sh.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

// Decode one file into out[H*W*3] (RGB float32, optionally normalized).
// Returns 0 on success, nonzero on failure (buffer zero-filled).
int DecodeOne(const char* path, int image_size, int normalize, float* out) {
  cv::Mat bgr = cv::imread(path, cv::IMREAD_COLOR);
  const int hw = image_size * image_size;
  if (bgr.empty()) {
    std::memset(out, 0, sizeof(float) * hw * 3);
    return 1;
  }
  if (bgr.rows != image_size || bgr.cols != image_size) {
    cv::Mat resized;
    cv::resize(bgr, resized, cv::Size(image_size, image_size), 0, 0,
               cv::INTER_LINEAR);
    bgr = resized;
  }
  // BGR uint8 → RGB float32 (+ normalize), written NHWC-contiguous.
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < image_size; ++y) {
    const uint8_t* row = bgr.ptr<uint8_t>(y);
    float* orow = out + static_cast<size_t>(y) * image_size * 3;
    for (int x = 0; x < image_size; ++x) {
      const float b = row[x * 3 + 0] * inv255;
      const float g = row[x * 3 + 1] * inv255;
      const float r = row[x * 3 + 2] * inv255;
      if (normalize) {
        orow[x * 3 + 0] = (r - kMean[0]) / kStd[0];
        orow[x * 3 + 1] = (g - kMean[1]) / kStd[1];
        orow[x * 3 + 2] = (b - kMean[2]) / kStd[2];
      } else {
        orow[x * 3 + 0] = r;
        orow[x * 3 + 1] = g;
        orow[x * 3 + 2] = b;
      }
    }
  }
  return 0;
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

struct Loader {
  explicit Loader(int threads) : pool(threads) {}
  ThreadPool pool;
};

}  // namespace

extern "C" {

// Opaque loader handle holding a persistent thread pool.
void* dfv_loader_create(int num_threads) {
  if (num_threads <= 0) num_threads = 4;
  return new Loader(num_threads);
}

void dfv_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Decode `count` images into out_images (count × size × size × 3 float32,
// NHWC). Returns the number of failed decodes; per-image failure flags are
// written to `failed` (may be null). Thread-parallel across images.
int dfv_decode_batch(void* handle, const char** paths, int count,
                     int image_size, int normalize, float* out_images,
                     uint8_t* failed) {
  Loader* loader = static_cast<Loader*>(handle);
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;

  const size_t stride = static_cast<size_t>(image_size) * image_size * 3;
  for (int i = 0; i < count; ++i) {
    loader->pool.Submit([&, i] {
      int rc = DecodeOne(paths[i], image_size, normalize, out_images + i * stride);
      if (failed != nullptr) failed[i] = static_cast<uint8_t>(rc != 0);
      if (rc != 0) failures.fetch_add(1);
      if (done.fetch_add(1) + 1 == count) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == count; });
  return failures.load();
}

// Single-threaded single-image decode (diagnostics / tiny batches).
int dfv_decode_one(const char* path, int image_size, int normalize,
                   float* out_image) {
  return DecodeOne(path, image_size, normalize, out_image);
}

}  // extern "C"
