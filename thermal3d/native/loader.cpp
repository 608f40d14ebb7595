// thermal3d native data loader: multi-threaded 16-bit PNG / 8-bit RGB decode
// + bilinear resize, exposed through a C ABI for ctypes.
//
// This is the TPU-native equivalent of the reference's native IO surface
// (cv2.imread(IMREAD_ANYDEPTH) + cv2.resize inside torch DataLoader workers —
// data/dataset_loader.py:237-266, thermal_dustr_inference.py:25-60). Host PNG
// decode is the throughput wall for a v5e chip at 500 fps (SURVEY.md §7 hard
// part 5): decoding a 640×480 uint16 PNG costs ~1-2 ms, so feeding one chip
// needs parallel decode. A fixed thread pool decodes + resizes a whole batch
// per call; resize uses half-pixel-center bilinear (cv2 INTER_LINEAR
// semantics) so outputs are interchangeable with the cv2 path.
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cpp -lpng -ljpeg -o libt3dloader.so

#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Thread pool (persistent across calls; sized lazily)
// ---------------------------------------------------------------------------

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

  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(fn));
    }
    cv_.notify_one();
  }

  int size() const { return static_cast<int>(workers_.size()); }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* pool(int n_threads) {
  static ThreadPool* p = nullptr;
  static std::mutex mu;
  std::lock_guard<std::mutex> lk(mu);
  if (p == nullptr || p->size() < n_threads) {
    delete p;
    p = new ThreadPool(n_threads > 0 ? n_threads : 4);
  }
  return p;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

struct Image {
  std::vector<float> data;  // H*W*C, channel-interleaved
  int h = 0, w = 0, c = 0;
  int bit_depth = 8;
  bool ok = false;
};

// Decode any PNG to float32. 16-bit stays in raw counts; 8-bit in 0..255.
Image decode_png(const char* path) {
  Image img;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return img;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return img;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return img;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian; we want LE u16
  png_read_update_info(png, info);

  const int h = png_get_image_height(png, info);
  const int w = png_get_image_width(png, info);
  const int channels = png_get_channels(png, info);
  const int depth = png_get_bit_depth(png, info);

  std::vector<png_byte> raw(static_cast<size_t>(h) * png_get_rowbytes(png, info));
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = raw.data() + static_cast<size_t>(y) * png_get_rowbytes(png, info);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  img.h = h;
  img.w = w;
  img.c = channels;
  img.bit_depth = depth;
  img.data.resize(static_cast<size_t>(h) * w * channels);
  const size_t n = img.data.size();
  if (depth == 16) {
    const uint16_t* src = reinterpret_cast<const uint16_t*>(raw.data());
    for (size_t i = 0; i < n; ++i) img.data[i] = static_cast<float>(src[i]);
  } else {
    const uint8_t* src = raw.data();
    for (size_t i = 0; i < n; ++i) img.data[i] = static_cast<float>(src[i]);
  }
  img.ok = true;
  return img;
}

// Half-pixel-center bilinear resize (cv2 INTER_LINEAR / jax half-pixel).
void resize_bilinear(const float* src, int sh, int sw, int c, float* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) { y0 = 0; y1 = 0; wy = 0.f; }
    if (y1 >= sh) { y1 = sh - 1; if (y0 >= sh) y0 = sh - 1; }
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) { x0 = 0; x1 = 0; wx = 0.f; }
      if (x1 >= sw) { x1 = sw - 1; if (x0 >= sw) x0 = sw - 1; }
      for (int ch = 0; ch < c; ++ch) {
        const float v00 = src[(static_cast<size_t>(y0) * sw + x0) * c + ch];
        const float v01 = src[(static_cast<size_t>(y0) * sw + x1) * c + ch];
        const float v10 = src[(static_cast<size_t>(y1) * sw + x0) * c + ch];
        const float v11 = src[(static_cast<size_t>(y1) * sw + x1) * c + ch];
        dst[(static_cast<size_t>(y) * dw + x) * c + ch] =
            (1 - wy) * ((1 - wx) * v00 + wx * v01) + wy * ((1 - wx) * v10 + wx * v11);
      }
    }
  }
}

void run_batch(int n, int n_threads, const std::function<void(int)>& work) {
  ThreadPool* tp = pool(n_threads);
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    tp->submit([&, i] {
      work(i);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

}  // namespace

extern "C" {

// Decode n thermal PNGs (any depth, any channel count — multi-channel is
// luma-averaged like the python fallback), resize to (out_h, out_w), write
// float32 raw counts (normalize=0) or /65535-or-/255 normalized (normalize=1)
// into out[n, out_h, out_w]. ok[i]=1 on success. Returns #succeeded.
int t3d_load_thermal_batch(const char** paths, int n, int out_h, int out_w,
                           float* out, unsigned char* ok, int n_threads,
                           int normalize) {
  std::atomic<int> n_ok{0};
  run_batch(n, n_threads, [&](int i) {
    ok[i] = 0;
    float* dst = out + static_cast<size_t>(i) * out_h * out_w;
    std::memset(dst, 0, sizeof(float) * out_h * out_w);
    Image img = decode_png(paths[i]);
    if (!img.ok) return;
    std::vector<float> gray;
    const float* plane = img.data.data();
    const bool is16 = img.bit_depth == 16;
    if (img.c > 1) {
      gray.resize(static_cast<size_t>(img.h) * img.w);
      for (size_t p = 0; p < gray.size(); ++p) {
        float s = 0.f;
        for (int ch = 0; ch < img.c; ++ch) s += img.data[p * img.c + ch];
        gray[p] = s / img.c;
      }
      plane = gray.data();
    }
    std::vector<float> resized(static_cast<size_t>(out_h) * out_w);
    resize_bilinear(plane, img.h, img.w, 1, resized.data(), out_h, out_w);
    const float scale = normalize ? (is16 ? 1.f / 65535.f : 1.f / 255.f) : 1.f;
    for (size_t p = 0; p < resized.size(); ++p) dst[p] = resized[p] * scale;
    ok[i] = 1;
    n_ok.fetch_add(1);
  });
  return n_ok.load();
}

// Decode n RGB(A/gray) PNGs, resize, write float32 [n, out_h, out_w, 3] in
// [0,1]. Gray inputs are broadcast to 3 channels.
int t3d_load_rgb_batch(const char** paths, int n, int out_h, int out_w,
                       float* out, unsigned char* ok, int n_threads) {
  std::atomic<int> n_ok{0};
  run_batch(n, n_threads, [&](int i) {
    ok[i] = 0;
    float* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
    std::memset(dst, 0, sizeof(float) * out_h * out_w * 3);
    Image img = decode_png(paths[i]);
    if (!img.ok) return;
    std::vector<float> rgb;
    const float* src = img.data.data();
    int c = img.c;
    if (c == 1) {
      rgb.resize(static_cast<size_t>(img.h) * img.w * 3);
      for (size_t p = 0; p < static_cast<size_t>(img.h) * img.w; ++p)
        rgb[p * 3] = rgb[p * 3 + 1] = rgb[p * 3 + 2] = img.data[p];
      src = rgb.data();
      c = 3;
    }
    std::vector<float> resized(static_cast<size_t>(out_h) * out_w * 3);
    resize_bilinear(src, img.h, img.w, 3, resized.data(), out_h, out_w);
    const float scale = img.bit_depth == 16 ? 1.f / 65535.f : 1.f / 255.f;
    for (size_t p = 0; p < resized.size(); ++p) dst[p] = resized[p] * scale;
    ok[i] = 1;
    n_ok.fetch_add(1);
  });
  return n_ok.load();
}

}  // extern "C"
