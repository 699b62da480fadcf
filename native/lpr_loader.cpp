// lpr_loader — native (C++) image-decode + crop + resize batch loader.
//
// TPU-native replacement for the reference's native data-path dependencies
// (jpeg4py/libjpeg-turbo + OpenCV decode — SURVEY.md §2.9): the input
// pipeline's hot loop (JPEG/PNG decode, crop, bilinear resize to the model
// resolution, float conversion) runs in a C++ thread pool, called from
// Python via ctypes (the call releases the GIL).
//
// Build: see native/Makefile (g++ -O3 -fPIC -shared, links libjpeg libpng).
//
// API (extern "C"):
//   void* lpr_create(int num_threads);
//   void  lpr_destroy(void* pool);
//   int   lpr_load_batch(void* pool,
//                        const char** paths, int n,
//                        const int* crops,     // n x 4 (t, l, b, r) or NULL
//                        int target_h, int target_w,
//                        float* out);          // n*target_h*target_w*3, RGB [0,1]
//   returns number of images that failed to load (their slots are zeroed).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<unsigned char> rgb;  // H*W*3
  int w = 0, h = 0;
};

// ---------- JPEG ----------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->rgb.resize(size_t(img->w) * img->h * 3);
  const int stride = img->w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = img->rgb.data() + size_t(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------- PNG ----------

bool decode_png(FILE* f, Image* img) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);            // palettes / low bit depth -> 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img->w = png_get_image_width(png, info);
  img->h = png_get_image_height(png, info);
  img->rgb.resize(size_t(img->w) * img->h * 3);
  std::vector<png_bytep> rows(img->h);
  for (int y = 0; y < img->h; ++y)
    rows[y] = img->rgb.data() + size_t(y) * img->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* img) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[2] = {0, 0};
  if (fread(magic, 1, 2, f) != 2) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, img);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, img);
  }
  fclose(f);
  return ok && img->w > 0 && img->h > 0;
}

// ---------- crop + bilinear resize to float32 ----------

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

void crop_resize_to_float(const Image& img, int ct, int cl, int cb, int cr,
                          int th, int tw, float* out) {
  if (cb <= ct || cr <= cl) {  // no/invalid crop -> whole image
    ct = 0; cl = 0; cb = img.h; cr = img.w;
  }
  const float sy = float(cb - ct) / th;
  const float sx = float(cr - cl) / tw;
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < th; ++y) {
    // align_corners=false pixel centers
    float fy = ct + (y + 0.5f) * sy - 0.5f;
    int y0 = int(fy >= 0 ? fy : fy - 1);  // floor
    float wy = fy - y0;
    int y0c = clampi(y0, 0, img.h - 1), y1c = clampi(y0 + 1, 0, img.h - 1);
    for (int x = 0; x < tw; ++x) {
      float fx = cl + (x + 0.5f) * sx - 0.5f;
      int x0 = int(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = clampi(x0, 0, img.w - 1), x1c = clampi(x0 + 1, 0, img.w - 1);
      const unsigned char* p00 = &img.rgb[(size_t(y0c) * img.w + x0c) * 3];
      const unsigned char* p01 = &img.rgb[(size_t(y0c) * img.w + x1c) * 3];
      const unsigned char* p10 = &img.rgb[(size_t(y1c) * img.w + x0c) * 3];
      const unsigned char* p11 = &img.rgb[(size_t(y1c) * img.w + x1c) * 3];
      float* o = out + (size_t(y) * tw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * (1 - wx) + p01[c] * wx;
        float bot = p10[c] * (1 - wx) + p11[c] * wx;
        o[c] = (top * (1 - wy) + bot * wy) * inv255;
      }
    }
  }
}

// ---------- thread pool ----------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop();
      }
      job();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

}  // namespace

extern "C" {

void* lpr_create(int num_threads) {
  if (num_threads < 1) num_threads = 1;
  return new Pool(num_threads);
}

void lpr_destroy(void* pool) { delete static_cast<Pool*>(pool); }

int lpr_load_batch(void* pool_ptr, const char** paths, int n,
                   const int* crops, int target_h, int target_w,
                   float* out) {
  Pool* pool = static_cast<Pool*>(pool_ptr);
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t stride = size_t(target_h) * target_w * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      Image img;
      float* dst = out + stride * i;
      if (decode_file(paths[i], &img)) {
        int ct = 0, cl = 0, cb = 0, cr = 0;
        if (crops) {
          ct = crops[i * 4 + 0];
          cl = crops[i * 4 + 1];
          cb = crops[i * 4 + 2];
          cr = crops[i * 4 + 3];
        }
        crop_resize_to_float(img, ct, cl, cb, cr, target_h, target_w, dst);
      } else {
        std::memset(dst, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

}  // extern "C"
