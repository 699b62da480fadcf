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

#include <algorithm>
#include <atomic>
#include <cmath>
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

// ---------- blur-faded padded crop (dataset-parity path) ----------
//
// Exact port of latentpose_tpu/data/common/crop.py crop_with_padding +
// the dataset's integer-bbox math and resize choice
// (voxceleb2_segmentation_nolandmarks.py:111-125): reflect101 padding,
// Gaussian blur-fade toward pad borders (sigma = 0.016*H, cv2 kernel
// formula), fade to the per-channel median, INTER_AREA / INTER_CUBIC
// resize.  Matches the cv2/numpy path to within quantization (<= 2/255).

inline int reflect101(int i, int n) {
  if (n == 1) return 0;
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * n - 2 - i;
  }
  return i;
}

// round-half-to-even, like np.rint / cvRound
inline float rint_f(float v) { return std::nearbyintf(v); }

void gaussian_blur_f32(std::vector<float>& img, int h, int w, float sigma) {
  // cv2 8U ksize rule: cvRound(sigma*3*2 + 1) | 1
  int ksize = int(rint_f(sigma * 6.0f + 1.0f)) | 1;
  if (ksize < 1) ksize = 1;
  int c = ksize / 2;
  std::vector<float> kern(ksize);
  double sum = 0.0;
  for (int i = 0; i < ksize; ++i) {
    double d = i - c;
    kern[i] = float(std::exp(-d * d / (2.0 * sigma * sigma)));
    sum += kern[i];
  }
  for (int i = 0; i < ksize; ++i) kern[i] = float(kern[i] / sum);

  std::vector<float> tmp(img.size());
  // horizontal pass (reflect101 borders, cv2 BORDER_DEFAULT)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ksize; ++k) {
        int xs = reflect101(x + k - c, w);
        const float* p = &img[(size_t(y) * w + xs) * 3];
        acc[0] += kern[k] * p[0];
        acc[1] += kern[k] * p[1];
        acc[2] += kern[k] * p[2];
      }
      float* o = &tmp[(size_t(y) * w + x) * 3];
      o[0] = acc[0]; o[1] = acc[1]; o[2] = acc[2];
    }
  }
  // vertical pass
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ksize; ++k) {
        int ys = reflect101(y + k - c, h);
        const float* p = &tmp[(size_t(ys) * w + x) * 3];
        acc[0] += kern[k] * p[0];
        acc[1] += kern[k] * p[1];
        acc[2] += kern[k] * p[2];
      }
      float* o = &img[(size_t(y) * w + x) * 3];
      o[0] = acc[0]; o[1] = acc[1]; o[2] = acc[2];
    }
  }
}

float channel_median(const std::vector<float>& img, int n_pixels, int ch) {
  std::vector<float> vals(n_pixels);
  for (int i = 0; i < n_pixels; ++i) vals[i] = img[size_t(i) * 3 + ch];
  size_t mid = vals.size() / 2;
  std::nth_element(vals.begin(), vals.begin() + mid, vals.end());
  float hi = vals[mid];
  if (vals.size() % 2 == 1) return hi;
  float lo = *std::max_element(vals.begin(), vals.begin() + mid);
  return 0.5f * (lo + hi);  // np.median: mean of the two middles
}

// crop image[t:b, l:r] (out-of-bounds allowed) -> u8 buffer (b-t, r-l, 3)
void crop_padded_u8(const Image& img, int off_y, int off_x, int H, int W,
                    int t, int l, int b, int r,
                    std::vector<unsigned char>* out_u8) {
  const int h = b - t, w = r - l;
  const int t_in = t > 0 ? t : 0, b_in = b < H ? b : H;
  const int l_in = l > 0 ? l : 0, r_in = r < W ? r : W;
  const int pt = t_in - t, pb = b - b_in, pl = l_in - l, pr = r - r_in;
  const int ch = b_in - t_in, cw = r_in - l_in;  // interior crop dims

  out_u8->assign(size_t(h) * w * 3, 0);
  for (int y = 0; y < h; ++y) {
    int ys = reflect101(y - pt, ch) + t_in + off_y;
    for (int x = 0; x < w; ++x) {
      int xs = reflect101(x - pl, cw) + l_in + off_x;
      const unsigned char* p = &img.rgb[(size_t(ys) * img.w + xs) * 3];
      unsigned char* o = &(*out_u8)[(size_t(y) * w + x) * 3];
      o[0] = p[0]; o[1] = p[1]; o[2] = p[2];
    }
  }
  if (pt == 0 && pb == 0 && pl == 0 && pr == 0) return;

  std::vector<float> out_f(size_t(h) * w * 3);
  for (size_t i = 0; i < out_f.size(); ++i)
    out_f[i] = (*out_u8)[i] * (1.0f / 255.0f);
  std::vector<float> blur_f = out_f;
  gaussian_blur_f32(blur_f, h, w, h * 0.016f);

  const float inf = 1e30f;
  float med[3] = {channel_median(out_f, h * w, 0),
                  channel_median(out_f, h * w, 1),
                  channel_median(out_f, h * w, 2)};
  for (int y = 0; y < h; ++y) {
    float near_t = pt ? float(y) / pt : inf;
    float near_b = pb ? float(h - 1 - y) / pb : inf;
    float vert = 1.0f - (near_t < near_b ? near_t : near_b);
    for (int x = 0; x < w; ++x) {
      float near_l = pl ? float(x) / pl : inf;
      float near_r = pr ? float(w - 1 - x) / pr : inf;
      float horiz = 1.0f - (near_l < near_r ? near_l : near_r);
      float mask = horiz > vert ? horiz : vert;
      float wblur = mask * 3.0f + 1.0f;
      wblur = wblur < 0.0f ? 0.0f : (wblur > 1.0f ? 1.0f : wblur);
      float wfade = mask < 0.0f ? 0.0f : (mask > 1.0f ? 1.0f : mask);
      float* o = &out_f[(size_t(y) * w + x) * 3];
      const float* bl = &blur_f[(size_t(y) * w + x) * 3];
      for (int cidx = 0; cidx < 3; ++cidx) {
        float v = o[cidx] + (bl[cidx] - o[cidx]) * wblur;
        v = v + (med[cidx] - v) * wfade;
        v = rint_f(v * 255.0f);
        (*out_u8)[(size_t(y) * w + x) * 3 + cidx] =
            (unsigned char)(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// cv2 INTER_AREA downscale (exact fractional box average), f32 math
void resize_area(const std::vector<unsigned char>& src, int sh, int sw,
                 int th, int tw, float* out) {
  const double sy = double(sh) / th, sx = double(sw) / tw;
  for (int y = 0; y < th; ++y) {
    double fy0 = y * sy, fy1 = (y + 1) * sy;
    int iy0 = int(fy0), iy1 = int(std::ceil(fy1));
    if (iy1 > sh) iy1 = sh;
    for (int x = 0; x < tw; ++x) {
      double fx0 = x * sx, fx1 = (x + 1) * sx;
      int ix0 = int(fx0), ix1 = int(std::ceil(fx1));
      if (ix1 > sw) ix1 = sw;
      double acc[3] = {0, 0, 0}, warea = 0;
      for (int yy = iy0; yy < iy1; ++yy) {
        double wy = 1.0;
        if (yy < fy0) wy -= fy0 - yy;
        if (yy + 1 > fy1) wy -= yy + 1 - fy1;
        for (int xx = ix0; xx < ix1; ++xx) {
          double wx = 1.0;
          if (xx < fx0) wx -= fx0 - xx;
          if (xx + 1 > fx1) wx -= xx + 1 - fx1;
          double wgt = wy * wx;
          const unsigned char* p = &src[(size_t(yy) * sw + xx) * 3];
          acc[0] += wgt * p[0];
          acc[1] += wgt * p[1];
          acc[2] += wgt * p[2];
          warea += wgt;
        }
      }
      float* o = out + (size_t(y) * tw + x) * 3;
      for (int cidx = 0; cidx < 3; ++cidx)
        o[cidx] = float(acc[cidx] / warea) * (1.0f / 255.0f);
    }
  }
}

inline float cubic_w(float d) {  // cv2 bicubic, a = -0.75
  const float a = -0.75f;
  d = d < 0 ? -d : d;
  if (d <= 1.0f) return ((a + 2.0f) * d - (a + 3.0f)) * d * d + 1.0f;
  if (d < 2.0f) return ((a * d - 5.0f * a) * d + 8.0f * a) * d - 4.0f * a;
  return 0.0f;
}

void resize_cubic(const std::vector<unsigned char>& src, int sh, int sw,
                  int th, int tw, float* out) {
  const float sy = float(sh) / th, sx = float(sw) / tw;
  for (int y = 0; y < th; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(std::floor(fy));
    float dy = fy - y0;
    for (int x = 0; x < tw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = int(std::floor(fx));
      float dx = fx - x0;
      float acc[3] = {0, 0, 0};
      for (int ky = -1; ky <= 2; ++ky) {
        int ys = clampi(y0 + ky, 0, sh - 1);
        float wy = cubic_w(ky - dy);
        for (int kx = -1; kx <= 2; ++kx) {
          int xs = clampi(x0 + kx, 0, sw - 1);
          float wgt = wy * cubic_w(kx - dx);
          const unsigned char* p = &src[(size_t(ys) * sw + xs) * 3];
          acc[0] += wgt * p[0];
          acc[1] += wgt * p[1];
          acc[2] += wgt * p[2];
        }
      }
      float* o = out + (size_t(y) * tw + x) * 3;
      for (int cidx = 0; cidx < 3; ++cidx) {
        float v = acc[cidx] * (1.0f / 255.0f);
        o[cidx] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
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

// Dataset-parity loader: decode -> (optional 1px VoxCeleb2.1 border strip)
// -> normalized bbox to integer coords (crop.py bbox_to_integer_coords:
// all four coords scaled by image HEIGHT, floor/ceil, re-squared, +1)
// -> blur-faded reflect101-padded crop -> INTER_AREA/CUBIC resize.
// bboxes: n*4 (l, t, r, b) in [0,1] doubles (floor/ceil boundaries are
// precision-sensitive); has_bbox: n flags (0 -> identity box,
// no border strip).  out: n * out_size^2 * 3 float RGB in [0, 1].
int lpr_load_cropped_batch(void* pool_ptr, const char** paths, int n,
                           const double* bboxes,
                           const unsigned char* has_bbox,
                           int out_size, float* out) {
  Pool* pool = static_cast<Pool*>(pool_ptr);
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t stride = size_t(out_size) * out_size * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      Image img;
      float* dst = out + stride * i;
      if (decode_file(paths[i], &img)) {
        int off = has_bbox[i] ? 1 : 0;
        int H = img.h - 2 * off, W = img.w - 2 * off;
        double l = bboxes[i * 4 + 0], t = bboxes[i * 4 + 1];
        double r = bboxes[i * 4 + 2], b = bboxes[i * 4 + 3];
        // crop.py:36-47 — all coords scaled by the FULL image height
        // (before the border strip; VoxCeleb2.1 frames are square,
        // reproduced as-is), then shifted by -1 for the strip
        // (voxceleb2_segmentation_nolandmarks.py:115-119)
        int tt = int(std::floor(t * img.h)) - off;
        int ll = int(std::floor(l * img.h)) - off;
        int rr = int(std::ceil(r * img.h)) - off;
        int bb = int(std::ceil(b * img.h)) - off;
        bb += (rr - ll) - (bb - tt);
        bb += 1;
        rr += 1;
        std::vector<unsigned char> cropped;
        crop_padded_u8(img, off, off, H, W, tt, ll, bb, rr, &cropped);
        int ch = bb - tt, cw = rr - ll;
        if (out_size > ch)
          resize_cubic(cropped, ch, cw, out_size, out_size, dst);
        else
          resize_area(cropped, ch, cw, out_size, out_size, dst);
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

// uint8 wire-format variant of lpr_load_cropped_batch: identical decode /
// blur-fade crop / resize pipeline, with the final float result quantized
// to uint8 on the loader threads using the wire formula
// floor(v*255 + 0.5) (latentpose_tpu/runners/loop.quantize_batch_u8) —
// the batch then crosses host->device as bytes with no Python-side
// conversion pass.  out: n * out_size^2 * 3 uint8 RGB.
int lpr_load_cropped_batch_u8(void* pool_ptr, const char** paths, int n,
                              const double* bboxes,
                              const unsigned char* has_bbox,
                              int out_size, unsigned char* out) {
  Pool* pool = static_cast<Pool*>(pool_ptr);
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t stride = size_t(out_size) * out_size * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      Image img;
      unsigned char* dst = out + stride * i;
      std::vector<float> tmp(stride);
      bool ok = false;
      if (decode_file(paths[i], &img)) {
        int off = has_bbox[i] ? 1 : 0;
        int H = img.h - 2 * off, W = img.w - 2 * off;
        double l = bboxes[i * 4 + 0], t = bboxes[i * 4 + 1];
        double r = bboxes[i * 4 + 2], b = bboxes[i * 4 + 3];
        int tt = int(std::floor(t * img.h)) - off;
        int ll = int(std::floor(l * img.h)) - off;
        int rr = int(std::ceil(r * img.h)) - off;
        int bb = int(std::ceil(b * img.h)) - off;
        bb += (rr - ll) - (bb - tt);
        bb += 1;
        rr += 1;
        std::vector<unsigned char> cropped;
        crop_padded_u8(img, off, off, H, W, tt, ll, bb, rr, &cropped);
        int ch = bb - tt, cw = rr - ll;
        if (out_size > ch)
          resize_cubic(cropped, ch, cw, out_size, out_size, tmp.data());
        else
          resize_area(cropped, ch, cw, out_size, out_size, tmp.data());
        ok = true;
      }
      if (ok) {
        for (size_t j = 0; j < stride; ++j) {
          float v = tmp[j] * 255.0f + 0.5f;
          dst[j] = (unsigned char)(v < 0.f ? 0.f
                                           : (v > 255.f ? 255.f : v));
        }
      } else {
        std::memset(dst, 0, stride);
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
