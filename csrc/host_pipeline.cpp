// Native host-side image pipeline.
//
// The reference delegates decode/resize/color/flip to the Torch7 `image`
// C library (utilities.lua:205-218, BatchIterator.lua:49-76). This is the
// equivalent native runtime component for the TPU build: libjpeg/libpng
// decode, separable triangle-filter resampling (Pillow-compatible, so the
// Python fallback path produces the same pixels), fused color-space
// conversion + flips + letterbox padding into the fixed compile bucket,
// and a std::thread batch front-end so a whole training batch is prepared
// in one GIL-releasing call.
//
// C ABI (ctypes): see frcnn_tpu/data/native.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- decode

struct DecodeError {};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG to RGB uint8. Returns false on failure.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadCtx* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "eof");
  }
  memcpy(out, ctx->data + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                int* w, int* h) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  PngReadCtx ctx{data, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);          // palette/gray->8bit, tRNS->alpha
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  if (png_get_channels(png, info) != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  out->resize(size_t(*w) * (*h) * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = out->data() + size_t(y) * (*w) * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, std::vector<uint8_t>* out, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 4) {
    fclose(f);
    return false;
  }
  std::vector<uint8_t> buf(n);
  size_t got = fread(buf.data(), 1, n, f);
  fclose(f);
  if (got != size_t(n)) return false;
  if (buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf.data(), n, out, w, h);
  if (buf[0] == 0x89 && buf[1] == 0x50) return decode_png(buf.data(), n, out, w, h);
  // try jpeg then png as a fallback sniff
  if (decode_jpeg(buf.data(), n, out, w, h)) return true;
  return decode_png(buf.data(), n, out, w, h);
}

// ------------------------------------------------------------- resampling

// Pillow-compatible separable triangle (bilinear) resampling with
// antialiasing on downscale: per output coordinate, center = (i+0.5)*scale,
// support = max(scale, 1), weights = triangle((j+0.5-center)/filterscale),
// normalized. Matches PIL Image.BILINEAR on float data.
struct Taps {
  std::vector<int> lo;      // first source index per output index
  std::vector<int> cnt;     // number of taps
  std::vector<float> w;     // taps, row-major [out, max_cnt]
  int max_cnt;
};

Taps make_taps(int src, int dst) {
  Taps t;
  double scale = double(src) / dst;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;
  t.max_cnt = int(ceil(support)) * 2 + 1;
  t.lo.resize(dst);
  t.cnt.resize(dst);
  t.w.assign(size_t(dst) * t.max_cnt, 0.f);
  for (int i = 0; i < dst; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(0, int(center - support + 0.5));
    int hi = std::min(src, int(center + support + 0.5));
    t.lo[i] = lo;
    t.cnt[i] = hi - lo;
    double sum = 0;
    for (int j = lo; j < hi; ++j) {
      double x = (j + 0.5 - center) / filterscale;
      double v = (x < 0 ? -x : x) < 1.0 ? 1.0 - std::fabs(x) : 0.0;
      t.w[size_t(i) * t.max_cnt + (j - lo)] = float(v);
      sum += v;
    }
    if (sum > 0) {
      for (int k = 0; k < t.cnt[i]; ++k)
        t.w[size_t(i) * t.max_cnt + k] = float(t.w[size_t(i) * t.max_cnt + k] / sum);
    }
  }
  return t;
}

// ------------------------------------------------------ color conversions

inline void rgb2yuv_px(float r, float g, float b, float* o) {
  o[0] = 0.299f * r + 0.587f * g + 0.114f * b;
  o[1] = -0.14713f * r - 0.28886f * g + 0.436f * b;
  o[2] = 0.615f * r - 0.51499f * g - 0.10001f * b;
}

inline float srgb_lin(float c) {
  return c > 0.04045f ? powf((c + 0.055f) / 1.055f, 2.4f) : c / 12.92f;
}

inline void rgb2lab_px(float r, float g, float b, float* o) {
  float lr = srgb_lin(std::min(std::max(r, 0.f), 1.f));
  float lg = srgb_lin(std::min(std::max(g, 0.f), 1.f));
  float lb = srgb_lin(std::min(std::max(b, 0.f), 1.f));
  float x = (0.412453f * lr + 0.357580f * lg + 0.180423f * lb) / 0.950456f;
  float y = 0.212671f * lr + 0.715160f * lg + 0.072169f * lb;
  float z = (0.019334f * lr + 0.119193f * lg + 0.950227f * lb) / 1.088754f;
  const float eps = 0.008856f;
  auto f = [&](float v) {
    return v > eps ? cbrtf(v) : 7.787f * v + 16.f / 116.f;
  };
  float fx = f(x), fy = f(y), fz = f(z);
  o[0] = y > eps ? 116.f * fy - 16.f : 903.3f * y;
  o[1] = 500.f * (fx - fy);
  o[2] = 200.f * (fy - fz);
}

inline void rgb2hsv_px(float r, float g, float b, float* o) {
  float mx = std::max({r, g, b});
  float mn = std::min({r, g, b});
  float d = mx - mn;
  float h = 0.f;
  if (d > 0) {
    if (mx == r)
      h = fmodf((g - b) / d, 6.f);
    else if (mx == g)
      h = (b - r) / d + 2.f;
    else
      h = (r - g) / d + 4.f;
    h /= 6.f;
    if (h < 0) h += 1.f;
  }
  o[0] = h;
  o[1] = mx > 0 ? d / mx : 0.f;
  o[2] = mx;
}

enum ColorSpace { CS_RGB = 0, CS_YUV = 1, CS_LAB = 2, CS_HSV = 3 };

// same as utilities.lua:188-203
void find_target_size(int ow, int oh, int tss, int max_px, int* tw, int* th) {
  if (oh < ow) {
    double w = std::min(double(ow) * tss / oh, double(max_px));
    *th = int(floor(double(oh) * w / ow + 0.5));
    *tw = int(floor(w + 0.5));
  } else {
    double h = std::min(double(oh) * tss / ow, double(max_px));
    *tw = int(floor(double(ow) * h / oh + 0.5));
    *th = int(floor(h + 0.5));
  }
}

// Process one decoded image into the canvas. Returns true size via out_*.
void process(const std::vector<uint8_t>& rgb, int sw, int sh, float* canvas,
             int ch, int cw, int tw, int th, int color_space, int hflip,
             int vflip, int* out_h, int* out_w) {
  // Resample AT the full target scale but write only the region that fits
  // the canvas (a top-left crop at the bucket boundary) — same semantics
  // as the Python pipeline's resize-then-clamp, NOT a squash.
  int keep_w = std::min(tw, cw);
  int keep_h = std::min(th, ch);

  // horizontal pass: [sh, sw, 3] u8 -> [sh, keep_w, 3] f32 (full-scale taps)
  Taps tx = make_taps(sw, tw);
  std::vector<float> tmp(size_t(sh) * keep_w * 3);
  const float inv255 = 1.f / 255.f;
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = rgb.data() + size_t(y) * sw * 3;
    float* drow = tmp.data() + size_t(y) * keep_w * 3;
    for (int x = 0; x < keep_w; ++x) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const float* w = tx.w.data() + size_t(x) * tx.max_cnt;
      const uint8_t* s = srow + size_t(tx.lo[x]) * 3;
      for (int k = 0; k < tx.cnt[x]; ++k) {
        acc0 += w[k] * s[3 * k + 0];
        acc1 += w[k] * s[3 * k + 1];
        acc2 += w[k] * s[3 * k + 2];
      }
      drow[3 * x + 0] = acc0 * inv255;
      drow[3 * x + 1] = acc1 * inv255;
      drow[3 * x + 2] = acc2 * inv255;
    }
  }

  // vertical pass + color + flips, written into the padded canvas
  Taps ty = make_taps(sh, th);
  for (int y = 0; y < keep_h; ++y) {
    int oy = vflip ? (keep_h - 1 - y) : y;
    float* drow = canvas + size_t(oy) * cw * 3;
    const float* wrow = ty.w.data() + size_t(y) * ty.max_cnt;
    for (int x = 0; x < keep_w; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.cnt[y]; ++k) {
        const float* s = tmp.data() + size_t(ty.lo[y] + k) * keep_w * 3 + 3 * x;
        acc[0] += wrow[k] * s[0];
        acc[1] += wrow[k] * s[1];
        acc[2] += wrow[k] * s[2];
      }
      float px[3];
      switch (color_space) {
        case CS_YUV: rgb2yuv_px(acc[0], acc[1], acc[2], px); break;
        case CS_LAB: rgb2lab_px(acc[0], acc[1], acc[2], px); break;
        case CS_HSV: rgb2hsv_px(acc[0], acc[1], acc[2], px); break;
        default: px[0] = acc[0]; px[1] = acc[1]; px[2] = acc[2];
      }
      int ox = hflip ? (keep_w - 1 - x) : x;
      drow[3 * ox + 0] = px[0];
      drow[3 * ox + 1] = px[1];
      drow[3 * ox + 2] = px[2];
    }
  }
  *out_h = keep_h;
  *out_w = keep_w;
}

}  // namespace

extern "C" {

// Decode + resize + color + flip + pad one file. canvas must be a zeroed
// [canvas_h, canvas_w, 3] float32 buffer. scale jitter multiplies the base
// resize target (1.0 = none). Returns 0 on success.
int frcnn_load_process(const char* path, float* canvas, int canvas_h,
                       int canvas_w, int target_smaller_side,
                       int max_pixel_size, int color_space, int do_hflip,
                       int do_vflip, float jitter_x, float jitter_y,
                       int* out_h, int* out_w, int* orig_h, int* orig_w) {
  std::vector<uint8_t> rgb;
  int sw = 0, sh = 0;
  if (!decode_file(path, &rgb, &sw, &sh)) return 1;
  if (sw < 1 || sh < 1) return 2;
  *orig_h = sh;
  *orig_w = sw;
  int tw = 0, th = 0;
  find_target_size(sw, sh, target_smaller_side, max_pixel_size, &tw, &th);
  tw = std::max(1, int(lround(tw * jitter_x)));
  th = std::max(1, int(lround(th * jitter_y)));
  memset(canvas, 0, sizeof(float) * size_t(canvas_h) * canvas_w * 3);
  process(rgb, sw, sh, canvas, canvas_h, canvas_w, tw, th, color_space,
          do_hflip, do_vflip, out_h, out_w);
  return 0;
}

// Batch version with a thread pool. paths: n concatenated NUL-terminated
// strings. canvases: [n, canvas_h, canvas_w, 3]. flags: [n, 2] (hflip,
// vflip). jitter: [n, 2]. out_hw: [n, 4] (h, w, orig_h, orig_w). status: [n].
void frcnn_load_process_batch(const char* paths, int n, float* canvases,
                              int canvas_h, int canvas_w,
                              int target_smaller_side, int max_pixel_size,
                              int color_space, const int* flags,
                              const float* jitter, int* out_hw, int* status,
                              int num_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  size_t stride = size_t(canvas_h) * canvas_w * 3;
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  std::vector<int> next(1, 0);
  auto work = [&](int tid) {
    for (int i = tid; i < n; i += nt) {
      status[i] = frcnn_load_process(
          ptrs[i], canvases + stride * i, canvas_h, canvas_w,
          target_smaller_side, max_pixel_size, color_space, flags[2 * i],
          flags[2 * i + 1], jitter[2 * i], jitter[2 * i + 1], &out_hw[4 * i],
          &out_hw[4 * i + 1], &out_hw[4 * i + 2], &out_hw[4 * i + 3]);
    }
  };
  for (int t = 1; t < nt; ++t) threads.emplace_back(work, t);
  work(0);
  for (auto& th : threads) th.join();
}

// Space-to-depth pack of one [H, W, 3] canvas into the TPU serving
// layout (frcnn_tpu/ops/pallas_block0.py::pack_s2d): phase-major
// luminance lum4 [4, Hc, Wc] and phase-interleaved chroma
// chroma [Hc, 8, Wc], Hc = H/2+1, Wc = W/2+1, over pad(canvas, 1).
// The pack is a host-side strided copy so the device only ever sees the
// fused block0 kernel's native layout. H and W must be even.
void frcnn_pack_s2d(const float* canvas, int H, int W, float* lum4,
                    float* chroma) {
  int Hc = H / 2 + 1, Wc = W / 2 + 1;
  memset(lum4, 0, sizeof(float) * 4 * size_t(Hc) * Wc);
  memset(chroma, 0, sizeof(float) * size_t(Hc) * 8 * Wc);
  for (int qy = 0; qy < 2; ++qy) {
    for (int qx = 0; qx < 2; ++qx) {
      int ph = 2 * qy + qx;
      float* lplane = lum4 + size_t(ph) * Hc * Wc;
      for (int i = 0; i < Hc; ++i) {
        int sy = 2 * i + qy - 1;            // source row in the canvas
        if (sy < 0 || sy >= H) continue;
        const float* srow = canvas + size_t(sy) * W * 3;
        float* lrow = lplane + size_t(i) * Wc;
        float* c0 = chroma + (size_t(i) * 8 + 2 * ph) * Wc;
        float* c1 = c0 + Wc;
        int j0 = (qx == 0) ? 1 : 0;         // j with 2j+qx-1 >= 0
        int j1 = std::min(Wc, (W + 1 - qx + 1) / 2);  // 2j+qx-1 < W
        for (int j = j0; j < j1; ++j) {
          const float* px = srow + size_t(2 * j + qx - 1) * 3;
          lrow[j] = px[0];
          c0[j] = px[1];
          c1[j] = px[2];
        }
      }
    }
  }
}

// Batched, threaded pack: canvases [n, H, W, 3] -> lum4 [n, 4, Hc, Wc],
// chroma [n, Hc, 8, Wc].
void frcnn_pack_s2d_batch(const float* canvases, int n, int H, int W,
                          float* lum4, float* chroma, int num_threads) {
  int Hc = H / 2 + 1, Wc = W / 2 + 1;
  size_t in_stride = size_t(H) * W * 3;
  size_t l_stride = size_t(4) * Hc * Wc;
  size_t c_stride = size_t(Hc) * 8 * Wc;
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  auto work = [&](int tid) {
    for (int i = tid; i < n; i += nt)
      frcnn_pack_s2d(canvases + in_stride * i, H, W, lum4 + l_stride * i,
                     chroma + c_stride * i);
  };
  for (int t = 1; t < nt; ++t) threads.emplace_back(work, t);
  work(0);
  for (auto& th : threads) th.join();
}

// Resample only (decoded data in, PIL-compatible), for testing the filter.
void frcnn_resample(const float* src, int sh, int sw, float* dst, int dh,
                    int dw) {
  Taps tx = make_taps(sw, dw);
  Taps ty = make_taps(sh, dh);
  std::vector<float> tmp(size_t(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    for (int x = 0; x < dw; ++x) {
      const float* w = tx.w.data() + size_t(x) * tx.max_cnt;
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < tx.cnt[x]; ++k) {
        const float* s = src + (size_t(y) * sw + tx.lo[x] + k) * 3;
        acc[0] += w[k] * s[0];
        acc[1] += w[k] * s[1];
        acc[2] += w[k] * s[2];
      }
      float* d = tmp.data() + (size_t(y) * dw + x) * 3;
      d[0] = acc[0]; d[1] = acc[1]; d[2] = acc[2];
    }
  }
  for (int y = 0; y < dh; ++y) {
    const float* w = ty.w.data() + size_t(y) * ty.max_cnt;
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.cnt[y]; ++k) {
        const float* s = tmp.data() + (size_t(ty.lo[y] + k) * dw + x) * 3;
        acc[0] += w[k] * s[0];
        acc[1] += w[k] * s[1];
        acc[2] += w[k] * s[2];
      }
      float* d = dst + (size_t(y) * dw + x) * 3;
      d[0] = acc[0]; d[1] = acc[1]; d[2] = acc[2];
    }
  }
}

}  // extern "C"
