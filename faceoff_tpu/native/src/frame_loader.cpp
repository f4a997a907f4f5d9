// Native data-loader core: multi-threaded JPEG decode + pad-to-square +
// bilinear resize, writing directly into a caller-owned contiguous batch
// buffer (zero Python-side copies or stacking).
//
// The reference's input path decodes and resizes frames one at a time in
// Python workers (skimage/cv2); this is the framework's native equivalent
// (C API consumed via ctypes, see faceoff_tpu/native/__init__.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 frame_loader.cpp -ljpeg -lpthread
//
// API:
//   int fo_load_frames(const char** paths, int n_frames, int resolution,
//                      unsigned char* out, int n_threads);
//     out: n_frames * resolution * resolution * 3 bytes, RGB.
//     Returns 0 on success, else the 1-based index of the first frame
//     that failed to decode.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

// Decode one JPEG file into an RGB buffer. Returns true on success.
bool decode_jpeg(const char* path, std::vector<unsigned char>& pixels,
                 int& width, int& height) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  width = cinfo.output_width;
  height = cinfo.output_height;
  pixels.resize(static_cast<size_t>(width) * height * 3);

  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        pixels.data() + static_cast<size_t>(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Pad-to-square (zeros) + bilinear resize to res x res, RGB in/out.
// Mirrors faceoff_tpu.data.geometry.resize_frame: the shorter axis is
// centred inside a square of the longer axis's size. Separable
// implementation: horizontal pass into a float row buffer, then vertical
// blend — tap indices/weights precomputed per output column so the inner
// loops are branch-free and auto-vectorizable.
void pad_resize(const unsigned char* src, int w, int h, int res,
                unsigned char* dst) {
  // fast path: already the right square size
  if (w == res && h == res) {
    std::memcpy(dst, src, static_cast<size_t>(res) * res * 3);
    return;
  }

  const int side = w > h ? w : h;
  const int pad_x = (side - w) / 2;
  const int pad_y = (side - h) / 2;
  const float scale = static_cast<float>(side) / res;

  // per-output-column taps (clamped; weight 0 when outside the image)
  std::vector<int> x0(res), x1(res);
  std::vector<float> w0(res), w1(res);
  for (int ox = 0; ox < res; ++ox) {
    const float sx = (ox + 0.5f) * scale - 0.5f - pad_x;
    const int xi = static_cast<int>(std::floor(sx));
    const float fx = sx - xi;
    const bool in0 = xi >= 0 && xi < w;
    const bool in1 = xi + 1 >= 0 && xi + 1 < w;
    x0[ox] = in0 ? xi : 0;
    x1[ox] = in1 ? xi + 1 : 0;
    w0[ox] = in0 ? (1 - fx) : 0.f;
    w1[ox] = in1 ? fx : 0.f;
  }

  // horizontal pass for two source rows at a time, cached by row index
  std::vector<float> row_a(res * 3), row_b(res * 3);
  int cached_a = -2, cached_b = -2;

  auto hpass = [&](int yy, std::vector<float>& out_row) {
    if (yy < 0 || yy >= h) {
      std::fill(out_row.begin(), out_row.end(), 0.f);
      return;
    }
    const unsigned char* row = src + static_cast<size_t>(yy) * w * 3;
    for (int ox = 0; ox < res; ++ox) {
      const float a = w0[ox], b = w1[ox];
      const unsigned char* p0 = row + x0[ox] * 3;
      const unsigned char* p1 = row + x1[ox] * 3;
      out_row[ox * 3 + 0] = a * p0[0] + b * p1[0];
      out_row[ox * 3 + 1] = a * p0[1] + b * p1[1];
      out_row[ox * 3 + 2] = a * p0[2] + b * p1[2];
    }
  };

  for (int oy = 0; oy < res; ++oy) {
    const float sy = (oy + 0.5f) * scale - 0.5f - pad_y;
    const int y0i = static_cast<int>(std::floor(sy));
    const float fy = sy - y0i;

    if (cached_a != y0i) {
      if (cached_b == y0i) {
        std::swap(row_a, row_b);
        std::swap(cached_a, cached_b);
      } else {
        hpass(y0i, row_a);
        cached_a = y0i;
      }
    }
    if (cached_b != y0i + 1) {
      hpass(y0i + 1, row_b);
      cached_b = y0i + 1;
    }

    unsigned char* out_row = dst + static_cast<size_t>(oy) * res * 3;
    const float wa = 1 - fy, wb = fy;
    for (int i = 0; i < res * 3; ++i) {
      const float r = wa * row_a[i] + wb * row_b[i] + 0.5f;
      out_row[i] =
          static_cast<unsigned char>(r < 0 ? 0 : (r > 255 ? 255 : r));
    }
  }
}

}  // namespace

extern "C" {

int fo_load_frames(const char** paths, int n_frames, int resolution,
                   unsigned char* out, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n_frames) n_threads = n_frames;
  if (n_threads < 1) n_threads = 1;

  std::atomic<int> next{0};
  std::atomic<int> failed{0};
  const size_t frame_bytes =
      static_cast<size_t>(resolution) * resolution * 3;

  auto worker = [&]() {
    std::vector<unsigned char> pixels;
    int w = 0, h = 0;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n_frames) return;
      if (!decode_jpeg(paths[i], pixels, w, h)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        std::memset(out + frame_bytes * i, 0, frame_bytes);
        continue;
      }
      pad_resize(pixels.data(), w, h, resolution, out + frame_bytes * i);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
