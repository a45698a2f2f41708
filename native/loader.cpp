// Native data-loader core: JPEG decode + bilinear resize + letterbox pack.
//
// Role: the C++ runtime under the host data path (the reference leans on
// PIL/libjpeg + OpenCV C++ through Python wrappers — SURVEY.md §2.9; here
// the hot loop is one native call per *batch*, multithreaded with
// std::thread and entirely GIL-free).
//
// Exposed C ABI (consumed via ctypes from
// object_detection_cib_tpu/data/native_loader.py):
//
//   odcib_decode_resize_pad   one JPEG -> (S, S, 3) uint8 canvas (fill 114)
//   odcib_pack_batch          N JPEGs -> (N, S, S, 3) in parallel
//   odcib_resize_pad_raw      raw HWC uint8 -> (S, S, 3) (fake-mode path)
//
// Geometry matches data/reader.py: scale = S / max(h, w), bilinear sample
// (align-corners=false, same convention as cv2.INTER_LINEAR), content at
// the top-left, 114 padding elsewhere; the caller letterbox-centers when
// needed by shifting boxes, identical math either way.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

constexpr uint8_t kFill = 114;

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG byte buffer to RGB. Returns false on corrupt input.
bool decode_jpeg(const uint8_t* buf, long len, std::vector<uint8_t>* out,
                 int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize (cv2.INTER_LINEAR pixel-center convention) of RGB uint8
// from (h, w) to (nh, nw), written into dst at row stride dst_stride px.
void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int nh,
                     int nw, int dst_stride) {
  const float sx = static_cast<float>(w) / nw;
  const float sy = static_cast<float>(h) / nh;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, h - 1);
    int y1c = std::clamp(y0 + 1, 0, h - 1);
    const uint8_t* r0 = src + static_cast<size_t>(y0c) * w * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1c) * w * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dst_stride * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, w - 1);
      int x1c = std::clamp(x0 + 1, 0, w - 1);
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0c * 3 + c] * (1 - wx) + r0[x1c * 3 + c] * wx;
        float bot = r1[x0c * 3 + c] * (1 - wx) + r1[x1c * 3 + c] * wx;
        float v = top * (1 - wy) + bot * wy;
        drow[x * 3 + c] = static_cast<uint8_t>(std::lround(std::clamp(v, 0.f, 255.f)));
      }
    }
  }
}

// Resize to longest-max-size S and write into an SxS canvas (fill kFill).
// Content placed at top-left; actual (nh, nw) returned.
void resize_into_canvas(const uint8_t* src, int h, int w, int target,
                        uint8_t* canvas, int* out_h, int* out_w) {
  std::memset(canvas, kFill, static_cast<size_t>(target) * target * 3);
  const float scale = static_cast<float>(target) / std::max(h, w);
  int nh = std::max(1, static_cast<int>(std::lround(h * scale)));
  int nw = std::max(1, static_cast<int>(std::lround(w * scale)));
  nh = std::min(nh, target);
  nw = std::min(nw, target);
  resize_bilinear(src, h, w, canvas, nh, nw, target);
  *out_h = nh;
  *out_w = nw;
}

}  // namespace

extern "C" {

// One JPEG -> SxS canvas. Returns 0 ok, nonzero on decode failure.
int odcib_decode_resize_pad(const uint8_t* jpeg, long jpeg_len, int target,
                            uint8_t* canvas, int* out_h, int* out_w) {
  std::vector<uint8_t> rgb;
  int h, w;
  if (!decode_jpeg(jpeg, jpeg_len, &rgb, &h, &w)) return 1;
  resize_into_canvas(rgb.data(), h, w, target, canvas, out_h, out_w);
  return 0;
}

// Raw HWC uint8 -> SxS canvas (fake-mode / already-decoded path).
int odcib_resize_pad_raw(const uint8_t* rgb, int h, int w, int target,
                         uint8_t* canvas, int* out_h, int* out_w) {
  resize_into_canvas(rgb, h, w, target, canvas, out_h, out_w);
  return 0;
}

// N JPEGs -> (N, S, S, 3) canvases, multithreaded. jpeg_sizes/offsets
// describe a single concatenated byte blob. sizes_out is (N, 2) int32
// (h, w). Returns number of failed decodes.
int odcib_pack_batch(const uint8_t* blob, const long* offsets,
                     const long* lengths, int n, int target, int num_threads,
                     uint8_t* canvases, int* sizes_out) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* canvas = canvases + static_cast<size_t>(i) * target * target * 3;
      int rc = odcib_decode_resize_pad(blob + offsets[i], lengths[i], target,
                                       canvas, &sizes_out[i * 2],
                                       &sizes_out[i * 2 + 1]);
      if (rc) {
        failures.fetch_add(1);
        sizes_out[i * 2] = sizes_out[i * 2 + 1] = 0;
      }
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // extern "C"
