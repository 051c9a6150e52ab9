// Native threaded crop-batch decoder for the VPD student data path.
//
// TPU-native replacement for the reference's DataLoader worker *processes*
// (train_vpd_model.py:205-212, apply_vpd_model.py:154-157): the host-side
// hot loop there is per-sample PNG decode + resize. Here one ctypes call
// decodes a whole uint8 batch (rgb crops, optional flow PNGs, optional
// masks) with a libpng-based thread pool — the GIL is released for the
// entire batch, so decode overlaps both the Python sampler and the device
// step without forking workers.
//
// Byte-compat contract with vpd_tpu/data/crops.py:
//   rgb   -> RGB channel order   (cv2.imread + BGR2RGB, crops.py _imread_rgb)
//   flow  -> BGR channel order   (cv2.imread raw, crops.py _imread_raw;
//            consumers read channels [0, 1] = (x, y) flow)
//   mask  -> single gray channel (masks are written single-channel by
//            extract_square_crops; missing masks zero-fill silently,
//            matching the os.path.exists guard in crops.py)
// Resize (when a source is not img_dim x img_dim) is bilinear with
// half-pixel centers, cv2.INTER_LINEAR semantics (float math; cv2's
// fixed-point rounding may differ by +/-1 LSB).

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

bool decode_png(const char* path, png_uint_32 fmt, int channels,
                int out_dim, uint8_t* out) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) {
    png_image_free(&image);
    return false;
  }
  image.format = fmt;
  const int w = static_cast<int>(image.width);
  const int h = static_cast<int>(image.height);
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h * channels);
  if (!png_image_finish_read(&image, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  if (w == out_dim && h == out_dim) {
    memcpy(out, buf.data(), buf.size());
    return true;
  }
  const float sx = static_cast<float>(w) / out_dim;
  const float sy = static_cast<float>(h) / out_dim;
  for (int y = 0; y < out_dim; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(floorf(fy));
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.f; }
    if (y0 > h - 1) { y0 = h - 1; wy = 0.f; }
    const int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    for (int x = 0; x < out_dim; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(floorf(fx));
      float wx = fx - x0;
      if (x0 < 0) { x0 = 0; wx = 0.f; }
      if (x0 > w - 1) { x0 = w - 1; wx = 0.f; }
      const int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      const uint8_t* p00 = &buf[(static_cast<size_t>(y0) * w + x0) * channels];
      const uint8_t* p01 = &buf[(static_cast<size_t>(y0) * w + x1) * channels];
      const uint8_t* p10 = &buf[(static_cast<size_t>(y1) * w + x0) * channels];
      const uint8_t* p11 = &buf[(static_cast<size_t>(y1) * w + x1) * channels];
      uint8_t* dst = &out[(static_cast<size_t>(y) * out_dim + x) * channels];
      for (int c = 0; c < channels; ++c) {
        const float v = (1.f - wy) * ((1.f - wx) * p00[c] + wx * p01[c]) +
                        wy * ((1.f - wx) * p10[c] + wx * p11[c]);
        dst[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode n (rgb[, flow][, mask]) PNG triples into caller-owned uint8
// buffers of shape (n, img_dim, img_dim, {3, 3, 1}). Any of the three
// path arrays (with its buffer) may be null. Returns the number of
// required decodes that FAILED (rgb + flow; those rows are zero-filled).
// Mask decode failures zero-fill silently and are not counted.
int64_t vpd_decode_crops(const char* const* rgb_paths,
                         const char* const* flow_paths,
                         const char* const* mask_paths, int64_t n,
                         int32_t img_dim, int32_t n_threads,
                         uint8_t* rgb_out, uint8_t* flow_out,
                         uint8_t* mask_out) {
  const size_t rgb_sz = static_cast<size_t>(img_dim) * img_dim * 3;
  const size_t mask_sz = static_cast<size_t>(img_dim) * img_dim;
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> failures(0);
  auto work = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      if (rgb_paths && rgb_out) {
        uint8_t* dst = rgb_out + i * rgb_sz;
        if (!decode_png(rgb_paths[i], PNG_FORMAT_RGB, 3, img_dim, dst)) {
          memset(dst, 0, rgb_sz);
          failures.fetch_add(1);
        }
      }
      if (flow_paths && flow_out) {
        uint8_t* dst = flow_out + i * rgb_sz;
        if (!decode_png(flow_paths[i], PNG_FORMAT_BGR, 3, img_dim, dst)) {
          memset(dst, 0, rgb_sz);
          failures.fetch_add(1);
        }
      }
      if (mask_paths && mask_out) {
        uint8_t* dst = mask_out + i * mask_sz;
        if (!decode_png(mask_paths[i], PNG_FORMAT_GRAY, 1, img_dim, dst)) {
          memset(dst, 0, mask_sz);
        }
      }
    }
  };
  const int tn = n_threads > 0 ? n_threads : 1;
  if (tn == 1 || n <= 1) {
    work();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(tn);
    for (int t = 0; t < tn; ++t) threads.emplace_back(work);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

// Pack n RGB crops (n, h, w, 3) uint8 into YUV 4:2:0 planes
// (n, h*w + 2*(h/2)*(w/2)) for host->device upload (halves the bytes on
// tunnel-attached hosts; see vpd_tpu/data/upload_codec.py). Bit-exact
// with encode_yuv420_numpy's float32 spec: per-pixel float32 luma, 2x2
// integer chroma sums * 0.25f (exactly representable), fixed op order,
// round-half-even (nearbyintf, default FE_TONEAREST), clip to [0, 255].
int64_t vpd_yuv420_pack(const uint8_t* rgb, int64_t n, int32_t h,
                        int32_t w, int32_t n_threads, uint8_t* out) {
  if (h % 2 || w % 2) return -1;
  const size_t in_sz = static_cast<size_t>(h) * w * 3;
  const size_t n_y = static_cast<size_t>(h) * w;
  const size_t n_c = static_cast<size_t>(h / 2) * (w / 2);
  const size_t out_sz = n_y + 2 * n_c;
  const float kr = 0.299f, kg = 0.587f, kb = 0.114f;
  const float us = 0.564f, vs = 0.713f;
  auto q = [](float z) -> uint8_t {
    z = nearbyintf(z);
    if (z < 0.f) z = 0.f;
    if (z > 255.f) z = 255.f;
    return static_cast<uint8_t>(z);
  };
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      const uint8_t* src = rgb + i * in_sz;
      uint8_t* yp = out + i * out_sz;
      uint8_t* up = yp + n_y;
      uint8_t* vp = up + n_c;
      for (int y = 0; y < h; y += 2) {
        const uint8_t* row0 = src + static_cast<size_t>(y) * w * 3;
        const uint8_t* row1 = row0 + static_cast<size_t>(w) * 3;
        uint8_t* y0 = yp + static_cast<size_t>(y) * w;
        uint8_t* y1 = y0 + w;
        uint8_t* uc = up + static_cast<size_t>(y / 2) * (w / 2);
        uint8_t* vc = vp + static_cast<size_t>(y / 2) * (w / 2);
        for (int x = 0; x < w; x += 2) {
          const uint8_t* p00 = row0 + static_cast<size_t>(x) * 3;
          const uint8_t* p01 = p00 + 3;
          const uint8_t* p10 = row1 + static_cast<size_t>(x) * 3;
          const uint8_t* p11 = p10 + 3;
          y0[x] = q(kr * p00[0] + kg * p00[1] + kb * p00[2]);
          y0[x + 1] = q(kr * p01[0] + kg * p01[1] + kb * p01[2]);
          y1[x] = q(kr * p10[0] + kg * p10[1] + kb * p10[2]);
          y1[x + 1] = q(kr * p11[0] + kg * p11[1] + kb * p11[2]);
          // 2x2 integer sums * 0.25f are exact in float32 (<= 1020)
          const float r2 = 0.25f * (p00[0] + p01[0] + p10[0] + p11[0]);
          const float g2 = 0.25f * (p00[1] + p01[1] + p10[1] + p11[1]);
          const float b2 = 0.25f * (p00[2] + p01[2] + p10[2] + p11[2]);
          const float y2 = kr * r2 + kg * g2 + kb * b2;
          uc[x / 2] = q((b2 - y2) * us + 128.0f);
          vc[x / 2] = q((r2 - y2) * vs + 128.0f);
        }
      }
    }
  };
  const int tn = n_threads > 0 ? n_threads : 1;
  if (tn == 1 || n <= 1) {
    work();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(tn);
    for (int t = 0; t < tn; ++t) threads.emplace_back(work);
    for (auto& t : threads) t.join();
  }
  return 0;
}

// Luma-only variant of vpd_yuv420_pack: (n, h, w, 3) uint8 RGB ->
// (n, h*w) uint8 Y planes (1/3 the bytes; the y8 flow-upload codec,
// whose consumer grays its input anyway). Bit-exact with the Y plane
// of vpd_yuv420_pack and encode_yuv420_numpy; no even-dim requirement.
int64_t vpd_luma_pack(const uint8_t* rgb, int64_t n, int32_t h,
                      int32_t w, int32_t n_threads, uint8_t* out) {
  const size_t in_sz = static_cast<size_t>(h) * w * 3;
  const size_t n_y = static_cast<size_t>(h) * w;
  const float kr = 0.299f, kg = 0.587f, kb = 0.114f;
  auto q = [](float z) -> uint8_t {
    z = nearbyintf(z);
    if (z < 0.f) z = 0.f;
    if (z > 255.f) z = 255.f;
    return static_cast<uint8_t>(z);
  };
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      const uint8_t* src = rgb + i * in_sz;
      uint8_t* yp = out + i * n_y;
      for (size_t px = 0; px < n_y; ++px) {
        const uint8_t* p = src + px * 3;
        yp[px] = q(kr * p[0] + kg * p[1] + kb * p[2]);
      }
    }
  };
  const int tn = n_threads > 0 ? n_threads : 1;
  if (tn == 1 || n <= 1) {
    work();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(tn);
    for (int t = 0; t < tn; ++t) threads.emplace_back(work);
    for (auto& t : threads) t.join();
  }
  return 0;
}

}  // extern "C"
