// Threaded host-side image pipeline for the face-recognition datasets.
//
// Native replacement for the role OpenCV plays in the reference's
// opensphere data layer (opensphere/dataset/utils.py:13-37: imread ->
// BGR->RGB -> optional 5-pt similarity warpAffine -> [-1,1] float ->
// random horizontal flip). The Python/cv2 loop decodes one image at a
// time on one core; at batch 512 (opensphere train configs) that is the
// input bottleneck of facerec training. This module decodes JPEG/PNG with
// libjpeg/libpng on a pthread pool and fuses decode + bilinear affine
// warp + normalize + flip into one pass over the output buffer.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 imageloader.cpp -ljpeg -lpng -lpthread
// ctypes binding: imageloader_lib.py.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3
  int h = 0, w = 0;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const char* path, Image* out) {
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) return false;
  img.format = PNG_FORMAT_RGB;
  out->w = img.width;
  out->h = img.height;
  out->rgb.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out->rgb.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool decode_any(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    fclose(f);
    return decode_png(path, out);
  }
  rewind(f);
  bool ok = decode_jpeg(f, out);
  fclose(f);
  return ok;
}

// Sample src (RGB u8) at float coords with bilinear interp, border 0.
inline void sample_bilinear(const Image& src, float x, float y, float* px) {
  int x0 = int(std::floor(x)), y0 = int(std::floor(y));
  float fx = x - x0, fy = y - y0;
  for (int c = 0; c < 3; ++c) px[c] = 0.f;
  for (int dy = 0; dy < 2; ++dy) {
    int yy = y0 + dy;
    if (yy < 0 || yy >= src.h) continue;
    float wy = dy ? fy : 1.f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      int xx = x0 + dx;
      if (xx < 0 || xx >= src.w) continue;
      float wxy = wy * (dx ? fx : 1.f - fx);
      const uint8_t* p = src.rgb.data() + (size_t(yy) * src.w + xx) * 3;
      for (int c = 0; c < 3; ++c) px[c] += wxy * p[c];
    }
  }
}

// One item: decode `path`; warp with the 2x3 FORWARD src->dst affine `mat`
// (cv2.warpAffine semantics: we invert and sample) or plain resize when
// mat == nullptr; normalize to [-1,1]; optional horizontal flip.
int load_one(const char* path, const float* mat, bool flip, int out_h,
             int out_w, float* out) {
  Image img;
  if (!decode_any(path, &img)) return 1;

  // fast path: no warp and already at target size -> fused normalize(+flip)
  if (!mat && img.h == out_h && img.w == out_w) {
    const uint8_t* src = img.rgb.data();
    for (int y = 0; y < out_h; ++y) {
      const uint8_t* srow = src + size_t(y) * out_w * 3;
      float* drow = out + size_t(y) * out_w * 3;
      if (flip) {
        for (int x = 0; x < out_w; ++x) {
          const uint8_t* p = srow + size_t(out_w - 1 - x) * 3;
          float* d = drow + size_t(x) * 3;
          d[0] = (p[0] - 127.5f) / 127.5f;
          d[1] = (p[1] - 127.5f) / 127.5f;
          d[2] = (p[2] - 127.5f) / 127.5f;
        }
      } else {
        for (int k = 0; k < out_w * 3; ++k)
          drow[k] = (srow[k] - 127.5f) / 127.5f;
      }
    }
    return 0;
  }

  float inv[6];
  if (mat) {
    float a = mat[0], b = mat[1], c = mat[2];
    float d = mat[3], e = mat[4], f = mat[5];
    float det = a * e - b * d;
    if (std::fabs(det) < 1e-12f) return 2;
    inv[0] = e / det;
    inv[1] = -b / det;
    inv[2] = (b * f - e * c) / det;
    inv[3] = -d / det;
    inv[4] = a / det;
    inv[5] = (d * c - a * f) / det;
  } else {
    // pure resize mapping dst pixel centers onto src (align-corners-free,
    // matches cv2.resize INTER_LINEAR coordinate convention)
    float sx = float(img.w) / out_w, sy = float(img.h) / out_h;
    inv[0] = sx; inv[1] = 0.f; inv[2] = 0.5f * sx - 0.5f;
    inv[3] = 0.f; inv[4] = sy; inv[5] = 0.5f * sy - 0.5f;
  }

  for (int y = 0; y < out_h; ++y) {
    for (int x = 0; x < out_w; ++x) {
      float sxf = inv[0] * x + inv[1] * y + inv[2];
      float syf = inv[3] * x + inv[4] * y + inv[5];
      float px[3];
      sample_bilinear(img, sxf, syf, px);
      int ox = flip ? (out_w - 1 - x) : x;
      float* dst = out + (size_t(y) * out_w + ox) * 3;
      for (int c = 0; c < 3; ++c) dst[c] = (px[c] - 127.5f) / 127.5f;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// paths: N C-strings. mats: nullptr or [N,6] f32 forward affines (rows with
// all-zero entries mean "no warp" for that item). flips: nullptr or [N] u8.
// out: [N, out_h, out_w, 3] f32. statuses: [N] int (0 ok). Returns count of
// failures.
int fd_load_batch(const char** paths, int n, const float* mats,
                  const uint8_t* flips, int out_h, int out_w, int n_threads,
                  float* out, int* statuses) {
  std::atomic<int> next(0), failures(0);
  size_t stride = size_t(out_h) * out_w * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const float* m = nullptr;
      if (mats) {
        const float* row = mats + size_t(i) * 6;
        bool nonzero = false;
        for (int k = 0; k < 6; ++k) nonzero |= (row[k] != 0.f);
        if (nonzero) m = row;
      }
      bool flip = flips && flips[i];
      int rc = load_one(paths[i], m, flip, out_h, out_w, out + stride * i);
      statuses[i] = rc;
      if (rc) failures.fetch_add(1);
    }
  };
  int hw = int(std::thread::hardware_concurrency());
  if (hw > 0 && n_threads > hw) n_threads = hw;  // 1-core boxes: no spin
  int nt = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
