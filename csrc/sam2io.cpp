// sam2io: native host-side IO/runtime for the TPU SAM2 framework.
//
// Plays the role the reference fills with native code (the ytools C++/CUDA
// executor layer and csrc/connected_components.cu): everything around the
// XLA compute path that is hot on the host —
//
//   * multi-threaded JPEG decode + resize (video frame loading; the
//     reference uses decord/GPU for this, sam2/sam2/utils/misc.py:172-309)
//   * pycoco-style column-major RLE encode/decode (AMG outputs, demo-server
//     mask streaming, SA-V eval)
//   * mask -> bounding box
//
// Exposed as a plain C ABI consumed via ctypes (sam2_opt_tpu/io/native.py).
// Build: make -C csrc   (or automatically on first import).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------
// JPEG decode + bilinear resize
// ---------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to RGB and bilinear-resize into out[size*size*3].
// Uses libjpeg DCT prescaling (1/2, 1/4, 1/8) to avoid decoding full
// resolution when the target is much smaller. Returns 0 on success.
int decode_jpeg_resize(const char* path, uint8_t* out, int out_h, int out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  // volatile malloc'd buffer, not std::vector: a longjmp from the libjpeg
  // error handler would skip a vector's destructor (UB + leak per corrupt
  // JPEG); a volatile pointer survives longjmp and is freed on both paths
  uint8_t* volatile imgbuf = nullptr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    free(imgbuf);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT prescale: pick the smallest scale that keeps >= target size
  int full_w = cinfo.image_width, full_h = cinfo.image_height;
  int denom = 1;
  while (denom < 8 && (full_w / (denom * 2)) >= out_w &&
         (full_h / (denom * 2)) >= out_h) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  imgbuf = (uint8_t*)malloc((size_t)w * h * 3);
  if (!imgbuf) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = imgbuf + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  const uint8_t* img = imgbuf;  // decode done: no more longjmp risk

  // bilinear resize (half-pixel centers) img[h,w,3] -> out[out_h,out_w,3]
  const float sy = (float)h / out_h, sx = (float)w / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    int y1 = std::min(y0 + 1, h - 1);
    float wy = fy - y0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      int x1 = std::min(x0 + 1, w - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = img[((size_t)y0 * w + x0) * 3 + c];
        float v01 = img[((size_t)y0 * w + x1) * 3 + c];
        float v10 = img[((size_t)y1 * w + x0) * 3 + c];
        float v11 = img[((size_t)y1 * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        out[((size_t)oy * out_w + ox) * 3 + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
  free(imgbuf);
  return 0;
}

// Probe a JPEG's dimensions without full decode. Returns 0 on success.
int jpeg_dims(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode a batch of JPEG paths (newline-joined) into out[n, size, size, 3]
// with a worker-thread pool. Returns number of failures.
int decode_jpeg_batch(const char* joined_paths, int n, uint8_t* out,
                      int out_h, int out_w, int num_threads) {
  std::vector<std::string> paths;
  {
    const char* p = joined_paths;
    for (int i = 0; i < n; ++i) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? (size_t)(nl - p) : strlen(p);
      paths.emplace_back(p, len);
      p = nl ? nl + 1 : p + len;
    }
  }
  std::atomic<int> next(0), failures(0);
  const size_t stride = (size_t)out_h * out_w * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (decode_jpeg_resize(paths[i].c_str(), out + stride * i, out_h,
                             out_w) != 0) {
        failures.fetch_add(1);
      }
    }
  };
  int nt = std::max(1, num_threads);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// ---------------------------------------------------------------------
// RLE codec (pycoco uncompressed, column-major) — reference utils/amg.py
// ---------------------------------------------------------------------

// Encode mask[h, w] (row-major uint8, nonzero = fg) into counts (column-major
// run lengths, starting with a background run). Returns number of counts, or
// -1 if out_counts is too small.
int rle_encode(const uint8_t* mask, int h, int w, uint32_t* out_counts,
               int max_counts) {
  int n = 0;
  uint8_t cur = 0;  // starts with background
  uint32_t run = 0;
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) {
      uint8_t v = mask[(size_t)y * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        if (n >= max_counts) return -1;
        out_counts[n++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  if (n >= max_counts) return -1;
  out_counts[n++] = run;
  return n;
}

// Decode column-major counts back into mask[h, w] row-major uint8.
void rle_decode(const uint32_t* counts, int n, int h, int w, uint8_t* out) {
  size_t idx = 0;
  uint8_t val = 0;
  const size_t total = (size_t)h * w;
  for (int i = 0; i < n && idx < total; ++i) {
    for (uint32_t k = 0; k < counts[i] && idx < total; ++k, ++idx) {
      // column-major position idx -> (y, x)
      size_t x = idx / h, y = idx % h;
      out[y * w + x] = val;
    }
    val ^= 1;
  }
}

// ---------------------------------------------------------------------
// mask -> XYXY box ([0,0,0,0] if empty) — reference amg.py:305
// ---------------------------------------------------------------------
void mask_to_box(const uint8_t* mask, int h, int w, int32_t* box) {
  int x0 = w, y0 = h, x1 = -1, y1 = -1;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = mask + (size_t)y * w;
    for (int x = 0; x < w; ++x) {
      if (row[x]) {
        if (x < x0) x0 = x;
        if (x > x1) x1 = x;
        if (y < y0) y0 = y;
        if (y > y1) y1 = y;
      }
    }
  }
  if (x1 < 0) {
    box[0] = box[1] = box[2] = box[3] = 0;
  } else {
    box[0] = x0; box[1] = y0; box[2] = x1; box[3] = y1;
  }
}

}  // extern "C"
