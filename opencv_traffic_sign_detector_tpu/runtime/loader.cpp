// Native data loader: threaded JPEG decode to BGR uint8.
//
// The input pipeline is the framework's host-side runtime (the reference
// leans on cv2.imread per file inside Python loops); here decoding is
// libjpeg + a pthread worker pool, exposed through a C ABI consumed by
// ctypes (runtime/loader.py).  Build: runtime/build.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file into caller-provided BGR buffer (h*w*3).
// Returns 0 on success; fills *out_h/*out_w. If buf is null, only probes
// dimensions.
int decode_one(const char* path, uint8_t* buf, int64_t buf_size,
               int32_t* out_h, int32_t* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  *out_h = h;
  *out_w = w;
  if (!buf) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  if (buf_size < static_cast<int64_t>(h) * w * 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }

  std::vector<uint8_t> row(static_cast<size_t>(w) * cinfo.output_components);
  uint8_t* rp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = buf + static_cast<int64_t>(y) * w * 3;
    // RGB -> BGR swizzle while copying.
    for (int x = 0; x < w; ++x) {
      dst[x * 3 + 0] = rp[x * 3 + 2];
      dst[x * 3 + 1] = rp[x * 3 + 1];
      dst[x * 3 + 2] = rp[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

int tsd_decode_jpeg_bgr(const char* path, uint8_t* buf, int64_t buf_size,
                        int32_t* out_h, int32_t* out_w) {
  return decode_one(path, buf, buf_size, out_h, out_w);
}

// Decode a batch of same-sized JPEGs with a worker pool.
// paths: array of n C strings; buf: n*h*w*3 bytes; status: n ints.
int tsd_decode_jpeg_bgr_batch(const char** paths, int32_t n, uint8_t* buf,
                              int32_t h, int32_t w, int32_t n_threads,
                              int32_t* status) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int32_t> next(0);
  const int64_t frame_bytes = static_cast<int64_t>(h) * w * 3;
  auto worker = [&]() {
    for (;;) {
      const int32_t i = next.fetch_add(1);
      if (i >= n) break;
      int32_t oh = 0, ow = 0;
      const int rc = decode_one(paths[i], buf + frame_bytes * i, frame_bytes,
                                &oh, &ow);
      status[i] = (rc == 0 && oh == h && ow == w) ? 0 : (rc ? rc : -4);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  int bad = 0;
  for (int i = 0; i < n; ++i)
    if (status[i] != 0) ++bad;
  return bad;
}

}  // extern "C"
