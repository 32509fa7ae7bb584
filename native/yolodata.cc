// yolodata — native data-loader core for yolov3_tpu.
//
// The reference leans on tf.data's C++ runtime for its input pipeline; this
// is the equivalent native component for this framework: TFRecord framing
// with hardware CRC32C, libjpeg decode, and bilinear resize with
// tf.image.resize semantics (half-pixel centers, no antialias). Exposed as
// a plain C ABI consumed through ctypes (yolov3_tpu/data/native.py); every
// entry point releases the GIL by construction (no Python here), so a
// Python thread pool scales decode across cores.
//
// Build: see native/Makefile (g++ -O3 -shared -ljpeg).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <csetjmp>
#include <cstdio>
#include <vector>

#include <jpeglib.h>

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// crc32c (Castagnoli) — SSE4.2 hardware path with table fallback
// ---------------------------------------------------------------------------

// Built by a static initializer: concurrent first calls from the Python
// thread pool (parse_tfrecords) must not race a lazy check-then-write —
// on weak-memory platforms (the very ones taking this non-SSE fallback) a
// reader could see the done flag before the table writes.
struct CrcTable {
  uint32_t t[256];
  CrcTable() {
    const uint32_t poly = 0x82F63B78u;
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t crc = i;
      for (int k = 0; k < 8; k++) crc = (crc >> 1) ^ (poly & (0u - (crc & 1)));
      t[i] = crc;
    }
  }
};
static const CrcTable crc_table;

uint32_t yolodata_crc32c(const uint8_t* data, uint64_t n) {
  uint32_t crc = 0xFFFFFFFFu;
#if defined(__SSE4_2__)
  uint64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t chunk;
    memcpy(&chunk, data + i, 8);
    crc = (uint32_t)_mm_crc32_u64(crc, chunk);
  }
  for (; i < n; i++) crc = _mm_crc32_u8(crc, data[i]);
#else
  for (uint64_t i = 0; i < n; i++)
    crc = crc_table.t[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
#endif
  return crc ^ 0xFFFFFFFFu;
}

uint32_t yolodata_masked_crc(const uint8_t* data, uint64_t n) {
  uint32_t crc = yolodata_crc32c(data, n);
  return (uint32_t)(((crc >> 15) | (crc << 17)) + 0xA282EAD8u);
}

// ---------------------------------------------------------------------------
// TFRecord framing: scan record offsets/lengths in a mapped buffer
// ---------------------------------------------------------------------------

// Fills offsets[i], lengths[i] for up to max_records records. Returns the
// record count, or a negative error: -1 truncated, -2 length-CRC mismatch,
// -3 data-CRC mismatch (when validate != 0).
int64_t yolodata_scan_tfrecord(const uint8_t* buf, uint64_t size,
                               uint64_t* offsets, uint64_t* lengths,
                               int64_t max_records, int validate) {
  uint64_t pos = 0;
  int64_t count = 0;
  while (pos < size && count < max_records) {
    if (pos + 12 > size) return -1;
    uint64_t len;
    memcpy(&len, buf + pos, 8);
    uint32_t len_crc;
    memcpy(&len_crc, buf + pos + 8, 4);
    if (validate && yolodata_masked_crc(buf + pos, 8) != len_crc) return -2;
    // overflow-safe form of pos + 12 + len + 4 > size: a corrupt 8-byte
    // length near UINT64_MAX would wrap the sum below size and send the
    // data-CRC memcpy through a wild pointer
    if (size - pos < 16 || len > size - pos - 16) return -1;
    if (validate) {
      uint32_t data_crc;
      memcpy(&data_crc, buf + pos + 12 + len, 4);
      if (yolodata_masked_crc(buf + pos + 12, len) != data_crc) return -3;
    }
    offsets[count] = pos + 12;
    lengths[count] = len;
    count++;
    pos += 12 + len + 4;
  }
  return count;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) with error trampoline
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = (JpegErr*)cinfo->err;
  longjmp(err->jump, 1);
}

// Decode JPEG to RGB uint8. Returns 0 on success, fills *w/*h. The output
// buffer must hold max_out bytes; fails with -2 if the image is larger.
int yolodata_decode_jpeg(const uint8_t* data, uint64_t n, uint8_t* out,
                         uint64_t max_out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  uint64_t need = (uint64_t)cinfo.output_width * cinfo.output_height * 3;
  if (need > max_out) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  uint64_t stride = (uint64_t)cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (uint64_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// Bilinear resize — tf.image.resize default semantics
// (half_pixel_centers=True, antialias=False), uint8 HWC in → float32 out
// ---------------------------------------------------------------------------

static void resample_axis(int src, int dst, std::vector<int>& lo,
                          std::vector<int>& hi, std::vector<float>& frac) {
  lo.resize(dst); hi.resize(dst); frac.resize(dst);
  if (dst == src) {
    for (int i = 0; i < dst; i++) { lo[i] = hi[i] = i; frac[i] = 0.f; }
    return;
  }
  double scale = (double)src / dst;
  for (int i = 0; i < dst; i++) {
    double coord = (i + 0.5) * scale - 0.5;
    double fl = std::floor(coord);
    int l = (int)fl;
    if (l < 0) l = 0;
    int hgh = l + 1;
    if (hgh > src - 1) hgh = src - 1;
    lo[i] = l; hi[i] = hgh;
    // TF clamps the fractional weight to 0 below the first sample
    frac[i] = coord < 0 ? 0.f : (float)(coord - fl);
  }
}

// scale: multiply output by this (e.g. 1/255). out: (out_h, out_w, 3) f32.
int yolodata_resize_bilinear(const uint8_t* img, int h, int w, int out_h,
                             int out_w, float scale, float* out) {
  std::vector<int> ylo, yhi, xlo, xhi;
  std::vector<float> yf, xf;
  resample_axis(h, out_h, ylo, yhi, yf);
  resample_axis(w, out_w, xlo, xhi, xf);

  std::vector<float> rows((size_t)w * 3);
  for (int oy = 0; oy < out_h; oy++) {
    const uint8_t* top = img + (size_t)ylo[oy] * w * 3;
    const uint8_t* bot = img + (size_t)yhi[oy] * w * 3;
    float fy = yf[oy];
    for (int x = 0; x < w * 3; x++)
      rows[x] = top[x] + (bot[x] - (float)top[x]) * fy;
    float* orow = out + (size_t)oy * out_w * 3;
    for (int ox = 0; ox < out_w; ox++) {
      const float* l = &rows[(size_t)xlo[ox] * 3];
      const float* r = &rows[(size_t)xhi[ox] * 3];
      float fx = xf[ox];
      orow[ox * 3 + 0] = (l[0] + (r[0] - l[0]) * fx) * scale;
      orow[ox * 3 + 1] = (l[1] + (r[1] - l[1]) * fx) * scale;
      orow[ox * 3 + 2] = (l[2] + (r[2] - l[2]) * fx) * scale;
    }
  }
  return 0;
}

// Fused: JPEG bytes → decoded → resized float32 (out_h, out_w, 3).
// scratch must hold max_pixels*3 bytes for the decode.
int yolodata_decode_resize(const uint8_t* data, uint64_t n, uint8_t* scratch,
                           uint64_t scratch_size, int out_h, int out_w,
                           float scale, float* out) {
  int w = 0, h = 0;
  int rc = yolodata_decode_jpeg(data, n, scratch, scratch_size, &w, &h);
  if (rc != 0) return rc;
  return yolodata_resize_bilinear(scratch, h, w, out_h, out_w, scale, out);
}

}  // extern "C"
