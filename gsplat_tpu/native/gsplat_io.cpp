// Native data-loading runtime for gsplat_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this is the host-side IO runtime
// around it: COLMAP binary parsing and a threaded image decode/resize
// pipeline (libjpeg/libpng + Lanczos-3), replacing the reference's
// NerfUtils.jl/Images.jl host loaders (reference: src/dataset.jl:7-219).
// Exposed through ctypes (gsplat_tpu/native/__init__.py); the pure-Python
// loaders remain the semantic oracle and fallback.
//
// Build: g++ -O3 -shared -fPIC gsplat_io.cpp -o libgsplat_io.so -ljpeg -lpng -lpthread
//
// All entry points return 0 on success, negative on failure. Two-call
// protocol for parsers: first call with null output buffers fills counts,
// second call fills caller-allocated buffers.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

// ---------------------------------------------------------------------------
// COLMAP binary parsers (format: cameras.bin / images.bin / points3D.bin)
// ---------------------------------------------------------------------------

static const int kCameraModelParams[11] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};

struct Reader {
  FILE* f;
  bool ok = true;
  explicit Reader(const char* path) { f = fopen(path, "rb"); ok = f != nullptr; }
  ~Reader() { if (f) fclose(f); }
  template <typename T> T get() {
    T v{};
    if (fread(&v, sizeof(T), 1, f) != 1) ok = false;
    return v;
  }
  void skip(long n) { if (fseek(f, n, SEEK_CUR) != 0) ok = false; }
};

// cameras.bin -> per camera: id, model_id, width, height, params[12] (padded)
extern "C" int colmap_read_cameras(const char* path, int64_t* n_out,
                        int32_t* ids, int32_t* models,
                        int64_t* wh, double* params /* (n, 12) */) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  *n_out = (int64_t)n;
  if (!ids) return r.ok ? 0 : -2;
  for (uint64_t i = 0; i < n; i++) {
    ids[i] = r.get<int32_t>();
    int32_t model = r.get<int32_t>();
    models[i] = model;
    wh[2 * i] = (int64_t)r.get<uint64_t>();
    wh[2 * i + 1] = (int64_t)r.get<uint64_t>();
    int np = (model >= 0 && model <= 10) ? kCameraModelParams[model] : 0;
    if (np == 0) return -3;
    for (int p = 0; p < 12; p++) params[12 * i + p] = 0.0;
    for (int p = 0; p < np; p++) params[12 * i + p] = r.get<double>();
    if (!r.ok) return -2;
  }
  return 0;
}

// images.bin -> per image: id, qvec(4), tvec(3), camera_id, name (2D skipped)
extern "C" int colmap_read_images(const char* path, int64_t* n_out,
                       int32_t* ids, double* qvecs /* (n,4) */,
                       double* tvecs /* (n,3) */, int32_t* cam_ids,
                       char* names /* (n, 256) */) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  *n_out = (int64_t)n;
  if (!ids) return r.ok ? 0 : -2;
  for (uint64_t i = 0; i < n; i++) {
    ids[i] = r.get<int32_t>();
    for (int k = 0; k < 4; k++) qvecs[4 * i + k] = r.get<double>();
    for (int k = 0; k < 3; k++) tvecs[3 * i + k] = r.get<double>();
    cam_ids[i] = r.get<int32_t>();
    int pos = 0;
    char* dst = names + 256 * i;
    while (true) {
      int c = fgetc(r.f);
      if (c == EOF) return -2;
      if (c == 0) break;
      if (pos < 255) dst[pos++] = (char)c;
    }
    dst[pos] = 0;
    uint64_t n2d = r.get<uint64_t>();
    r.skip((long)(24 * n2d));  // x f64, y f64, point3D_id i64
    if (!r.ok) return -2;
  }
  return 0;
}

// points3D.bin -> xyz (n,3) f64, rgb (n,3) u8
extern "C" int colmap_read_points(const char* path, int64_t* n_out,
                       double* xyz, uint8_t* rgb) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  *n_out = (int64_t)n;
  if (!xyz) return r.ok ? 0 : -2;
  for (uint64_t i = 0; i < n; i++) {
    r.get<uint64_t>();  // point id
    for (int k = 0; k < 3; k++) xyz[3 * i + k] = r.get<double>();
    for (int k = 0; k < 3; k++) rgb[3 * i + k] = r.get<uint8_t>();
    r.get<double>();  // reprojection error
    uint64_t track = r.get<uint64_t>();
    r.skip((long)(8 * track));
    if (!r.ok) return -2;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Image decode (libjpeg / libpng) + Lanczos-3 resize, f32 RGB HWC in [0,1]
// ---------------------------------------------------------------------------

struct DecodedImage {
  std::vector<uint8_t> rgb;  // (h, w, 3)
  int w = 0, h = 0;
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = (JpegErr*)cinfo->err;
  longjmp(e->jb, 1);
}

static DecodedImage decode_jpeg(FILE* f) {
  DecodedImage out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.rgb.resize((size_t)out.w * out.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.rgb.data() + (size_t)cinfo.output_scanline * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

static DecodedImage decode_png(FILE* f) {
  DecodedImage out;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return out;
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return out;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) {
    png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != (size_t)w * 3) {
    // Transform chain didn't land on tight 8-bit RGB rows; bail rather
    // than write past the row buffers (caller falls back to PIL).
    png_destroy_read_struct(&png, &info, nullptr);
    return out;
  }
  out.w = (int)w;
  out.h = (int)h;
  out.rgb.resize((size_t)w * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out.rgb.data() + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  out.ok = true;
  return out;
}

static DecodedImage decode_file(const char* path) {
  DecodedImage out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    out = decode_jpeg(f);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    out = decode_png(f);
  }
  fclose(f);
  return out;
}

// Separable Lanczos-3 resample of one axis (matches PIL's LANCZOS filter
// family: a=3 windowed sinc, support scaled by the downscale factor).
static void lanczos_axis(const float* src, float* dst, int in_n, int out_n,
                         int stride_in, int stride_out, int lines,
                         int line_stride_in, int line_stride_out, int ch) {
  double scale = (double)in_n / out_n;
  double support = scale > 1.0 ? 3.0 * scale : 3.0;
  auto lanczos = [](double x) -> double {
    if (x == 0.0) return 1.0;
    if (x <= -3.0 || x >= 3.0) return 0.0;
    double px = M_PI * x;
    return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
  };
  std::vector<double> weights;
  std::vector<int> bounds(2 * out_n);
  std::vector<std::vector<double>> wtab(out_n);
  for (int o = 0; o < out_n; o++) {
    double center = (o + 0.5) * scale;
    int lo = (int)std::floor(center - support);
    int hi = (int)std::ceil(center + support);
    if (lo < 0) lo = 0;
    if (hi > in_n) hi = in_n;
    std::vector<double> wv(hi - lo);
    double sum = 0.0;
    double inv = scale > 1.0 ? 1.0 / scale : 1.0;
    for (int i = lo; i < hi; i++) {
      double wgt = lanczos((i + 0.5 - center) * inv);
      wv[i - lo] = wgt;
      sum += wgt;
    }
    if (sum != 0.0)
      for (auto& v : wv) v /= sum;
    bounds[2 * o] = lo;
    bounds[2 * o + 1] = hi;
    wtab[o] = std::move(wv);
  }
  for (int line = 0; line < lines; line++) {
    const float* s = src + (size_t)line * line_stride_in;
    float* d = dst + (size_t)line * line_stride_out;
    for (int o = 0; o < out_n; o++) {
      int lo = bounds[2 * o], hi = bounds[2 * o + 1];
      const std::vector<double>& wv = wtab[o];
      for (int c = 0; c < ch; c++) {
        double acc = 0.0;
        for (int i = lo; i < hi; i++)
          acc += wv[i - lo] * s[(size_t)i * stride_in + c];
        d[(size_t)o * stride_out + c] = (float)acc;
      }
    }
  }
}

// Decode path -> f32 RGB (out_h, out_w, 3) in [0,1], Lanczos-3 resize.
// Returns 0 ok, -1 decode failure.
static int decode_resize_into(const char* path, int out_w, int out_h, float* out) {
  DecodedImage img = decode_file(path);
  if (!img.ok) return -1;
  std::vector<float> f32((size_t)img.w * img.h * 3);
  for (size_t i = 0; i < f32.size(); i++) f32[i] = img.rgb[i] / 255.0f;
  if (img.w == out_w && img.h == out_h) {
    memcpy(out, f32.data(), f32.size() * sizeof(float));
    return 0;
  }
  // W pass then H pass.
  std::vector<float> tmp((size_t)img.h * out_w * 3);
  lanczos_axis(f32.data(), tmp.data(), img.w, out_w, 3, 3, img.h,
               (size_t)img.w * 3, (size_t)out_w * 3, 3);
  lanczos_axis(tmp.data(), out, img.h, out_h, (size_t)out_w * 3,
               (size_t)out_w * 3, out_w, 3, 3, 3);
  return 0;
}

extern "C" int image_probe(const char* path, int32_t* w, int32_t* h) {
  DecodedImage img = decode_file(path);  // full decode; probe is startup-only
  if (!img.ok) return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}

extern "C" int image_decode_resize(const char* path, int out_w, int out_h, float* out) {
  return decode_resize_into(path, out_w, out_h, out);
}

// Threaded batch decode: paths packed as consecutive NUL-terminated strings;
// each image i resized to (out_wh[2i], out_wh[2i+1]) into outs[offsets[i]].
extern "C" int image_decode_batch(const char* paths, const int64_t* path_offsets,
                       const int32_t* out_wh, const int64_t* out_offsets,
                       float* out, int n, int n_threads, int32_t* status) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = decode_resize_into(paths + path_offsets[i], out_wh[2 * i],
                                     out_wh[2 * i + 1], out + out_offsets[i]);
    }
  };
  int nt = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (nt > n) nt = n;
  if (nt < 1) nt = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  for (int i = 0; i < n; i++)
    if (status[i] != 0) return -1;
  return 0;
}

