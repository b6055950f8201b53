// Native image-loading pipeline: decode (libjpeg/libpng) + PIL-equivalent
// bicubic smallest-side resize fused with the crop window + [-1, 1] fp32
// normalization, plus a batch entry with an internal thread pool.
//
// TPU-native counterpart of the reference's torch DataLoader worker
// processes (face_reenactment/main.py DataModuleFromConfig num_workers):
// instead of multiprocess Python workers, the repo's threaded DataLoader
// (dsml_thesis_tpu/data/datasets.py) calls into this library; ctypes
// releases the GIL for the duration of each call, so decode/resize runs
// truly parallel across loader threads.
//
// Semantics mirror dsml_thesis_tpu.data.datasets.load_image exactly:
//   scale = size / min(w, h)
//   (ow, oh) = (max(size, pyround(w*scale)), max(size, pyround(h*scale)))
//   bicubic resize (PIL antialiased convolution resampling, a = -0.5),
//   crop size x size at (x0, y0) (center when x0 < 0), u8 quantize,
//   x / 127.5 - 1.
// pyround = round-half-even (Python round()). Like PIL, the horizontal
// pass quantizes to uint8 fixed point before the vertical pass (see
// resample_window) — keeping fp32 between passes would be higher
// precision but break the ~2-LSB PIL-parity bound the tests pin.
// Residual ~1-2 LSB deltas come from fp32-vs-PIL's int32 fixed-point
// filter arithmetic, not from a precision upgrade. The fusion win: only
// the crop window's columns/rows are ever resampled — PIL resizes the
// full frame and then crops.
//
// Build: `make` in this directory (links -ljpeg -lpng).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- errors
enum {
  IP_OK = 0,
  IP_EOPEN = -1,     // cannot open / read file
  IP_EFORMAT = -2,   // not a JPEG/PNG or corrupt stream
  IP_ECOLOR = -3,    // unsupported color space (e.g. CMYK) — caller falls
                     // back to PIL for this file
  IP_EARGS = -4,     // bad arguments (size <= 0, crop out of range, ...)
  IP_ENOMEM = -5,
};

struct Buf {
  std::vector<uint8_t> data;
};

bool read_file(const char* path, Buf* buf, size_t max_bytes = 0) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  size_t want = static_cast<size_t>(n);
  if (max_bytes && want > max_bytes) want = max_bytes;  // header-only probe
  buf->data.resize(want);
  size_t got = std::fread(buf->data.data(), 1, buf->data.size(), f);
  std::fclose(f);
  return got == buf->data.size();
}

// ------------------------------------------------------------ JPEG decode
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool is_jpeg(const Buf& b) {
  return b.data.size() >= 3 && b.data[0] == 0xFF && b.data[1] == 0xD8;
}

bool is_png(const Buf& b) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A};
  return b.data.size() >= 8 && std::memcmp(b.data.data(), sig, 8) == 0;
}

// header-only: fills w/h, returns IP_OK or error
int jpeg_probe(const Buf& b, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return IP_EFORMAT;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(b.data.data()),
               static_cast<unsigned long>(b.data.size()));
  jpeg_read_header(&cinfo, TRUE);
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return IP_OK;
}

// full decode to RGB8; out resized to w*h*3
int jpeg_decode(const Buf& b, std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return IP_EFORMAT;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(b.data.data()),
               static_cast<unsigned long>(b.data.size()));
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return IP_ECOLOR;  // rare; caller falls back to PIL
  }
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr both upconvert
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  if (cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return IP_ECOLOR;
  }
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return IP_OK;
}

// ------------------------------------------------------------- PNG decode
int png_probe(const Buf& b, int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, b.data.data(),
                                        b.data.size())) {
    return IP_EFORMAT;
  }
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  png_image_free(&image);
  return IP_OK;
}

// decode to RGB8 by reading RGBA and dropping alpha — PIL's
// Image.convert("RGB") on RGBA likewise drops alpha with no compositing
int png_decode(const Buf& b, std::vector<uint8_t>* out, int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, b.data.data(),
                                        b.data.size())) {
    return IP_EFORMAT;
  }
  if (image.format & PNG_FORMAT_FLAG_LINEAR) {
    // 16-bit PNG: libpng would scale 16->8 here, but PIL opens these as
    // mode I;16 and convert("RGB") CLAMPS at 255 — wildly different
    // pixels. Refuse so the caller's PIL fallback keeps backend parity.
    png_image_free(&image);
    return IP_ECOLOR;
  }
  image.format = PNG_FORMAT_RGBA;
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  std::vector<uint8_t> rgba(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&image);
    return IP_EFORMAT;
  }
  size_t npx = static_cast<size_t>(*w) * *h;
  out->resize(npx * 3);
  for (size_t i = 0; i < npx; ++i) {
    (*out)[i * 3 + 0] = rgba[i * 4 + 0];
    (*out)[i * 3 + 1] = rgba[i * 4 + 1];
    (*out)[i * 3 + 2] = rgba[i * 4 + 2];
  }
  return IP_OK;
}

int decode_any(const Buf& b, std::vector<uint8_t>* out, int* w, int* h) {
  if (is_jpeg(b)) return jpeg_decode(b, out, w, h);
  if (is_png(b)) return png_decode(b, out, w, h);
  return IP_EFORMAT;
}

int probe_any(const Buf& b, int* w, int* h) {
  if (is_jpeg(b)) return jpeg_probe(b, w, h);
  if (is_png(b)) return png_probe(b, w, h);
  return IP_EFORMAT;
}

// ------------------------------------------------------ resize math (PIL)
// Python round(): half-to-even. nearbyint in the default FE_TONEAREST
// rounding mode is exactly that.
inline int py_round(double x) { return static_cast<int>(std::nearbyint(x)); }

void resized_dims(int w, int h, int size, int* ow, int* oh) {
  double scale = static_cast<double>(size) / (w < h ? w : h);
  int rw = py_round(w * scale), rh = py_round(h * scale);
  *ow = rw > size ? rw : size;
  *oh = rh > size ? rh : size;
}

// PIL bicubic kernel, a = -0.5, support 2
inline double bicubic(double x) {
  x = std::fabs(x);
  if (x < 1.0) return ((1.5 * x - 2.5) * x) * x + 1.0;
  if (x < 2.0) return ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0;
  return 0.0;
}

// Per-output-pixel filter taps, PIL's antialiased convolution resampling:
// the kernel widens by the downscale factor so every source pixel
// contributes when minifying (ImagingResampleHorizontal precompute_coeffs).
struct Taps {
  std::vector<int> xmin;            // first source index per output pixel
  std::vector<int> xcount;          // tap count per output pixel
  std::vector<double> weights;      // ksize taps per output pixel
  int ksize = 0;
};

// outputs [o0, o0+n) of a virtual in_size -> out_size resize
void precompute_taps(int in_size, int out_size, int o0, int n, Taps* t) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 2.0 * filterscale;
  t->ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  t->xmin.resize(n);
  t->xcount.resize(n);
  t->weights.assign(static_cast<size_t>(n) * t->ksize, 0.0);
  for (int i = 0; i < n; ++i) {
    double center = (o0 + i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double* w = &t->weights[static_cast<size_t>(i) * t->ksize];
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double ww = bicubic((x + 0.5 - center) / filterscale);
      w[x - xmin] = ww;
      total += ww;
    }
    if (total != 0.0) {
      for (int x = 0; x < xmax - xmin; ++x) w[x] /= total;
    }
    t->xmin[i] = xmin;
    t->xcount[i] = xmax - xmin;
  }
}

// Fused resize+crop+normalize: src RGB8 (w x h) -> out fp32 [size,size,3]
// in [-1, 1], where the crop window is (x0, y0) of the virtual (ow x oh)
// resized image. Only the window's columns and the rows its vertical taps
// touch are ever computed.
int resample_window(const uint8_t* src, int w, int h, int size,
                    int x0, int y0, float* out) {
  int ow, oh;
  resized_dims(w, h, size, &ow, &oh);
  if (x0 < 0 || y0 < 0) {  // center crop
    x0 = (ow - size) / 2;
    y0 = (oh - size) / 2;
  }
  if (x0 + size > ow || y0 + size > oh) return IP_EARGS;

  Taps tx, ty;
  precompute_taps(w, ow, x0, size, &tx);   // horizontal: cols of the window
  precompute_taps(h, oh, y0, size, &ty);   // vertical: rows of the window

  // source-row range the vertical taps touch
  int rmin = ty.xmin[0];
  int rmax = 0;
  for (int i = 0; i < size; ++i) {
    int hi = ty.xmin[i] + ty.xcount[i];
    if (hi > rmax) rmax = hi;
  }
  int nrows = rmax - rmin;
  if (nrows <= 0) return IP_EARGS;

  // horizontal pass over just those rows, just the window's columns.
  // The intermediate quantizes to uint8 exactly like PIL's two-pass
  // fixed-point resampling does — keeping fp32 here lets bicubic overshoot
  // through unclamped and diverges from PIL by several LSB.
  std::vector<uint8_t> tmp(static_cast<size_t>(nrows) * size * 3);
  for (int r = 0; r < nrows; ++r) {
    const uint8_t* srow = src + static_cast<size_t>(rmin + r) * w * 3;
    uint8_t* trow = &tmp[static_cast<size_t>(r) * size * 3];
    for (int c = 0; c < size; ++c) {
      const double* wts = &tx.weights[static_cast<size_t>(c) * tx.ksize];
      int s0 = tx.xmin[c], cnt = tx.xcount[c];
      double acc0 = 0.0, acc1 = 0.0, acc2 = 0.0;
      for (int k = 0; k < cnt; ++k) {
        const uint8_t* p = srow + static_cast<size_t>(s0 + k) * 3;
        double ww = wts[k];
        acc0 += ww * p[0];
        acc1 += ww * p[1];
        acc2 += ww * p[2];
      }
      for (int ch = 0; ch < 3; ++ch) {
        double q = std::nearbyint(ch == 0 ? acc0 : ch == 1 ? acc1 : acc2);
        if (q < 0.0) q = 0.0;
        if (q > 255.0) q = 255.0;
        trow[c * 3 + ch] = static_cast<uint8_t>(q);
      }
    }
  }

  // vertical pass + u8 quantize + [-1, 1] normalize
  for (int r = 0; r < size; ++r) {
    const double* wts = &ty.weights[static_cast<size_t>(r) * ty.ksize];
    int s0 = ty.xmin[r] - rmin, cnt = ty.xcount[r];
    float* orow = out + static_cast<size_t>(r) * size * 3;
    for (int c = 0; c < size * 3; ++c) {
      double acc = 0.0;
      for (int k = 0; k < cnt; ++k) {
        acc += wts[k] * tmp[static_cast<size_t>(s0 + k) * size * 3 + c];
      }
      // PIL rounds each pass to uint8; quantizing once here keeps the
      // x/127.5 - 1 grid identical to the PIL path
      double q = std::nearbyint(acc);
      if (q < 0.0) q = 0.0;
      if (q > 255.0) q = 255.0;
      orow[c] = static_cast<float>(q / 127.5 - 1.0);
    }
  }
  return IP_OK;
}

int load_one(const char* path, int size, int x0, int y0, float* out) {
  if (size <= 0) return IP_EARGS;
  // exceptions (std::bad_alloc from a header claiming absurd dims, ...)
  // must not cross the extern "C" / std::thread boundary: escaping a
  // thread worker is a guaranteed std::terminate, and unwinding through
  // ctypes' libffi frames aborts the Python process — either way the
  // documented "falls back to PIL" contract breaks.
  try {
    Buf b;
    if (!read_file(path, &b)) return IP_EOPEN;
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    int rc = decode_any(b, &rgb, &w, &h);
    if (rc != IP_OK) return rc;
    return resample_window(rgb.data(), w, h, size, x0, y0, out);
  } catch (...) {
    return IP_ENOMEM;
  }
}

}  // namespace

extern "C" {

// Decode + resize + crop + normalize one image into out[size*size*3]
// (fp32, [-1, 1], RGB, HWC). x0/y0: crop origin in the resized image;
// pass -1 for a center crop. Returns 0 or a negative IP_E* code.
int ip_load_image(const char* path, int size, int x0, int y0, float* out) {
  return load_one(path, size, x0, y0, out);
}

// Post-resize dimensions (ow, oh) from the header alone — lets Python draw
// random-crop offsets with rng semantics byte-identical to the PIL path
// before calling ip_load_image. Returns 0 or negative error.
int ip_probe_resized(const char* path, int size, int* ow, int* oh) {
  if (size <= 0) return IP_EARGS;
  try {
    // dims live in the first few KB; don't slurp the whole file twice per
    // training sample (probe + decode). Rare JPEGs bury SOF behind a huge
    // EXIF blob — retry with the full file before giving up.
    for (size_t cap : {size_t(1) << 16, size_t(0)}) {
      Buf b;
      if (!read_file(path, &b, cap)) return IP_EOPEN;
      int w = 0, h = 0;
      if (probe_any(b, &w, &h) == IP_OK) {
        resized_dims(w, h, size, ow, oh);
        return IP_OK;
      }
    }
    return IP_EFORMAT;
  } catch (...) {
    return IP_ENOMEM;
  }
}

// Batch entry with an internal thread pool. crop_xy: NULL for center crops,
// else 2n ints (x0, y0 per image; -1 -1 = center). status: per-image 0 or
// negative IP_E* (caller retries failures through PIL). Returns the number
// of failed images.
int ip_load_batch(const char** paths, int n, int size, const int* crop_xy,
                  float* out, int threads, int* status) {
  if (n <= 0 || size <= 0) return n > 0 ? n : 0;
  if (threads <= 0) threads = 1;
  if (threads > n) threads = n;
  std::atomic<int> next(0), failures(0);
  size_t stride = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int x0 = crop_xy ? crop_xy[2 * i] : -1;
      int y0 = crop_xy ? crop_xy[2 * i + 1] : -1;
      int rc = load_one(paths[i], size, x0, y0, out + stride * i);
      if (status) status[i] = rc;
      if (rc != IP_OK) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  try {
    for (int t = 1; t < threads; ++t) pool.emplace_back(worker);
  } catch (...) {
    // thread-spawn exhaustion: proceed with however many started — the
    // shared atomic queue means the inline worker below drains the rest
  }
  worker();  // catches its own per-image exceptions (load_one)
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
