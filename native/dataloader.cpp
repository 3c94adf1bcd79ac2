// sd_tpu native data-loader core.
//
// The reference delegates its hot host-side input path to native code in
// external dependencies (torch DataLoader worker pool, OpenCV/PIL decoders —
// SURVEY.md §2.9). This is the in-repo TPU-framework equivalent: a C++
// worker pool that decodes JPEG/PNG, center-crops to square, bilinear-resizes
// and normalizes to float32 [-1, 1] NHWC batches, entirely outside the
// Python interpreter. Exposed through a plain C ABI for ctypes
// (sd_tpu/data/native_loader.py).
//
// Build: make -C native   (links -ljpeg -lpng, no other deps)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

// ----------------------------------------------------------- decode helpers

struct Image {
  std::vector<uint8_t> data;  // HWC, RGB
  int h = 0, w = 0;
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

Image decode_jpeg(const uint8_t* buf, size_t len) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.data.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

struct PngReadState {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "eof");
    return;
  }
  memcpy(out, s->buf + s->pos, n);
  s->pos += n;
}

Image decode_png(const uint8_t* buf, size_t len) {
  Image img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize everything to 8-bit RGB
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img.w = int(w);
  img.h = int(h);
  img.data.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = img.data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_any(const std::vector<uint8_t>& buf) {
  if (buf.size() > 3 && buf[0] == 0xFF && buf[1] == 0xD8)
    return decode_jpeg(buf.data(), buf.size());
  if (buf.size() > 8 && buf[0] == 0x89 && buf[1] == 'P')
    return decode_png(buf.data(), buf.size());
  return Image{};
}

// ----------------------------------------------- crop + resize + normalize

// center-crop to square, resize to size x size (antialiased area average
// when downscaling, bilinear when upscaling — the cv2 INTER_AREA /
// INTER_LINEAR convention), write float32 [-1, 1] (optionally hflipped)
// into out[size*size*3]
void process(const Image& img, int size, bool hflip, float* out) {
  int crop = img.h < img.w ? img.h : img.w;
  int y0 = (img.h - crop) / 2;
  int x0 = (img.w - crop) / 2;
  float scale = float(crop) / size;

  if (scale > 1.0f) {
    // area average: each output pixel integrates its source footprint
    for (int oy = 0; oy < size; oy++) {
      float sy0 = oy * scale, sy1 = (oy + 1) * scale;
      int iy0 = int(sy0), iy1 = int(sy1 - 1e-5f);
      if (iy1 > crop - 1) iy1 = crop - 1;
      for (int ox = 0; ox < size; ox++) {
        float sx0 = ox * scale, sx1 = (ox + 1) * scale;
        int ix0 = int(sx0), ix1 = int(sx1 - 1e-5f);
        if (ix1 > crop - 1) ix1 = crop - 1;
        float acc[3] = {0, 0, 0};
        float wsum = 0;
        for (int iy = iy0; iy <= iy1; iy++) {
          float wy = 1.0f;
          if (iy == iy0) wy -= sy0 - iy0;
          if (iy == iy1) wy -= (iy1 + 1) - sy1;
          for (int ix = ix0; ix <= ix1; ix++) {
            float wx = 1.0f;
            if (ix == ix0) wx -= sx0 - ix0;
            if (ix == ix1) wx -= (ix1 + 1) - sx1;
            float w = wy * wx;
            const uint8_t* p =
                img.data.data() + (size_t(y0 + iy) * img.w + (x0 + ix)) * 3;
            acc[0] += w * p[0];
            acc[1] += w * p[1];
            acc[2] += w * p[2];
            wsum += w;
          }
        }
        int out_x = hflip ? (size - 1 - ox) : ox;
        float* dst = out + (size_t(oy) * size + out_x) * 3;
        for (int c = 0; c < 3; c++) dst[c] = acc[c] / wsum / 127.5f - 1.0f;
      }
    }
    return;
  }

  for (int oy = 0; oy < size; oy++) {
    float sy = (oy + 0.5f) * scale - 0.5f;
    int iy = int(sy);
    if (iy < 0) iy = 0;
    if (iy > crop - 2) iy = crop - 2;
    float fy = sy - iy;
    if (fy < 0) fy = 0;
    for (int ox = 0; ox < size; ox++) {
      float sx = (ox + 0.5f) * scale - 0.5f;
      int ix = int(sx);
      if (ix < 0) ix = 0;
      if (ix > crop - 2) ix = crop - 2;
      float fx = sx - ix;
      if (fx < 0) fx = 0;
      const uint8_t* p00 =
          img.data.data() + (size_t(y0 + iy) * img.w + (x0 + ix)) * 3;
      const uint8_t* p01 = p00 + 3;
      const uint8_t* p10 = p00 + size_t(img.w) * 3;
      const uint8_t* p11 = p10 + 3;
      int out_x = hflip ? (size - 1 - ox) : ox;
      float* dst = out + (size_t(oy) * size + out_x) * 3;
      for (int c = 0; c < 3; c++) {
        float v = (1 - fy) * ((1 - fx) * p00[c] + fx * p01[c]) +
                  fy * ((1 - fx) * p10[c] + fx * p11[c]);
        dst[c] = v / 127.5f - 1.0f;
      }
    }
  }
}

// ----------------------------------------------------------- thread pool

struct Pool {
  std::vector<std::thread> workers;
  std::queue<std::function<void()>> tasks;
  std::mutex mu;
  std::condition_variable cv;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; i++) {
      workers.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu);
            cv.wait(lk, [this] { return stop || !tasks.empty(); });
            if (stop && tasks.empty()) return;
            task = std::move(tasks.front());
            tasks.pop();
          }
          task();
        }
      });
    }
  }

  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }

  void submit(std::function<void()> f) {
    {
      std::unique_lock<std::mutex> lk(mu);
      tasks.push(std::move(f));
    }
    cv.notify_one();
  }
};

bool load_one(const char* path, int size, bool hflip, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len > 0 ? size_t(len) : 0);
  size_t got = buf.empty() ? 0 : fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if (got != buf.size() || buf.empty()) return false;
  Image img = decode_any(buf);
  if (!img.ok || img.h < 2 || img.w < 2) return false;
  process(img, size, hflip, out);
  return true;
}

}  // namespace

extern "C" {

void* sdt_create_pool(int num_threads) {
  return new Pool(num_threads > 0 ? num_threads : 4);
}

void sdt_destroy_pool(void* pool) { delete reinterpret_cast<Pool*>(pool); }

// Decode+crop+resize `n` files into out [n, size, size, 3] float32 [-1, 1].
// flip_seed < 0 disables flipping; otherwise each image flips with p=0.5
// drawn from a counter-based stream (deterministic given the seed).
// Returns the number of successfully loaded images; failures leave zeros and
// set ok[i] = 0.
int sdt_load_batch(void* pool_ptr, const char** paths, int n, int size,
                   long flip_seed, float* out, int* ok) {
  Pool* pool = reinterpret_cast<Pool*>(pool_ptr);
  std::atomic<int> done{0}, success{0};
  std::mutex done_mu;
  std::condition_variable done_cv;

  size_t stride = size_t(size) * size * 3;
  for (int i = 0; i < n; i++) {
    pool->submit([&, i] {
      bool hflip = false;
      if (flip_seed >= 0) {
        std::mt19937_64 rng(uint64_t(flip_seed) * 0x9E3779B97F4A7C15ull + i);
        hflip = (rng() & 1) != 0;
      }
      float* dst = out + stride * i;
      bool good = load_one(paths[i], size, hflip, dst);
      if (!good) memset(dst, 0, stride * sizeof(float));
      ok[i] = good ? 1 : 0;
      if (good) success.fetch_add(1);
      if (done.fetch_add(1) + 1 == n) {
        std::unique_lock<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return done.load() == n; });
  return success.load();
}

}  // extern "C"
