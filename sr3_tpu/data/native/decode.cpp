// Native image-decode + batch-assembly pipeline.
//
// The host-side critical path of the data loader is PNG decode (PIL) plus
// uint8 -> float32 [-1,1] conversion. This kernel fuses both: each worker
// thread decodes a compressed buffer straight into its batch slot via
// libpng's simplified API, then normalizes (and optionally h-flips) in one
// pass. C ABI for ctypes.
//
//   decode_collate_normalize(bufs, lens, n, h, w, out, lo, hi, flip_mask)
//     bufs/lens: n compressed PNG buffers
//     out:       float32 (n, h, w, 3); images must decode to exactly (h, w)
//     returns 0 on success, 1-based index of the first failing image on error

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

bool decode_png_rgb(const uint8_t* buf, size_t len, uint8_t* out,
                    uint32_t expect_w, uint32_t expect_h) {
    png_image image;
    std::memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, buf, len)) return false;
    if (image.width != expect_w || image.height != expect_h) {
        png_image_free(&image);
        return false;
    }
    image.format = PNG_FORMAT_RGB;
    if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) {
        png_image_free(&image);
        return false;
    }
    return true;
}

}  // namespace

extern "C" {

int64_t decode_collate_normalize(const uint8_t** bufs, const int64_t* lens,
                                 int64_t n, int64_t h, int64_t w, float* out,
                                 float lo, float hi,
                                 const uint8_t* flip_mask) {
    const float scale = (hi - lo) / 255.0f;
    const int64_t img_elems = h * w * 3;
    std::atomic<int64_t> first_error{0};

    auto work = [&](int64_t i) {
        std::vector<uint8_t> rgb((size_t)img_elems);
        if (!decode_png_rgb(bufs[i], (size_t)lens[i], rgb.data(),
                            (uint32_t)w, (uint32_t)h)) {
            int64_t expected = 0;
            first_error.compare_exchange_strong(expected, i + 1);
            return;
        }
        float* dst = out + i * img_elems;
        const bool flip = flip_mask && flip_mask[i];
        if (!flip) {
            for (int64_t e = 0; e < img_elems; ++e) {
                dst[e] = (float)rgb[e] * scale + lo;
            }
        } else {
            for (int64_t y = 0; y < h; ++y) {
                const uint8_t* row = rgb.data() + y * w * 3;
                float* drow = dst + y * w * 3;
                for (int64_t x = 0; x < w; ++x) {
                    const uint8_t* px = row + (w - 1 - x) * 3;
                    float* dpx = drow + x * 3;
                    dpx[0] = (float)px[0] * scale + lo;
                    dpx[1] = (float)px[1] * scale + lo;
                    dpx[2] = (float)px[2] * scale + lo;
                }
            }
        }
    };

    // SR3_DECODE_THREADS caps/pins the worker count (shared hosts, and the
    // host-path bench's thread-scaling sweep); default is every hw thread.
    unsigned hw_threads = std::thread::hardware_concurrency();
    if (const char* env = std::getenv("SR3_DECODE_THREADS")) {
        long v = std::strtol(env, nullptr, 10);
        if (v > 0) hw_threads = (unsigned)v;
    }
    int64_t n_threads = (int64_t)(hw_threads ? hw_threads : 4);
    if (n_threads > n) n_threads = n;
    if (n_threads <= 1) {
        for (int64_t i = 0; i < n; ++i) work(i);
    } else {
        std::vector<std::thread> threads;
        threads.reserve((size_t)n_threads);
        for (int64_t t = 0; t < n_threads; ++t) {
            threads.emplace_back([&, t]() {
                for (int64_t i = t; i < n; i += n_threads) work(i);
            });
        }
        for (auto& th : threads) th.join();
    }
    return first_error.load();
}

}  // extern "C"
