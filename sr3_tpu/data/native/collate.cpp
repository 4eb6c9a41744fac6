// Native host-side batch assembly for the data pipeline.
//
// The hot host-side op between image decode and device_put is
// uint8 HWC -> float32 [-1,1] NHWC batch assembly with optional paired
// horizontal flip. numpy does this single-threaded with two temporaries;
// this kernel does it in one fused multithreaded pass.
//
// Exposed as a plain C ABI consumed via ctypes (no Python.h dependency):
//   collate_normalize(src_ptrs, n, h, w, c, out, lo, hi, flip_mask)
//     src_ptrs: array of n pointers to uint8 HWC images (same shape)
//     out:      float32 buffer of n*h*w*c
//     flip_mask: per-image 0/1 horizontal flip flags (may be NULL)

#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>

extern "C" {

void collate_normalize(const uint8_t** src_ptrs, int64_t n, int64_t h,
                       int64_t w, int64_t c, float* out, float lo, float hi,
                       const uint8_t* flip_mask) {
    const float scale = (hi - lo) / 255.0f;
    const int64_t img_elems = h * w * c;

    auto work = [&](int64_t i) {
        const uint8_t* src = src_ptrs[i];
        float* dst = out + i * img_elems;
        const bool flip = flip_mask && flip_mask[i];
        if (!flip) {
            for (int64_t e = 0; e < img_elems; ++e) {
                dst[e] = (float)src[e] * scale + lo;
            }
        } else {
            for (int64_t y = 0; y < h; ++y) {
                const uint8_t* row = src + y * w * c;
                float* drow = dst + y * w * c;
                for (int64_t x = 0; x < w; ++x) {
                    const uint8_t* px = row + (w - 1 - x) * c;
                    float* dpx = drow + x * c;
                    for (int64_t ch = 0; ch < c; ++ch) {
                        dpx[ch] = (float)px[ch] * scale + lo;
                    }
                }
            }
        }
    };

    unsigned hw_threads = std::thread::hardware_concurrency();
    int64_t n_threads = (int64_t)(hw_threads ? hw_threads : 4);
    if (n_threads > n) n_threads = n;
    if (n_threads <= 1) {
        for (int64_t i = 0; i < n; ++i) work(i);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve((size_t)n_threads);
    for (int64_t t = 0; t < n_threads; ++t) {
        threads.emplace_back([&, t]() {
            for (int64_t i = t; i < n; i += n_threads) work(i);
        });
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"
