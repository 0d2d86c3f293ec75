// Native host-side bag runtime for multimodalfusion_tpu.
//
// The training hot loop on the host is: read ragged MIL bags, pad them
// into a fixed [B, N_pad, D] batch + mask, optionally down-convert to
// bfloat16 to halve host->device bytes.  The reference does the
// equivalent work single-threaded in torch collate functions
// (ref utils/utils.py:35-46); here it is a small threaded C++ library
// exposed through ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -pthread -o libbagio.so bagio.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// Pad B ragged bags (bags[i]: lens[i] x D float32, may be null) into
// out [B, n_pad, D] (pre-zeroed NOT required) and mask [B, n_pad].
void mmf_pad_bags_f32(const float** bags, const int64_t* lens, int64_t B,
                      int64_t n_pad, int64_t D, float* out, float* mask,
                      int n_threads) {
    if (n_threads <= 0) {
        n_threads = std::max(1u, std::thread::hardware_concurrency());
    }
    n_threads = (int)std::min<int64_t>(n_threads, B > 0 ? B : 1);
    auto work = [&](int64_t b0, int64_t b1) {
        for (int64_t b = b0; b < b1; ++b) {
            float* dst = out + b * n_pad * D;
            float* m = mask + b * n_pad;
            int64_t n = bags[b] ? lens[b] : 0;
            if (n > n_pad) n = n_pad;
            if (n > 0) {
                std::memcpy(dst, bags[b], sizeof(float) * n * D);
            }
            std::memset(dst + n * D, 0, sizeof(float) * (n_pad - n) * D);
            for (int64_t i = 0; i < n; ++i) m[i] = 1.0f;
            std::memset(m + n, 0, sizeof(float) * (n_pad - n));
        }
    };
    if (n_threads == 1) {
        work(0, B);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (B + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t b0 = t * chunk;
        int64_t b1 = std::min(B, b0 + chunk);
        if (b0 >= b1) break;
        ts.emplace_back(work, b0, b1);
    }
    for (auto& t : ts) t.join();
}

// float32 -> bfloat16 (round-to-nearest-even), threaded.
void mmf_f32_to_bf16(const float* src, uint16_t* dst, int64_t n,
                     int n_threads) {
    if (n_threads <= 0) {
        n_threads = std::max(1u, std::thread::hardware_concurrency());
    }
    auto work = [&](int64_t i0, int64_t i1) {
        for (int64_t i = i0; i < i1; ++i) {
            uint32_t bits;
            std::memcpy(&bits, &src[i], 4);
            if ((bits & 0x7F800000u) == 0x7F800000u &&
                (bits & 0x007FFFFFu) != 0u) {
                // NaN: preserve sign, emit quiet NaN (the RNE add would
                // otherwise overflow payload-only NaNs into Inf or 0)
                dst[i] = (uint16_t)(((bits >> 16) & 0x8000u) | 0x7FC0u);
                continue;
            }
            uint32_t lsb = (bits >> 16) & 1u;
            bits += 0x7FFFu + lsb;  // RNE
            dst[i] = (uint16_t)(bits >> 16);
        }
    };
    int64_t min_chunk = 1 << 20;
    int threads = (int)std::min<int64_t>(
        n_threads, std::max<int64_t>(1, n / min_chunk));
    if (threads <= 1) {
        work(0, n);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + threads - 1) / threads;
    for (int t = 0; t < threads; ++t) {
        int64_t i0 = t * chunk;
        int64_t i1 = std::min(n, i0 + chunk);
        if (i0 >= i1) break;
        ts.emplace_back(work, i0, i1);
    }
    for (auto& t : ts) t.join();
}

// Threaded whole-file reads into caller-provided buffers (bag prefetch).
// paths: array of C strings; sizes: expected byte counts; bufs: dests.
// Returns number of files read fully.
int64_t mmf_read_files(const char** paths, const int64_t* sizes,
                       char** bufs, int64_t n_files, int n_threads) {
    if (n_threads <= 0) {
        n_threads = std::max(1u, std::thread::hardware_concurrency());
    }
    n_threads = (int)std::min<int64_t>(n_threads, n_files ? n_files : 1);
    std::vector<int64_t> ok(n_files, 0);
    auto work = [&](int64_t f0, int64_t f1) {
        for (int64_t f = f0; f < f1; ++f) {
            FILE* fp = std::fopen(paths[f], "rb");
            if (!fp) continue;
            size_t got = std::fread(bufs[f], 1, (size_t)sizes[f], fp);
            std::fclose(fp);
            ok[f] = (got == (size_t)sizes[f]) ? 1 : 0;
        }
    };
    std::vector<std::thread> ts;
    int64_t chunk = (n_files + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t f0 = t * chunk;
        int64_t f1 = std::min(n_files, f0 + chunk);
        if (f0 >= f1) break;
        ts.emplace_back(work, f0, f1);
    }
    for (auto& t : ts) t.join();
    int64_t total = 0;
    for (auto v : ok) total += v;
    return total;
}

}  // extern "C"
