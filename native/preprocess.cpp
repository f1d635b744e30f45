// Native host-side image preprocessing for the data loader.
//
// The reference does all preprocessing through single-threaded torchvision
// transforms inside a num_workers=0 DataLoader (e.g.
// /root/reference/src/optimize_image_param.py:70-75,88). Feeding a TPU slice
// needs the host path off the critical path: this library does the
// bandwidth-heavy uint8 -> float NHWC conversion pipeline (ANTI-ALIASED
// shorter-side bilinear resize matching PIL/torchvision semantics, center
// crop, optional [-1,1] normalize) in C++ with a pthread worker pool, called
// from Python via ctypes (releases the GIL).
//
// Build: make -C native   (produces librgie_preprocess.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// PIL-style separable triangle-filter resample along one axis.
// For output index i: center = (i + 0.5) * scale; filterscale = max(scale, 1);
// support = filterscale; weight(j) = max(0, 1 - |j + 0.5 - center|/filterscale).
struct AxisFilter {
    std::vector<int> starts;       // first source index per output index
    std::vector<int> counts;       // taps per output index
    std::vector<float> weights;    // packed tap weights
    int max_taps = 0;
};

AxisFilter build_filter(int src, int dst) {
    AxisFilter f;
    const double scale = static_cast<double>(src) / dst;
    const double filterscale = std::max(scale, 1.0);
    const double support = filterscale;  // bilinear triangle support = 1
    f.starts.resize(dst);
    f.counts.resize(dst);
    std::vector<float> row;
    for (int i = 0; i < dst; ++i) {
        const double center = (i + 0.5) * scale;
        int lo = static_cast<int>(std::floor(center - support + 0.5));
        int hi = static_cast<int>(std::floor(center + support + 0.5));
        lo = std::max(lo, 0);
        hi = std::min(hi, src);
        row.clear();
        double total = 0.0;
        for (int j = lo; j < hi; ++j) {
            double x = (j + 0.5 - center) / filterscale;
            double w = 1.0 - std::abs(x);
            if (w < 0) w = 0;
            row.push_back(static_cast<float>(w));
            total += w;
        }
        if (total <= 0) {  // degenerate; nearest fallback
            lo = std::min(std::max(static_cast<int>(center), 0), src - 1);
            hi = lo + 1;
            row.assign(1, 1.0f);
            total = 1.0;
        }
        f.starts[i] = lo;
        f.counts[i] = static_cast<int>(row.size());
        f.max_taps = std::max(f.max_taps, f.counts[i]);
        for (float w : row) f.weights.push_back(static_cast<float>(w / total));
    }
    return f;
}

struct Job {
    const uint8_t* src;
    int src_h, src_w;
    float* dst;  // crop*crop*3
};

void preprocess_one(const Job& job, int resize_shorter, int crop, int normalize) {
    const int h = job.src_h, w = job.src_w;
    int nh, nw;
    if (h <= w) {
        nh = resize_shorter;
        nw = std::max(1, static_cast<int>(std::lround(
                             static_cast<double>(w) * resize_shorter / h)));
    } else {
        nw = resize_shorter;
        nh = std::max(1, static_cast<int>(std::lround(
                             static_cast<double>(h) * resize_shorter / w)));
    }
    AxisFilter fy = build_filter(h, nh);
    AxisFilter fx = build_filter(w, nw);

    // vertical pass: (h, w, 3) -> (nh, w, 3)
    std::vector<float> tmp(static_cast<size_t>(nh) * w * 3);
    size_t woff = 0;
    for (int y = 0; y < nh; ++y) {
        const int start = fy.starts[y];
        const int count = fy.counts[y];
        const float* wt = fy.weights.data() + woff;
        woff += count;
        for (int x = 0; x < w; ++x) {
            float acc[3] = {0, 0, 0};
            for (int k = 0; k < count; ++k) {
                const uint8_t* px = job.src + ((start + k) * static_cast<size_t>(w) + x) * 3;
                acc[0] += wt[k] * px[0];
                acc[1] += wt[k] * px[1];
                acc[2] += wt[k] * px[2];
            }
            float* out = tmp.data() + (y * static_cast<size_t>(w) + x) * 3;
            out[0] = acc[0]; out[1] = acc[1]; out[2] = acc[2];
        }
    }

    // horizontal pass restricted to the crop window
    const int top = (nh - crop) / 2;
    const int left = (nw - crop) / 2;
    // precompute weight offsets for fx
    std::vector<size_t> xoff(nw);
    {
        size_t o = 0;
        for (int x = 0; x < nw; ++x) { xoff[x] = o; o += fx.counts[x]; }
    }
    for (int y = 0; y < crop; ++y) {
        const float* row = tmp.data() + (static_cast<size_t>(y + top) * w) * 3;
        for (int x = 0; x < crop; ++x) {
            const int sx = x + left;
            const int start = fx.starts[sx];
            const int count = fx.counts[sx];
            const float* wt = fx.weights.data() + xoff[sx];
            float acc[3] = {0, 0, 0};
            for (int k = 0; k < count; ++k) {
                const float* px = row + (start + k) * 3;
                acc[0] += wt[k] * px[0];
                acc[1] += wt[k] * px[1];
                acc[2] += wt[k] * px[2];
            }
            float* out = job.dst + (static_cast<size_t>(y) * crop + x) * 3;
            for (int c = 0; c < 3; ++c) {
                float v = acc[c] / 255.0f;
                if (normalize) v = (v - 0.5f) / 0.5f;
                out[c] = v;
            }
        }
    }
}

}  // namespace

extern "C" {

// Preprocess a batch of independently-sized uint8 HWC RGB images into a
// packed float32 (n, crop, crop, 3) buffer using `num_threads` workers.
void rgie_preprocess_batch(const uint8_t** srcs, const int* hs, const int* ws,
                           int n, int resize_shorter, int crop, int normalize,
                           float* out, int num_threads) {
    std::vector<Job> jobs(n);
    const size_t stride = static_cast<size_t>(crop) * crop * 3;
    for (int i = 0; i < n; ++i) {
        jobs[i] = Job{srcs[i], hs[i], ws[i], out + i * stride};
    }
    if (num_threads <= 1 || n == 1) {
        for (const auto& j : jobs) preprocess_one(j, resize_shorter, crop, normalize);
        return;
    }
    std::atomic<int> next{0};
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            preprocess_one(jobs[i], resize_shorter, crop, normalize);
        }
    };
    std::vector<std::thread> pool;
    int t = std::min(num_threads, n);
    pool.reserve(t);
    for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
}

void rgie_preprocess_one(const uint8_t* src, int h, int w, int resize_shorter,
                         int crop, int normalize, float* out) {
    Job j{src, h, w, out};
    preprocess_one(j, resize_shorter, crop, normalize);
}

}  // extern "C"
