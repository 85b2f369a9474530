// Native host-side image ops for the input pipeline.
//
// The reference's data path leans on OpenCV/skimage C++ kernels
// (warpAffine, fillConvexPoly — datasets/base_dataset.py). This library is
// the equivalent native component for the TPU framework's host pipeline:
// multi-channel bilinear affine warp and convex-polygon mask fill, exposed
// through a C ABI consumed via ctypes (smirk_tpu/native/__init__.py). The
// numpy implementations in smirk_tpu/data/transforms.py are the reference
// oracle; tests assert equivalence.
//
// Build: tools/build_native.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <atomic>
#include <functional>
#include <thread>
#include <vector>

// Work-stealing parallel-for over [0, n): the executor for the batched
// data-path ops below. Threads pull indices from a shared atomic counter, so
// uneven per-item cost (different hull sizes, cache effects) load-balances
// itself. n_threads <= 0 -> hardware concurrency.
static void run_parallel(int n, int n_threads,
                         const std::function<void(int)>& fn) {
    if (n_threads <= 0)
        n_threads = (int)std::thread::hardware_concurrency();
    n_threads = std::max(1, std::min(n_threads, n));
    if (n_threads == 1) {
        for (int i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int> next(0);
    auto worker = [&]() {
        int i;
        while ((i = next.fetch_add(1)) < n) fn(i);
    };
    std::vector<std::thread> pool;
    pool.reserve(n_threads - 1);
    for (int t = 0; t < n_threads - 1; ++t) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();
}

extern "C" {

// out(y, x, c) = img(iy, ix, c) bilinear, where (ix, iy) = Minv * (x, y, 1).
// img: (H, W, C) float32 row-major; minv: row-major 2x3 [ [a b tx], [c d ty] ]
// applied as ix = a*x + b*y + tx ; iy = c*x + d*y + ty.
void warp_affine_bilinear(const float* img, int H, int W, int C,
                          const double* minv, float* out, int OH, int OW) {
    const double a = minv[0], b = minv[1], tx = minv[2];
    const double c = minv[3], d = minv[4], ty = minv[5];
    for (int y = 0; y < OH; ++y) {
        const double base_x = b * y + tx;
        const double base_y = d * y + ty;
        float* orow = out + (size_t)y * OW * C;
        for (int x = 0; x < OW; ++x) {
            const double ix = a * x + base_x;
            const double iy = c * x + base_y;
            const int x0 = (int)std::floor(ix);
            const int y0 = (int)std::floor(iy);
            const double fx = ix - x0;
            const double fy = iy - y0;
            float* opix = orow + (size_t)x * C;
            if (x0 < -1 || y0 < -1 || x0 >= W || y0 >= H) {
                for (int ch = 0; ch < C; ++ch) opix[ch] = 0.0f;
                continue;
            }
            const int x1 = x0 + 1, y1 = y0 + 1;
            const bool vx0 = x0 >= 0 && x0 < W, vx1 = x1 >= 0 && x1 < W;
            const bool vy0 = y0 >= 0 && y0 < H, vy1 = y1 >= 0 && y1 < H;
            const double w00 = (1 - fx) * (1 - fy), w10 = fx * (1 - fy);
            const double w01 = (1 - fx) * fy, w11 = fx * fy;
            for (int ch = 0; ch < C; ++ch) {
                double v = 0.0;
                if (vx0 && vy0) v += w00 * img[((size_t)y0 * W + x0) * C + ch];
                if (vx1 && vy0) v += w10 * img[((size_t)y0 * W + x1) * C + ch];
                if (vx0 && vy1) v += w01 * img[((size_t)y1 * W + x0) * C + ch];
                if (vx1 && vy1) v += w11 * img[((size_t)y1 * W + x1) * C + ch];
                opix[ch] = (float)v;
            }
        }
    }
}

// mask(y, x) = 0 inside the convex hull of pts, 1 outside.
// pts: (N, 2) float64 [x, y]. Scanline fill over the hull polygon.
void convex_hull_mask(const double* pts, int N, float* mask, int H, int W) {
    std::fill(mask, mask + (size_t)H * W, 1.0f);
    if (N < 3) return;

    // Andrew's monotone chain.
    std::vector<std::pair<double, double>> p(N);
    for (int i = 0; i < N; ++i) p[i] = {pts[2 * i], pts[2 * i + 1]};
    std::sort(p.begin(), p.end());
    p.erase(std::unique(p.begin(), p.end()), p.end());
    const int n = (int)p.size();
    if (n < 3) return;
    auto cross = [](const std::pair<double, double>& o,
                    const std::pair<double, double>& a,
                    const std::pair<double, double>& b) {
        return (a.first - o.first) * (b.second - o.second) -
               (a.second - o.second) * (b.first - o.first);
    };
    std::vector<std::pair<double, double>> hull(2 * n);
    int k = 0;
    for (int i = 0; i < n; ++i) {
        while (k >= 2 && cross(hull[k - 2], hull[k - 1], p[i]) <= 0) k--;
        hull[k++] = p[i];
    }
    for (int i = n - 2, t = k + 1; i >= 0; i--) {
        while (k >= t && cross(hull[k - 2], hull[k - 1], p[i]) <= 0) k--;
        hull[k++] = p[i];
    }
    hull.resize(k - 1);
    const int hn = (int)hull.size();

    // Half-plane scanline: for each row, x-interval inside all edges.
    for (int y = 0; y < H; ++y) {
        double lo = 0.0, hi = (double)W - 1.0;
        bool empty = false;
        for (int i = 0; i < hn && !empty; ++i) {
            const double x0 = hull[i].first, y0 = hull[i].second;
            const double x1 = hull[(i + 1) % hn].first,
                         y1 = hull[(i + 1) % hn].second;
            // CCW hull: inside iff (edge) x (point) >= 0, i.e.
            // (x1-x0)*(y-y0) - (y1-y0)*(x-x0) >= 0  ->  A*x + B >= 0
            const double A = y0 - y1;
            const double B = (x1 - x0) * (y - y0) + x0 * (y1 - y0);
            // A*x + B >= 0
            if (std::abs(A) < 1e-12) {
                if (B < 0) empty = true;
            } else if (A > 0) {
                lo = std::max(lo, -B / A);
            } else {
                hi = std::min(hi, -B / A);
            }
        }
        if (empty) continue;
        const int xs = (int)std::ceil(lo - 1e-9);
        const int xe = (int)std::floor(hi + 1e-9);
        for (int x = std::max(0, xs); x <= std::min(W - 1, xe); ++x)
            mask[(size_t)y * W + x] = 0.0f;
    }
}

// Batched variants over the thread pool: the native data-path executor for
// chunked host pipelines (video demo crops a whole device batch at once).
// imgs: (N, H, W, C) contiguous; minvs: (N, 6); out: (N, OH, OW, C).
void warp_affine_batch(const float* imgs, int H, int W, int C,
                       const double* minvs, float* out, int OH, int OW,
                       int N, int n_threads) {
    const size_t in_stride = (size_t)H * W * C;
    const size_t out_stride = (size_t)OH * OW * C;
    run_parallel(N, n_threads, [&](int i) {
        warp_affine_bilinear(imgs + (size_t)i * in_stride, H, W, C,
                             minvs + (size_t)i * 6,
                             out + (size_t)i * out_stride, OH, OW);
    });
}

// pts: (N, K, 2) float64; masks: (N, H, W) float32.
void convex_hull_mask_batch(const double* pts, int K, float* masks, int H,
                            int W, int N, int n_threads) {
    const size_t mask_stride = (size_t)H * W;
    run_parallel(N, n_threads, [&](int i) {
        convex_hull_mask(pts + (size_t)i * K * 2, K,
                         masks + (size_t)i * mask_stride, H, W);
    });
}

}  // extern "C"
