// Native host-side point-cloud ops for data-loading workers.
//
// The reference implements these as CUDA kernels for the accelerator
// (pointnet_lib/src/sampling_gpu.cu); on the TPU stack the accelerator path
// is Pallas/XLA (captra_tpu/ops) and the *host* data pipeline gets this C++
// core instead — exact same algorithms as captra_tpu/data/numpy_ops.py,
// ~50x faster than the Python loop.
//
// Build: g++ -O3 -shared -fPIC -o libcaptra_pointops.so pointops.cpp
// ABI: plain C, consumed via ctypes (captra_tpu/data/native.py).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Iterative farthest-point sampling: xyz [n, 3] row-major, deterministic
// start at index `start`; writes `npoint` indices.
void fps(const float* xyz, int64_t n, int64_t npoint, int64_t start,
         int64_t* out) {
    if (n <= 0 || npoint <= 0) return;
    std::vector<float> dist(n, 1e10f);
    int64_t farthest = start < n ? start : 0;
    for (int64_t i = 0; i < npoint; ++i) {
        out[i] = farthest;
        const float cx = xyz[farthest * 3 + 0];
        const float cy = xyz[farthest * 3 + 1];
        const float cz = xyz[farthest * 3 + 2];
        float best = -1.0f;
        int64_t best_idx = 0;
        for (int64_t j = 0; j < n; ++j) {
            const float dx = xyz[j * 3 + 0] - cx;
            const float dy = xyz[j * 3 + 1] - cy;
            const float dz = xyz[j * 3 + 2] - cz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < dist[j]) dist[j] = d;
            if (dist[j] > best) { best = dist[j]; best_idx = j; }
        }
        farthest = best_idx;
    }
}

// Squared distances to a center: pts [n, 3] -> out [n].
void dist_to_center(const float* pts, int64_t n, const float* center,
                    float* out) {
    const float cx = center[0], cy = center[1], cz = center[2];
    for (int64_t j = 0; j < n; ++j) {
        const float dx = pts[j * 3 + 0] - cx;
        const float dy = pts[j * 3 + 1] - cy;
        const float dz = pts[j * 3 + 2] - cz;
        out[j] = dx * dx + dy * dy + dz * dz;
    }
}

// Count points with squared distance <= r2 and (optionally) collect their
// indices.  Returns the count; fills at most `cap` indices when idx != null.
int64_t ball_indices(const float* sq_dist, int64_t n, float r2,
                     int64_t* idx, int64_t cap) {
    int64_t cnt = 0;
    for (int64_t j = 0; j < n; ++j) {
        if (sq_dist[j] <= r2) {
            if (idx && cnt < cap) idx[cnt] = j;
            ++cnt;
        }
    }
    return cnt;
}

// Depth-image backprojection with the NOCS conventions
// (reference nocs_utils.py:5-33): v = H - row, z negated, metric scale.
// depth: uint16 [h, w]; mask: uint8 [h, w] (may be null).
// Writes points [h*w, 3] and valid [h*w]; returns count of valid pixels.
int64_t backproject(const uint16_t* depth, const uint8_t* mask,
                    int64_t h, int64_t w, const double* intrinsics_inv,
                    double scale, float* pts, uint8_t* valid) {
    int64_t cnt = 0;
    for (int64_t r = 0; r < h; ++r) {
        for (int64_t c = 0; c < w; ++c) {
            const int64_t i = r * w + c;
            const bool ok = depth[i] > 0 && (!mask || mask[i]);
            valid[i] = ok ? 1 : 0;
            if (!ok) { pts[i * 3] = pts[i * 3 + 1] = pts[i * 3 + 2] = 0.f;
                       continue; }
            const double u = (double)c, v = (double)(h - r);
            double x = intrinsics_inv[0] * u + intrinsics_inv[1] * v +
                       intrinsics_inv[2];
            double y = intrinsics_inv[3] * u + intrinsics_inv[4] * v +
                       intrinsics_inv[5];
            double z = intrinsics_inv[6] * u + intrinsics_inv[7] * v +
                       intrinsics_inv[8];
            const double d = (double)depth[i] / z;
            pts[i * 3 + 0] = (float)(x * d * scale);
            pts[i * 3 + 1] = (float)(y * d * scale);
            pts[i * 3 + 2] = (float)(-z * d * scale);
            ++cnt;
        }
    }
    return cnt;
}

}  // extern "C"
