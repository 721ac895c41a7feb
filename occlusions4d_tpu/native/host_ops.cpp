// Host-side native compute for the data plane.
//
// The reference leans on torch_cluster's C++/CUDA kernels for dataloader-side
// farthest point sampling (/root/reference/utils/geometry.py:353-364) and on
// sklearn's C KDTree for test-time 1-NN labels (geometry.py:444-455). This library
// provides the TPU-framework equivalents for the host plane (the device plane uses
// ops/ JAX kernels instead). Built with -O3 -march=native; bound via ctypes.
//
// Exposed C ABI:
//   o4d_fps      greedy farthest point sampling, O(n * n_out)
//   o4d_nn1      exact 1-NN distances+indices, blocked for cache locality
//   o4d_knn      exact kNN (small k) via per-query bounded insertion sort

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Farthest point sampling over (n, 3) float32 coordinates.
// out_idx must hold n_out int32. Selection starts at start_idx (deterministic when 0).
void o4d_fps(const float* xyz, int64_t n, int64_t n_out, int64_t start_idx,
             int32_t* out_idx, float* scratch_min_d) {
    if (n <= 0 || n_out <= 0) return;
    for (int64_t i = 0; i < n; i++) scratch_min_d[i] = FLT_MAX;
    int64_t cur = start_idx;
    out_idx[0] = (int32_t)cur;
    for (int64_t s = 1; s < n_out; s++) {
        const float cx = xyz[cur * 3 + 0];
        const float cy = xyz[cur * 3 + 1];
        const float cz = xyz[cur * 3 + 2];
        float best = -1.0f;
        int64_t best_i = 0;
        for (int64_t i = 0; i < n; i++) {
            const float dx = xyz[i * 3 + 0] - cx;
            const float dy = xyz[i * 3 + 1] - cy;
            const float dz = xyz[i * 3 + 2] - cz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < scratch_min_d[i]) scratch_min_d[i] = d;
            if (scratch_min_d[i] > best) { best = scratch_min_d[i]; best_i = i; }
        }
        cur = best_i;
        out_idx[s] = (int32_t)cur;
    }
}

// Exact 1-NN: for each of n queries, Euclidean distance (and index) of the nearest
// of m keys. Blocked over keys for cache locality.
void o4d_nn1(const float* query, int64_t n, const float* keys, int64_t m,
             float* out_dist, int32_t* out_idx) {
    for (int64_t i = 0; i < n; i++) { out_dist[i] = FLT_MAX; out_idx[i] = 0; }
    const int64_t BLOCK = 2048;
    for (int64_t k0 = 0; k0 < m; k0 += BLOCK) {
        const int64_t k1 = (k0 + BLOCK < m) ? k0 + BLOCK : m;
        for (int64_t i = 0; i < n; i++) {
            const float qx = query[i * 3 + 0];
            const float qy = query[i * 3 + 1];
            const float qz = query[i * 3 + 2];
            float best = out_dist[i];
            int32_t best_j = out_idx[i];
            for (int64_t j = k0; j < k1; j++) {
                const float dx = keys[j * 3 + 0] - qx;
                const float dy = keys[j * 3 + 1] - qy;
                const float dz = keys[j * 3 + 2] - qz;
                const float d = dx * dx + dy * dy + dz * dz;
                if (d < best) { best = d; best_j = (int32_t)j; }
            }
            out_dist[i] = best;
            out_idx[i] = best_j;
        }
    }
    for (int64_t i = 0; i < n; i++) out_dist[i] = sqrtf(out_dist[i]);
}

// Exact kNN for small k (<= 64): bounded insertion into a per-query sorted list.
// out_dist/out_idx are (n, k), ascending by distance, ties toward lower index.
void o4d_knn(const float* query, int64_t n, const float* keys, int64_t m,
             int64_t k, float* out_dist, int32_t* out_idx) {
    for (int64_t i = 0; i < n; i++) {
        float* dst_d = out_dist + i * k;
        int32_t* dst_i = out_idx + i * k;
        for (int64_t t = 0; t < k; t++) { dst_d[t] = FLT_MAX; dst_i[t] = 0; }
        const float qx = query[i * 3 + 0];
        const float qy = query[i * 3 + 1];
        const float qz = query[i * 3 + 2];
        for (int64_t j = 0; j < m; j++) {
            const float dx = keys[j * 3 + 0] - qx;
            const float dy = keys[j * 3 + 1] - qy;
            const float dz = keys[j * 3 + 2] - qz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d >= dst_d[k - 1]) continue;
            int64_t t = k - 1;
            while (t > 0 && dst_d[t - 1] > d) {
                dst_d[t] = dst_d[t - 1];
                dst_i[t] = dst_i[t - 1];
                t--;
            }
            dst_d[t] = d;
            dst_i[t] = (int32_t)j;
        }
        for (int64_t t = 0; t < k; t++) dst_d[t] = sqrtf(dst_d[t]);
    }
}

}  // extern "C"
