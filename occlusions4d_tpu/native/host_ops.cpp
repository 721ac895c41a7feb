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

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Morton helper: spread the low 10 bits across every third bit.
inline uint32_t part1by2(uint32_t x) {
    x &= 0x3ffu;
    x = (x | (x << 16)) & 0x030000ffu;
    x = (x | (x << 8)) & 0x0300f00fu;
    x = (x | (x << 4)) & 0x030c30c3u;
    x = (x | (x << 2)) & 0x09249249u;
    return x;
}

// Plain O(n * n_out) greedy FPS (small-problem path; also the semantics
// oracle for the chunked variant below).
void fps_naive(const float* xyz, int64_t n, int64_t n_out, int64_t start_idx,
               int32_t* out_idx, float* scratch_min_d) {
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

}  // namespace

extern "C" {

// Farthest point sampling over (n, 3) float32 coordinates.
// out_idx must hold n_out int32. Selection starts at start_idx (deterministic when 0).
//
// Large problems use a QuickFPS-style chunked algorithm: points are sorted
// along a Morton curve into compact chunks with bounding boxes; each chunk
// tracks the (max, argmax) of its running min-distance field, and a chunk is
// skipped for an iteration when the squared distance from the new pick to its
// bbox is >= its stored max (then d(i, pick) >= lb >= max >= min_d[i] for
// every member, so no update can happen and the stored max/argmax stay
// valid). Chunks are grouped S-to-a-superchunk with union bboxes and the
// running max of their children's maxima; a superchunk whose bbox lower
// bound is >= that running max skips all 16 children with one test (the
// child bound is >= the super bound, so each child's own skip condition
// already held — the set of scanned chunks, and hence every float, is
// bit-identical to the flat scan). This turns the two O(n_out * nchunks)
// serial loops (per-chunk bound tests + global argmax) into
// O(n_out * nsupers) ones. The greedy pick sequence is exact; only the scan
// order used to break exact floating-point argmax ties differs from the
// naive loop. The dataloader's 14336-of-~170k input FPS drops from ~4 s to
// tens of ms.
void o4d_fps(const float* xyz, int64_t n, int64_t n_out, int64_t start_idx,
             int32_t* out_idx, float* scratch_min_d) {
    if (n <= 0 || n_out <= 0) return;
    if (n < 16384 || n_out < 256) {
        fps_naive(xyz, n, n_out, start_idx, out_idx, scratch_min_d);
        return;
    }

    // Morton-sort point order (indices only).
    float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int64_t i = 0; i < n; i++) {
        for (int c = 0; c < 3; c++) {
            const float v = xyz[i * 3 + c];
            if (v < lo[c]) lo[c] = v;
            if (v > hi[c]) hi[c] = v;
        }
    }
    float inv[3];
    for (int c = 0; c < 3; c++) {
        const float span = hi[c] - lo[c];
        inv[c] = span > 1e-12f ? 1023.0f / span : 0.0f;
    }
    std::vector<uint64_t> order(n);  // (morton << 32) | original index.
    for (int64_t i = 0; i < n; i++) {
        const uint32_t qx = (uint32_t)((xyz[i * 3 + 0] - lo[0]) * inv[0]);
        const uint32_t qy = (uint32_t)((xyz[i * 3 + 1] - lo[1]) * inv[1]);
        const uint32_t qz = (uint32_t)((xyz[i * 3 + 2] - lo[2]) * inv[2]);
        const uint64_t code = part1by2(qx) | (part1by2(qy) << 1)
                              | (part1by2(qz) << 2);
        order[i] = (code << 32) | (uint64_t)(uint32_t)i;
    }
    std::sort(order.begin(), order.end());

    // SoA in sorted order + per-chunk bboxes.
    const int64_t C = 256;
    const int64_t nchunks = (n + C - 1) / C;
    std::vector<float> px(n), py(n), pz(n), min_d(n, FLT_MAX);
    std::vector<int32_t> orig(n);
    std::vector<float> clo(nchunks * 3), chi(nchunks * 3);
    std::vector<float> cmax(nchunks, FLT_MAX);
    std::vector<int32_t> cargmax(nchunks, 0);
    int64_t cur_sorted = 0;
    for (int64_t i = 0; i < n; i++) {
        const int32_t oi = (int32_t)(order[i] & 0xffffffffu);
        px[i] = xyz[oi * 3 + 0];
        py[i] = xyz[oi * 3 + 1];
        pz[i] = xyz[oi * 3 + 2];
        orig[i] = oi;
        if (oi == (int32_t)start_idx) cur_sorted = i;
    }
    for (int64_t c = 0; c < nchunks; c++) {
        const int64_t i0 = c * C, i1 = std::min(n, i0 + C);
        float l0 = FLT_MAX, l1 = FLT_MAX, l2 = FLT_MAX;
        float h0 = -FLT_MAX, h1 = -FLT_MAX, h2 = -FLT_MAX;
        for (int64_t i = i0; i < i1; i++) {
            l0 = std::min(l0, px[i]); h0 = std::max(h0, px[i]);
            l1 = std::min(l1, py[i]); h1 = std::max(h1, py[i]);
            l2 = std::min(l2, pz[i]); h2 = std::max(h2, pz[i]);
        }
        clo[c * 3 + 0] = l0; clo[c * 3 + 1] = l1; clo[c * 3 + 2] = l2;
        chi[c * 3 + 0] = h0; chi[c * 3 + 1] = h1; chi[c * 3 + 2] = h2;
        cargmax[c] = (int32_t)i0;
    }

    // Superchunk level: union bboxes + running max over child maxima.
    const int64_t S = 32;
    const int64_t nsup = (nchunks + S - 1) / S;
    std::vector<float> slo(nsup * 3), shi(nsup * 3);
    std::vector<float> smax(nsup, FLT_MAX);
    std::vector<int32_t> schild(nsup);
    for (int64_t u = 0; u < nsup; u++) {
        const int64_t c0 = u * S, c1 = std::min(nchunks, c0 + S);
        for (int d = 0; d < 3; d++) {
            float l = FLT_MAX, h = -FLT_MAX;
            for (int64_t c = c0; c < c1; c++) {
                l = std::min(l, clo[c * 3 + d]);
                h = std::max(h, chi[c * 3 + d]);
            }
            slo[u * 3 + d] = l;
            shi[u * 3 + d] = h;
        }
        schild[u] = (int32_t)c0;
    }

    out_idx[0] = (int32_t)start_idx;
    for (int64_t s = 1; s < n_out; s++) {
        const float cx = px[cur_sorted];
        const float cy = py[cur_sorted];
        const float cz = pz[cur_sorted];
        for (int64_t u = 0; u < nsup; u++) {
            const float sx = std::max({slo[u * 3 + 0] - cx, cx - shi[u * 3 + 0], 0.0f});
            const float sy = std::max({slo[u * 3 + 1] - cy, cy - shi[u * 3 + 1], 0.0f});
            const float sz = std::max({slo[u * 3 + 2] - cz, cz - shi[u * 3 + 2], 0.0f});
            // Super bound <= every child bound: skipping here is exactly the
            // per-child skip firing for all 16 children.
            if (sx * sx + sy * sy + sz * sz >= smax[u]) continue;
            const int64_t c0 = u * S, c1 = std::min(nchunks, c0 + S);
            bool touched = false;
            for (int64_t c = c0; c < c1; c++) {
                const float gx = std::max({clo[c * 3 + 0] - cx, cx - chi[c * 3 + 0], 0.0f});
                const float gy = std::max({clo[c * 3 + 1] - cy, cy - chi[c * 3 + 1], 0.0f});
                const float gz = std::max({clo[c * 3 + 2] - cz, cz - chi[c * 3 + 2], 0.0f});
                const float lb2 = gx * gx + gy * gy + gz * gz;
                if (lb2 >= cmax[c]) continue;  // no member's min_d can change.
                touched = true;
                const int64_t i0 = c * C, i1 = std::min(n, i0 + C);
                // Pass 1 (SIMD): distance + min-update + max-reduce. The
                // running (max, argmax) pair of the old single pass carries a
                // scalar dependence that blocks vectorization; a value-only
                // max reduction vectorizes, and a short second scan recovers
                // the FIRST index attaining it - the same tie-break the
                // scalar `nd > m` update produced.
                float m = -1.0f;
                #pragma omp simd reduction(max: m)
                for (int64_t i = i0; i < i1; i++) {
                    const float dx = px[i] - cx;
                    const float dy = py[i] - cy;
                    const float dz = pz[i] - cz;
                    const float d = dx * dx + dy * dy + dz * dz;
                    const float nd = d < min_d[i] ? d : min_d[i];
                    min_d[i] = nd;
                    m = nd > m ? nd : m;
                }
                int64_t mi = i0;
                for (int64_t i = i0; i < i1; i++)
                    if (min_d[i] == m) { mi = i; break; }
                cmax[c] = m;
                cargmax[c] = (int32_t)mi;
            }
            if (touched || smax[u] == FLT_MAX) {
                // Recompute the running (max, first-argmax) over the children
                // (also resolves the FLT_MAX sentinel once real maxima exist).
                float m = -1.0f;
                int64_t mc = c0;
                for (int64_t c = c0; c < c1; c++) {
                    if (cmax[c] > m) { m = cmax[c]; mc = c; }
                }
                smax[u] = m;
                schild[u] = (int32_t)mc;
            }
        }
        float best = -1.0f;
        int64_t best_u = 0;
        for (int64_t u = 0; u < nsup; u++) {
            if (smax[u] > best) { best = smax[u]; best_u = u; }
        }
        cur_sorted = cargmax[schild[best_u]];
        out_idx[s] = orig[cur_sorted];
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
