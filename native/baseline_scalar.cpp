// Measured CPU baseline for bench.py: the reference's local-POA kernels
// (AlgoLab/RecGraph src/local_poa.rs) re-implemented in C++ and timed on
// this host, standing in for the Rust binary that cannot be built here
// (no toolchain, zero egress — BASELINE.md).
//
// Two variants, mirroring the reference's structures:
//  - baseline_local_scalar: the i32 scalar `exec` path
//    (local_poa.rs:181-293): full m + packed path matrices, per-row
//    pred loop, D/U/L with zero floor and running best.
//  - baseline_local_avx2: the f32 `exec_simd` path (local_poa.rs:9-179):
//    8-lane j-loop, per-pred vertical max via cmp/blend, scalar L
//    fix-up per 8-block, scalar tail.
//
// Deliberately *favourable* to the reference: score lookups use a dense
// 7x7 table where the Rust uses a HashMap per cell (local_poa.rs:35-44),
// and matrices are preallocated flat buffers where the Rust allocates
// Vec<Vec<_>> per read.  The measured Gcells/s is therefore an upper
// bound on what the Rust binary would do on this host, which makes the
// reported vs_baseline a lower bound.

#include <immintrin.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int GAP = 5;  // '-' row/col in the 7x7 table (scoring.py)

}  // namespace

extern "C" {

// Fills every read against the graph `repeats` times; returns elapsed
// seconds.  out_scores[r] = best local score of read r (last repeat),
// for validation against the oracle.
double baseline_local_scalar(
    const int8_t* codes, const uint8_t* node_start, const int32_t* pred_idx,
    int n, int max_preds, const int32_t* table, const int8_t* reads,
    const int32_t* lens, int n_reads, int stride, int repeats,
    int32_t* out_scores) {
    int lmax = 0;
    for (int r = 0; r < n_reads; ++r) lmax = std::max(lmax, lens[r]);
    std::vector<int32_t> m((size_t)n * lmax);
    std::vector<uint32_t> path((size_t)n * lmax);
    auto t0 = std::chrono::steady_clock::now();
    for (int rep = 0; rep < repeats; ++rep) {
        for (int r = 0; r < n_reads; ++r) {
            const int8_t* read = reads + (size_t)r * stride;  // '$' at [0]
            const int L = lens[r];
            int32_t* M = m.data();
            uint32_t* P = path.data();
            std::memset(M, 0, sizeof(int32_t) * (size_t)n * L);
            int best_i = 0, best_j = 0;
            int32_t best = 0;
            for (int i = 1; i < n - 1; ++i) {
                const int32_t* srow = table + 7 * codes[i];
                const int32_t gap_i = table[7 * codes[i] + GAP];
                int32_t* Mi = M + (size_t)i * L;
                uint32_t* Pi = P + (size_t)i * L;
                const int32_t* preds = pred_idx + (size_t)i * max_preds;
                const bool start = node_start[i];
                for (int j = 1; j < L; ++j) {
                    const int rc = read[j];
                    int32_t d, u;
                    int dp, up;
                    if (!start) {
                        const int32_t* Mp = M + (size_t)(i - 1) * L;
                        d = Mp[j - 1];
                        u = Mp[j];
                        dp = up = i - 1;
                    } else {
                        d = u = INT32_MIN / 2;
                        dp = up = 0;
                        for (int pk = 0; pk < max_preds; ++pk) {
                            const int p = preds[pk];
                            if (p < 0) break;
                            const int32_t* Mp = M + (size_t)p * L;
                            if (Mp[j - 1] > d) { d = Mp[j - 1]; dp = p; }
                            if (Mp[j] > u) { u = Mp[j]; up = p; }
                        }
                    }
                    d += srow[rc];
                    u += gap_i;
                    const int32_t l = Mi[j - 1] + table[7 * rc + GAP];
                    int32_t v = d >= u ? d : u;
                    uint32_t cell = d >= u ? (uint32_t)(dp << 4 | 1)
                                          : (uint32_t)(up << 4 | 4);
                    if (l > v) { v = l; cell = (uint32_t)(i << 4 | 3); }
                    if (v < 0) { v = 0; cell = 0; }
                    Mi[j] = v;
                    Pi[j] = cell;
                    if (v > best) { best = v; best_i = i; best_j = j; }
                }
            }
            out_scores[r] = best;
            (void)best_i; (void)best_j;
        }
    }
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now() - t0).count();
}

// The reference's AVX2 layout: f32 matrices, 8-lane D/U with per-pred
// blends, scalar L fix-up inside each 8-block, scalar tail columns.
__attribute__((target("avx2"))) double baseline_local_avx2(
    const int8_t* codes, const uint8_t* node_start, const int32_t* pred_idx,
    int n, int max_preds, const float* tablef, const int8_t* reads,
    const int32_t* lens, int n_reads, int stride, int repeats,
    float* out_scores) {
    int lmax = 0;
    for (int r = 0; r < n_reads; ++r) lmax = std::max(lmax, lens[r]);
    std::vector<float> m((size_t)n * lmax);
    std::vector<float> path((size_t)n * lmax);
    auto t0 = std::chrono::steady_clock::now();
    for (int rep = 0; rep < repeats; ++rep) {
        for (int r = 0; r < n_reads; ++r) {
            const int8_t* read = reads + (size_t)r * stride;
            const int L = lens[r];
            float* M = m.data();
            float* P = path.data();
            std::memset(M, 0, sizeof(float) * (size_t)n * L);
            const int max_multiple = (L % 8 != 0) ? (L / 8) * 8 : L - 8;
            int best_i = 0, best_j = 0;
            const __m256 d_move = _mm256_set1_ps(0.1f);
            const __m256 u_move = _mm256_set1_ps(0.2f);
            for (int i = 1; i < n - 1; ++i) {
                const float* srow = tablef + 7 * codes[i];
                const float gap_i = srow[GAP];
                const __m256 us_update = _mm256_set1_ps(gap_i);
                float* Mi = M + (size_t)i * L;
                float* Pi = P + (size_t)i * L;
                const int32_t* preds = pred_idx + (size_t)i * max_preds;
                const bool start = node_start[i];
                for (int j = 1; j < max_multiple + 1; j += 8) {
                    const __m256 ds_update = _mm256_set_ps(
                        srow[read[j + 7]], srow[read[j + 6]],
                        srow[read[j + 5]], srow[read[j + 4]],
                        srow[read[j + 3]], srow[read[j + 2]],
                        srow[read[j + 1]], srow[read[j]]);
                    __m256 best_us, best_ds, pred_us, pred_ds;
                    if (!start) {
                        const float* Mp = M + (size_t)(i - 1) * L;
                        best_us = _mm256_loadu_ps(Mp + j);
                        best_ds = _mm256_loadu_ps(Mp + j - 1);
                        pred_us = pred_ds = _mm256_set1_ps((float)(i - 1));
                    } else {
                        const float* Mp = M + (size_t)preds[0] * L;
                        best_us = _mm256_loadu_ps(Mp + j);
                        best_ds = _mm256_loadu_ps(Mp + j - 1);
                        pred_us = pred_ds = _mm256_set1_ps((float)preds[0]);
                        for (int pk = 1; pk < max_preds; ++pk) {
                            const int p = preds[pk];
                            if (p < 0) break;
                            const float* Mq = M + (size_t)p * L;
                            const __m256 us = _mm256_loadu_ps(Mq + j);
                            const __m256 ds = _mm256_loadu_ps(Mq + j - 1);
                            const __m256 ps = _mm256_set1_ps((float)p);
                            __m256 c = _mm256_cmp_ps(us, best_us, _CMP_GT_OS);
                            best_us = _mm256_blendv_ps(best_us, us, c);
                            pred_us = _mm256_blendv_ps(pred_us, ps, c);
                            c = _mm256_cmp_ps(ds, best_ds, _CMP_GT_OS);
                            best_ds = _mm256_blendv_ps(best_ds, ds, c);
                            pred_ds = _mm256_blendv_ps(pred_ds, ps, c);
                        }
                    }
                    best_us = _mm256_add_ps(best_us, us_update);
                    best_ds = _mm256_add_ps(best_ds, ds_update);
                    const __m256 choice =
                        _mm256_cmp_ps(best_ds, best_us, _CMP_GT_OS);
                    _mm256_storeu_ps(
                        Mi + j, _mm256_blendv_ps(best_us, best_ds, choice));
                    const __m256 dir = _mm256_blendv_ps(
                        _mm256_add_ps(pred_us, u_move),
                        _mm256_add_ps(pred_ds, d_move), choice);
                    _mm256_storeu_ps(Pi + j, dir);
                    // scalar L fix-up + zero floor + best (local_poa.rs:100-113)
                    for (int idx = j; idx < std::min(j + 8, L); ++idx) {
                        const float l =
                            Mi[idx - 1] + tablef[7 * read[j] + GAP];
                        if (l > Mi[idx]) {
                            Mi[idx] = l;
                            Pi[idx] = (float)i + 0.3f;
                        }
                        if (Mi[idx] <= 0.0f) {
                            Mi[idx] = 0.0f;
                            Pi[idx] = 0.0f;
                        }
                        if (Mi[idx] >= M[(size_t)best_i * L + best_j]) {
                            best_i = i;
                            best_j = idx;
                        }
                    }
                }
                for (int j = max_multiple + 1; j < L; ++j) {
                    const int rc = read[j];
                    float d, u;
                    if (!start) {
                        const float* Mp = M + (size_t)(i - 1) * L;
                        d = Mp[j - 1];
                        u = Mp[j];
                    } else {
                        d = u = -3e38f;
                        for (int pk = 0; pk < max_preds; ++pk) {
                            const int p = preds[pk];
                            if (p < 0) break;
                            const float* Mq = M + (size_t)p * L;
                            d = std::max(d, Mq[j - 1]);
                            u = std::max(u, Mq[j]);
                        }
                    }
                    d += srow[rc];
                    u += gap_i;
                    const float l = Mi[j - 1] + tablef[7 * rc + GAP];
                    float v = std::max(std::max(d, u), l);
                    if (v < 0.0f) v = 0.0f;
                    Mi[j] = v;
                    Pi[j] = v;
                    if (v >= M[(size_t)best_i * L + best_j]) {
                        best_i = i;
                        best_j = j;
                    }
                }
            }
            out_scores[r] = M[(size_t)best_i * L + best_j];
        }
    }
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now() - t0).count();
}

}  // extern "C"
