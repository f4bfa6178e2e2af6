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

// ---------------------------------------------------------------------------
// Banded baselines (VERDICT r3 missing #2): the reference's BANDED
// mode-0 scalar loop (global_abpoa.rs:260-427) and affine mode-2 loop
// (gap_global_abpoa.rs:26-250), so bench.py's vs_baseline for those
// modes compares like with like.  Same favourable-to-the-reference
// conventions as above: dense 7x7 tables (the Rust does a HashMap get
// per cell) and flat preallocated buffers (the Rust allocates
// Vec<BitVec> PATH CELLS per row).  Cell accounting: *cells_out
// accumulates sum(right-left) over rows — the cells the banded loop
// actually computes — so callers can use one honest convention on both
// sides of the ratio.

namespace {

// utils.rs:17-72 set_ampl_for_row (simd_version=false)
inline void set_ampl(int i, const int32_t* preds, int max_preds, bool start,
                     int32_t r_val, const int32_t* bsp, int seq_len, int bta,
                     int& left, int& right) {
    int64_t ms, me;
    if (i == 0) {
        ms = me = 0;
    } else if (!start) {
        // the reference passes an empty p_arr for single-pred rows
        ms = me = (int64_t)bsp[i - 1] + 1;
    } else {
        int64_t pl = bsp[preds[0]], pr = pl;
        for (int pk = 1; pk < max_preds && preds[pk] >= 0; ++pk) {
            pl = std::min(pl, (int64_t)bsp[preds[pk]]);
            pr = std::max(pr, (int64_t)bsp[preds[pk]]);
        }
        ms = pl + 1;
        me = pr + 1;
    }
    int64_t tmp_bs = std::min(ms, (int64_t)seq_len - r_val - bta);
    left = tmp_bs < 0 ? 0 : (int)tmp_bs;
    if (seq_len > r_val)
        right = (int)std::min((int64_t)seq_len,
                              std::max(me, (int64_t)seq_len - r_val) + bta);
    else
        right = (int)std::min((int64_t)seq_len, me + bta);
}

}  // namespace

// Banded global POA (mode 0), global_abpoa.rs `exec`.  m is stored
// per-row at flat offset i*seq_len (bands never exceed seq_len).
double baseline_global_banded(
    const int8_t* codes, const uint8_t* node_start, const int32_t* pred_idx,
    const int32_t* r_values, int n, int max_preds, const int32_t* table,
    const int8_t* reads, const int32_t* lens, const int32_t* btas,
    int n_reads, int stride, int repeats, int32_t* out_scores,
    int64_t* cells_out) {
    int lmax = 0;
    for (int r = 0; r < n_reads; ++r) lmax = std::max(lmax, lens[r]);
    std::vector<int32_t> m((size_t)n * lmax);
    std::vector<int32_t> lefts(n), rights(n), bsp(n, 0);
    int64_t cells = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int rep = 0; rep < repeats; ++rep) {
        for (int r = 0; r < n_reads; ++r) {
            const int8_t* read = reads + (size_t)r * stride;  // '$' at [0]
            const int L = lens[r];
            const int bta = btas[r];
            int32_t* M = m.data();
            for (int i = 0; i < n - 1; ++i) {
                const int32_t* preds = pred_idx + (size_t)i * max_preds;
                const bool start = node_start[i];
                int left, right;
                set_ampl(i, preds, max_preds, start, r_values[i], bsp.data(),
                         L, bta, left, right);
                lefts[i] = left;
                rights[i] = right;
                cells += right - left;
                int32_t* Mi = M + (size_t)i * L;
                const int32_t* srow = table + 7 * codes[i];
                const int32_t gap_i = srow[GAP];
                int min_p = i - 1;
                if (start) {
                    min_p = preds[0];
                    for (int pk = 1; pk < max_preds && preds[pk] >= 0; ++pk)
                        min_p = std::min(min_p, (int)preds[pk]);
                }
                int best_val_pos = 0;
                for (int j = 0; j < right - left; ++j) {
                    int32_t v;
                    if (i == 0 && j == 0) {
                        v = 0;
                    } else if (i == 0) {
                        // ('-', seq) orientation (global_abpoa.rs:306)
                        v = Mi[j - 1] + table[7 * GAP + read[j + left]];
                    } else if (j == 0 && left == 0) {
                        // ('-', lnz[i]) orientation (global_abpoa.rs:316)
                        v = M[(size_t)min_p * L] + table[7 * GAP + codes[i]];
                    } else {
                        const int ja = j + left;  // absolute column
                        // L candidate (in-band previous column or the
                        // out-of-band fallback, global_abpoa.rs:324-341)
                        int32_t l;
                        if (j > 0)
                            l = Mi[j - 1] + table[7 * read[ja] + GAP];
                        else
                            l = table[7 * read[ja] + GAP] * (i + left + j);
                        // U and D over band-covered preds
                        int32_t u = 0, d = 0;
                        bool has_u = false, has_d = false;
                        const int np = start ? max_preds : 1;
                        for (int pk = 0; pk < np; ++pk) {
                            const int p = start ? preds[pk] : i - 1;
                            if (p < 0) break;
                            const int lp = lefts[p], rp = rights[p];
                            const int32_t* Mp = M + (size_t)p * L;
                            if (ja >= lp && ja < rp) {
                                const int32_t cu = Mp[ja - lp];
                                if (!has_u || cu > u) { u = cu; has_u = true; }
                            }
                            if (ja > lp && ja <= rp) {
                                const int32_t cd = Mp[ja - lp - 1];
                                if (!has_d || cd > d) { d = cd; has_d = true; }
                            }
                        }
                        u = has_u ? u + gap_i : gap_i * (i + left + j);
                        d = has_d ? d + srow[read[ja]] : gap_i * (i + left);
                        // tie order D >= U >= L (utils.rs get_max_d_u_l)
                        v = d >= u ? (d >= l ? d : l) : (u >= l ? u : l);
                    }
                    Mi[j] = v;
                    if (v >= Mi[best_val_pos]) best_val_pos = j;
                }
                bsp[i] = best_val_pos + left;
            }
            // best over the sink's preds (global_abpoa.rs:397-405)
            int last_row = n - 2;
            int32_t best = M[(size_t)last_row * L + (rights[last_row] - lefts[last_row] - 1)];
            const int32_t* fpreds = pred_idx + (size_t)(n - 1) * max_preds;
            for (int pk = 0; pk < max_preds && fpreds[pk] >= 0; ++pk) {
                const int p = fpreds[pk];
                const int32_t v = M[(size_t)p * L + (rights[p] - lefts[p] - 1)];
                if (v > best) best = v;
            }
            out_scores[r] = best;
        }
    }
    *cells_out = cells;
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now() - t0).count();
}

// Banded affine-gap global POA (mode 2), gap_global_abpoa.rs `exec`.
double baseline_gap_global_banded(
    const int8_t* codes, const uint8_t* node_start, const int32_t* pred_idx,
    const int32_t* r_values, int n, int max_preds, const int32_t* table,
    int32_t o, int32_t e, const int8_t* reads, const int32_t* lens,
    const int32_t* btas, int n_reads, int stride, int repeats,
    int32_t* out_scores, int64_t* cells_out) {
    int lmax = 0;
    for (int r = 0; r < n_reads; ++r) lmax = std::max(lmax, lens[r]);
    std::vector<int32_t> m((size_t)n * lmax), x((size_t)n * lmax),
        y((size_t)n * lmax);
    std::vector<int32_t> lefts(n), rights(n), bsp(n, 0);
    int64_t cells = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int rep = 0; rep < repeats; ++rep) {
        for (int r = 0; r < n_reads; ++r) {
            const int8_t* read = reads + (size_t)r * stride;
            const int L = lens[r];
            const int bta = btas[r];
            int32_t *M = m.data(), *X = x.data(), *Y = y.data();
            for (int i = 0; i < n - 1; ++i) {
                const int32_t* preds = pred_idx + (size_t)i * max_preds;
                const bool start = node_start[i];
                int left, right;
                set_ampl(i, preds, max_preds, start, r_values[i], bsp.data(),
                         L, bta, left, right);
                lefts[i] = left;
                rights[i] = right;
                cells += right - left;
                int32_t* Mi = M + (size_t)i * L;
                int32_t* Xi = X + (size_t)i * L;
                int32_t* Yi = Y + (size_t)i * L;
                const int32_t* srow = table + 7 * codes[i];
                int min_p = i - 1;
                if (start) {
                    min_p = preds[0];
                    for (int pk = 1; pk < max_preds && preds[pk] >= 0; ++pk)
                        min_p = std::min(min_p, (int)preds[pk]);
                }
                int best_val_pos = 0;
                for (int j = 0; j < right - left; ++j) {
                    if (i == 0 && j == 0) {
                        Mi[0] = 0;
                    } else if (i == 0) {
                        Yi[j] = o + e * (j + left);
                        Mi[j] = Yi[j];
                    } else if (j == 0 && left == 0) {
                        Xi[0] = o + e * (min_p + 1);
                        Mi[0] = Xi[0];
                    } else {
                        const int ja = j + left;
                        // x (in-sequence gap), gap_global_abpoa.rs:102-122
                        int32_t l;
                        if (j > 0) {
                            const int32_t lx = Xi[j - 1];
                            const int32_t lm = Mi[j - 1] + o;
                            l = (lx > lm ? lx : lm) + e;
                        } else {
                            l = 2 * o + e * (min_p + 1) + e * ja;
                        }
                        Xi[j] = l;
                        // y (in-graph gap) over band-covered preds (:124-144)
                        int32_t um = 0, uy = 0;
                        bool has_u = false;
                        int32_t d = 0;
                        bool has_d = false;
                        const int np = start ? max_preds : 1;
                        for (int pk = 0; pk < np; ++pk) {
                            const int p = start ? preds[pk] : i - 1;
                            if (p < 0) break;
                            const int lp = lefts[p], rp = rights[p];
                            if (ja >= lp && ja < rp) {
                                const int32_t cm = M[(size_t)p * L + ja - lp] + o;
                                const int32_t cy = Y[(size_t)p * L + ja - lp];
                                if (!has_u) { um = cm; uy = cy; has_u = true; }
                                if (cm > um) um = cm;
                                if (cy > uy) uy = cy;
                            }
                            if (ja > lp && ja <= rp) {
                                const int32_t cd = M[(size_t)p * L + ja - lp - 1];
                                if (!has_d || cd > d) { d = cd; has_d = true; }
                            }
                        }
                        int32_t u;
                        if (has_u)
                            u = (uy > um ? uy : um) + e;
                        else
                            u = 2 * o + e * (min_p + 1) + e * ja;
                        Yi[j] = u;
                        // m: d vs x vs y, reference tie order (:146-195)
                        int32_t v;
                        if (has_d) {
                            d += srow[read[ja]];
                            if (d < l)
                                v = l < u ? u : l;
                            else
                                v = d < u ? u : d;
                        } else {
                            v = l < u ? u : l;
                        }
                        Mi[j] = v;
                    }
                    if (Mi[j] >= Mi[best_val_pos]) best_val_pos = j;
                }
                bsp[i] = best_val_pos + left;
            }
            int last_row = n - 2;
            int32_t best = M[(size_t)last_row * L + (rights[last_row] - lefts[last_row] - 1)];
            const int32_t* fpreds = pred_idx + (size_t)(n - 1) * max_preds;
            for (int pk = 0; pk < max_preds && fpreds[pk] >= 0; ++pk) {
                const int p = fpreds[pk];
                const int32_t v = M[(size_t)p * L + (rights[p] - lefts[p] - 1)];
                if (v > best) best = v;
            }
            out_scores[r] = best;
        }
    }
    *cells_out = cells;
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now() - t0).count();
}

}  // extern "C"
