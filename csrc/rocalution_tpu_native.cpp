// Native setup-phase kernels for rocalution_tpu.
//
// Reference parity: the host backend's sequential factorization kernels —
// ILU(0) (host_matrix_csr.cpp ILU0Factorize), IC(0) (ICFactorize), ILUT
// (host_ilut_driver_csr.cpp) — and the MatrixMarket body parser
// (host_io.cpp read_matrix_mtx). These are inherently sequential row sweeps
// the reference also runs on the host CPU; here they are the C++ layer under
// the JAX/XLA compute path (built once, loaded via ctypes).
//
// C ABI throughout; all functions return 0 on success, negative row index-1
// on breakdown.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <set>
#include <utility>
#include <vector>

extern "C" {

// In-place IKJ ILU(0) on a CSR matrix with sorted column indices.
// After return, data holds L (strict lower, unit diagonal implied) and U
// (upper incl diagonal) in place.
int64_t rt_ilu0_csr(int64_t n, const int64_t* indptr, const int32_t* cols,
                double* data) {
    std::vector<int64_t> dp(n, -1);        // diagonal position per row
    std::vector<int64_t> pos(n, -1);       // column -> position map (scratch)
    for (int64_t i = 0; i < n; ++i) {
        const int64_t rs = indptr[i], re = indptr[i + 1];
        for (int64_t p = rs; p < re; ++p) {
            pos[cols[p]] = p;
            if (cols[p] == i) dp[i] = p;
        }
        if (dp[i] < 0) return -i - 1;  // no diagonal
        for (int64_t p = rs; p < re && cols[p] < i; ++p) {
            const int64_t k = cols[p];
            const double dk = data[dp[k]];
            if (dk == 0.0) return -k - 1;
            const double lik = data[p] / dk;
            data[p] = lik;
            for (int64_t q = dp[k] + 1; q < indptr[k + 1]; ++q) {
                const int64_t j = pos[cols[q]];
                if (j >= 0) data[j] -= lik * data[q];
            }
        }
        for (int64_t p = rs; p < re; ++p) pos[cols[p]] = -1;
    }
    return 0;
}

// In-place IC(0) on the LOWER triangle (cols <= row, sorted, diagonal last
// in each row). After return, data holds L with A ~= L L^T.
int64_t rt_ic0_csr(int64_t n, const int64_t* indptr, const int32_t* cols,
               double* data) {
    std::vector<int64_t> pos(n, -1);
    for (int64_t i = 0; i < n; ++i) {
        const int64_t rs = indptr[i], re = indptr[i + 1];
        for (int64_t p = rs; p < re; ++p) pos[cols[p]] = p;
        for (int64_t p = rs; p < re - 1; ++p) {   // off-diagonals j < i
            const int64_t j = cols[p];
            const int64_t js = indptr[j], je = indptr[j + 1];
            double s = 0.0;
            for (int64_t q = js; q < je - 1; ++q) {   // row j cols < j
                const int64_t t = pos[cols[q]];
                if (t >= 0 && t < p) s += data[t] * data[q];
            }
            const double djj = data[je - 1];
            if (djj == 0.0) return -j - 1;
            data[p] = (data[p] - s) / djj;
        }
        double s = 0.0;
        for (int64_t p = rs; p < re - 1; ++p) s += data[p] * data[p];
        const double v = data[re - 1] - s;
        if (v <= 0.0) return -i - 1;
        data[re - 1] = std::sqrt(v);
        for (int64_t p = rs; p < re; ++p) pos[cols[p]] = -1;
    }
    return 0;
}

// ILUT(t, maxfill): threshold + max-fill incomplete LU.
// Outputs: per-row L (strict lower) and U (diag first, then upper) packed
// into caller-allocated arrays of capacity n*maxfill (L) and n*(maxfill+1)
// (U); l_count/u_count give entries per row.
int64_t rt_ilut_csr(int64_t n, const int64_t* indptr, const int32_t* cols,
                const double* data, double tol, int64_t maxfill,
                int32_t* l_cols, double* l_vals, int64_t* l_count,
                int32_t* u_cols, double* u_vals, int64_t* u_count) {
    std::vector<double> w(n, 0.0);
    std::vector<int64_t> occupied;      // sorted occupied columns
    occupied.reserve(256);
    // U rows stored as we go (diag first)
    std::vector<std::vector<int32_t>> Ucols(n);
    std::vector<std::vector<double>> Uvals(n);

    for (int64_t i = 0; i < n; ++i) {
        occupied.clear();
        const int64_t rs = indptr[i], re = indptr[i + 1];
        double row_norm = 0.0;
        for (int64_t p = rs; p < re; ++p) {
            w[cols[p]] = data[p];
            occupied.push_back(cols[p]);
            row_norm += data[p] * data[p];
        }
        std::sort(occupied.begin(), occupied.end());
        row_norm = std::sqrt(row_norm);
        const double drop = tol * (row_norm > 0 ? row_norm : 1.0);

        for (size_t oi = 0; oi < occupied.size(); ++oi) {
            const int64_t k = occupied[oi];
            if (k >= i) break;
            const double lik = w[k] / Uvals[k][0];
            if (std::fabs(lik) < drop) { w[k] = 0.0; continue; }
            w[k] = lik;
            const auto& uc = Ucols[k];
            const auto& uv = Uvals[k];
            for (size_t q = 1; q < uc.size(); ++q) {
                const int64_t c = uc[q];
                if (w[c] == 0.0) {
                    // new fill-in: keep `occupied` sorted
                    auto it = std::lower_bound(
                        occupied.begin(), occupied.end(), c);
                    if (it == occupied.end() || *it != c)
                        occupied.insert(it, c);
                    // re-fetch oi-invariant: insertion after position oi
                    // only (c > k >= occupied[oi]) so oi stays valid
                }
                w[c] -= lik * uv[q];
            }
        }
        if (w[i] == 0.0) return -i - 1;

        // split + threshold + keep largest `maxfill`
        std::vector<std::pair<double, int64_t>> lw, uw;
        for (int64_t c : occupied) {
            const double v = w[c];
            if (c < i) {
                if (std::fabs(v) >= drop && v != 0.0) lw.push_back({v, c});
            } else if (c > i) {
                if (std::fabs(v) >= drop) uw.push_back({v, c});
            }
            w[c] = (c == i) ? w[c] : w[c];
        }
        auto bymag = [](const std::pair<double, int64_t>& a,
                        const std::pair<double, int64_t>& b) {
            return std::fabs(a.first) > std::fabs(b.first);
        };
        if ((int64_t)lw.size() > maxfill) {
            std::nth_element(lw.begin(), lw.begin() + maxfill, lw.end(), bymag);
            lw.resize(maxfill);
        }
        if ((int64_t)uw.size() > maxfill) {
            std::nth_element(uw.begin(), uw.begin() + maxfill, uw.end(), bymag);
            uw.resize(maxfill);
        }
        auto bycol = [](const std::pair<double, int64_t>& a,
                        const std::pair<double, int64_t>& b) {
            return a.second < b.second;
        };
        std::sort(lw.begin(), lw.end(), bycol);
        std::sort(uw.begin(), uw.end(), bycol);

        int64_t lc = 0;
        for (auto& cv : lw) {
            l_cols[i * maxfill + lc] = (int32_t)cv.second;
            l_vals[i * maxfill + lc] = cv.first;
            ++lc;
        }
        l_count[i] = lc;
        Ucols[i].push_back((int32_t)i);
        Uvals[i].push_back(w[i]);
        for (auto& cv : uw) {
            Ucols[i].push_back((int32_t)cv.second);
            Uvals[i].push_back(cv.first);
        }
        int64_t uc2 = 0;
        for (size_t q = 0; q < Ucols[i].size(); ++q) {
            u_cols[i * (maxfill + 1) + uc2] = Ucols[i][q];
            u_vals[i * (maxfill + 1) + uc2] = Uvals[i][q];
            ++uc2;
        }
        u_count[i] = uc2;

        for (int64_t c : occupied) w[c] = 0.0;
        w[i] = 0.0;
    }
    return 0;
}

// Vanek greedy aggregation (reference: AMGGreedyAggregate,
// host_matrix_csr.cpp). Pass 1: nodes whose strong neighborhood is fully
// unaggregated seed an aggregate with it; pass 2: leftovers join an
// adjacent aggregate; pass 3: leftovers become singletons.
// agg must be pre-filled with -1. Returns the aggregate count.
int64_t rt_greedy_aggregate(int64_t n, const int64_t* indptr,
                            const int32_t* indices, int64_t* agg) {
    int64_t na = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        const int64_t rs = indptr[i], re = indptr[i + 1];
        if (re == rs) continue;
        bool all_free = true;
        for (int64_t p = rs; p < re; ++p)
            if (agg[indices[p]] != -1) { all_free = false; break; }
        if (all_free) {
            agg[i] = na;
            for (int64_t p = rs; p < re; ++p) agg[indices[p]] = na;
            ++na;
        }
    }
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            const int64_t a = agg[indices[p]];
            if (a != -1) { agg[i] = a; break; }
        }
    }
    for (int64_t i = 0; i < n; ++i)
        if (agg[i] == -1) agg[i] = na++;
    return na;
}

// Classical Ruge-Stueben greedy C/F splitting (reference parity:
// RSCoarsening, host_matrix_csr.cpp:6782; algorithm per Stuben's classical
// two-pass coarsening). Inputs: S (strength CSR: row i strongly depends on
// its columns) and its transpose ST (columns strongly depending on i).
// cf must be pre-initialized: 0 = undecided, 2 = pre-forced F (isolated).
// On return cf[i] in {1 (C), 2 (F)}. second_pass != 0 additionally promotes
// one point of every strong F-F pair lacking a common C neighbor.
// Returns the number of C points.
int64_t rt_rs_coarsening(int64_t n, const int64_t* s_ptr,
                         const int32_t* s_idx, const int64_t* st_ptr,
                         const int32_t* st_idx, int second_pass,
                         int8_t* cf) {
    std::vector<int64_t> lambda(n, 0);
    std::set<std::pair<int64_t, int64_t>> q;   // (lambda, node), max at end
    for (int64_t i = 0; i < n; ++i) {
        if (cf[i] != 0) continue;
        lambda[i] = st_ptr[i + 1] - st_ptr[i];
        q.insert({lambda[i], i});
    }
    auto bump = [&](int64_t l, int64_t delta) {
        q.erase({lambda[l], l});
        lambda[l] += delta;
        q.insert({lambda[l], l});
    };
    while (!q.empty()) {
        const int64_t i = std::prev(q.end())->second;
        q.erase(std::prev(q.end()));
        cf[i] = 1;                               // C point
        // undecided points strongly depending on i become F
        for (int64_t p = st_ptr[i]; p < st_ptr[i + 1]; ++p) {
            const int64_t j = st_idx[p];
            if (cf[j] != 0) continue;
            q.erase({lambda[j], j});
            cf[j] = 2;
            // their dependencies become more attractive C candidates
            for (int64_t t = s_ptr[j]; t < s_ptr[j + 1]; ++t) {
                const int64_t l = s_idx[t];
                if (cf[l] == 0) bump(l, +1);
            }
        }
        // i's own dependencies lose one potential dependent
        for (int64_t p = s_ptr[i]; p < s_ptr[i + 1]; ++p) {
            const int64_t l = s_idx[p];
            if (cf[l] == 0) bump(l, -1);
        }
    }
    if (second_pass) {
        std::vector<int64_t> mark(n, -1);        // C neighbors of current i
        for (int64_t i = 0; i < n; ++i) {
            if (cf[i] != 2) continue;
            for (int64_t p = s_ptr[i]; p < s_ptr[i + 1]; ++p)
                if (cf[s_idx[p]] == 1) mark[s_idx[p]] = i;
            for (int64_t p = s_ptr[i]; p < s_ptr[i + 1]; ++p) {
                const int64_t j = s_idx[p];
                if (cf[j] != 2) continue;
                bool common = false;
                for (int64_t t = s_ptr[j]; t < s_ptr[j + 1]; ++t)
                    if (cf[s_idx[t]] == 1 && mark[s_idx[t]] == i) {
                        common = true;
                        break;
                    }
                if (!common) {
                    cf[j] = 1;                   // promote j to C
                    mark[j] = i;                 // j now a common C for i
                }
            }
        }
    }
    int64_t nc = 0;
    for (int64_t i = 0; i < n; ++i) nc += cf[i] == 1;
    return nc;
}

// One Notay pairwise-matching pass (reference: PairwiseAMG
// InitialPairwiseAggregation, host_matrix_csr.cpp): visit nodes in `order`;
// each unmatched node pairs with its strongest negative unmatched neighbor
// among couplings <= beta * (row's most negative off-diagonal), else stays
// a singleton. new_id must be pre-filled with -1. Returns the pair count.
int64_t rt_pairwise_match(int64_t m, const int64_t* indptr,
                          const int32_t* indices, const double* data,
                          double beta, const int64_t* order,
                          int64_t* new_id) {
    int64_t na = 0;
    for (int64_t oi = 0; oi < m; ++oi) {
        const int64_t i = order[oi];
        if (new_id[i] != -1) continue;
        const int64_t rs = indptr[i], re = indptr[i + 1];
        double neg_min = 0.0;
        for (int64_t p = rs; p < re; ++p)
            if (indices[p] != i && data[p] < neg_min) neg_min = data[p];
        int64_t best = -1;
        double best_v = 0.0;
        for (int64_t p = rs; p < re; ++p) {
            const int64_t j = indices[p];
            const double v = data[p];
            if (j != i && new_id[j] == -1 && v < 0.0 &&
                v <= beta * neg_min && v < best_v) {
                best = j;
                best_v = v;
            }
        }
        new_id[i] = na;
        if (best >= 0) new_id[best] = na;
        ++na;
    }
    return na;
}

// MatrixMarket coordinate body parser: reads `nnz` lines of
// "row col [val [imag]]" from an already-positioned offset in the file.
// ncols_per_line: 2 (pattern), 3 (real/integer), 4 (complex).
int rt_mtx_body(const char* path, int64_t header_offset, int64_t nnz,
                int ncols_per_line, int64_t* rows, int64_t* cols,
                double* re_vals, double* im_vals) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    if (std::fseek(f, (long)header_offset, SEEK_SET) != 0) {
        std::fclose(f);
        return -2;
    }
    for (int64_t k = 0; k < nnz; ++k) {
        long long r, c;
        double re = 1.0, im = 0.0;
        int got = 0;
        if (ncols_per_line == 2) {
            got = std::fscanf(f, "%lld %lld", &r, &c) == 2;
        } else if (ncols_per_line == 3) {
            got = std::fscanf(f, "%lld %lld %lf", &r, &c, &re) == 3;
        } else {
            got = std::fscanf(f, "%lld %lld %lf %lf", &r, &c, &re, &im) == 4;
        }
        if (!got) { std::fclose(f); return -3; }
        rows[k] = (int64_t)r - 1;
        cols[k] = (int64_t)c - 1;
        re_vals[k] = re;
        if (im_vals) im_vals[k] = im;
    }
    std::fclose(f);
    return 0;
}

}  // extern "C"
