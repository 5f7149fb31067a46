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
#include <vector>

extern "C" {

// In-place IKJ ILU(0) on a CSR matrix with sorted column indices.
// After return, data holds L (strict lower, unit diagonal implied) and U
// (upper incl diagonal) in place.
int rt_ilu0_csr(int64_t n, const int64_t* indptr, const int32_t* cols,
                double* data) {
    std::vector<int64_t> dp(n, -1);        // diagonal position per row
    std::vector<int64_t> pos(n, -1);       // column -> position map (scratch)
    for (int64_t i = 0; i < n; ++i) {
        const int64_t rs = indptr[i], re = indptr[i + 1];
        for (int64_t p = rs; p < re; ++p) {
            pos[cols[p]] = p;
            if (cols[p] == i) dp[i] = p;
        }
        if (dp[i] < 0) return -(int)i - 1;  // no diagonal
        for (int64_t p = rs; p < re && cols[p] < i; ++p) {
            const int64_t k = cols[p];
            const double dk = data[dp[k]];
            if (dk == 0.0) return -(int)k - 1;
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
int rt_ic0_csr(int64_t n, const int64_t* indptr, const int32_t* cols,
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
            if (djj == 0.0) return -(int)j - 1;
            data[p] = (data[p] - s) / djj;
        }
        double s = 0.0;
        for (int64_t p = rs; p < re - 1; ++p) s += data[p] * data[p];
        const double v = data[re - 1] - s;
        if (v <= 0.0) return -(int)i - 1;
        data[re - 1] = std::sqrt(v);
        for (int64_t p = rs; p < re; ++p) pos[cols[p]] = -1;
    }
    return 0;
}

// ILUT(t, maxfill): threshold + max-fill incomplete LU.
// Outputs: per-row L (strict lower) and U (diag first, then upper) packed
// into caller-allocated arrays of capacity n*maxfill (L) and n*(maxfill+1)
// (U); l_count/u_count give entries per row.
int rt_ilut_csr(int64_t n, const int64_t* indptr, const int32_t* cols,
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
        if (w[i] == 0.0) return -(int)i - 1;

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
