// Fused per-nnz row-dot microbenchmark — the truest available proxy for
// the reference's hand-SIMD Julia `mydot` loop (reference:
// src/coreop.jl:153-203), which computes uvt[p] = dot(R[ti[p],:],
// D[tj[p],:]) WITHOUT materializing the gathered copies that
// numpy's R[ti] fancy-indexing (and torch index_select) create.
// Built and driven by exps/baseline_bound.py via ctypes; pinned to one
// thread by construction (plain loop, no OpenMP).
//
//   g++ -O3 -march=native -shared -fPIC -o librowdot.so rowdot_bench.cpp

#include <cstdint>

extern "C" {

// uvt[p] = sum_k R[ti[p]*r + k] * D[tj[p]*r + k]   (row-major R, D)
void rowdot_f64(const double* R, const double* D,
                const int64_t* ti, const int64_t* tj,
                double* uvt, int64_t P, int64_t r) {
    for (int64_t p = 0; p < P; ++p) {
        const double* a = R + ti[p] * r;
        const double* b = D + tj[p] * r;
        double acc = 0.0;
        for (int64_t k = 0; k < r; ++k) acc += a[k] * b[k];
        uvt[p] = acc;
    }
}

}  // extern "C"
