// Native host-side core for the TPU SDP solver: the O(nnz) data-path work
// that sits OUTSIDE the XLA/Pallas compute graph.
//
// The reference delegates its host-side heavy lifting to Julia's compiled
// loops (reference: src/preprocess.jl:24-169 runs compiled Julia over the
// aggregate nnz arrays; exps/data_preprocess.jl parses multi-GB edge
// lists). The Python port would pay interpreter cost per nnz on both; this
// translation unit supplies the two hot paths as plain C ABI functions
// consumed through ctypes (sdplrplus_tpu/utils/native.py):
//
//   1. parse_edges / parse_gset — text edge-list ingestion at memory
//      bandwidth (the data-loader tier; reference: exps/data_preprocess.jl
//      read_gset/read_txt_gz),
//   2. ell_group_pack — stable "group-by id then pack into fixed-width ELL
//      rows" used by the problem compiler for the per-constraint entry
//      maps, the inverse position->constraint map, and the diagonal map
//      (reference: src/preprocess.jl:95-135; compile.py con/pos/diag
//      packing).
//
// Everything is deliberately allocation-free on the C side: Python
// preallocates outputs (numpy) and passes raw pointers.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// 1. Text ingestion
// ---------------------------------------------------------------------------

// Parse whitespace-separated edge lines "u v [w]" from a text buffer.
// Lines starting with '#' or '%' are skipped. Returns the number of edges
// written, or -1 if out_cap would be exceeded. Ids are written as-is
// (caller normalizes base). Missing weights default to 1.0.
int64_t parse_edges(const char* buf, int64_t len,
                    int64_t out_cap,
                    int64_t* out_i, int64_t* out_j, double* out_w) {
    int64_t m = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end) {
        // skip leading whitespace on the line
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
        if (p >= end) break;
        if (*p == '\n') { ++p; continue; }
        if (*p == '#' || *p == '%') {
            while (p < end && *p != '\n') ++p;
            continue;
        }
        // parse two integers and an optional weight
        char* q;
        long long u = strtoll(p, &q, 10);
        if (q == p) { while (p < end && *p != '\n') ++p; continue; }
        p = q;
        long long v = strtoll(p, &q, 10);
        if (q == p) { while (p < end && *p != '\n') ++p; continue; }
        p = q;
        double w = 1.0;
        // optional third column
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        if (p < end && *p != '\n' && *p != '\r') {
            w = strtod(p, &q);
            if (q == p) w = 1.0; else p = q;
        }
        while (p < end && *p != '\n') ++p;
        if (m >= out_cap) return -1;
        out_i[m] = (int64_t)u;
        out_j[m] = (int64_t)v;
        out_w[m] = w;
        ++m;
    }
    return m;
}

// Count data lines (upper bound on edges) — lets Python size the output.
int64_t count_lines(const char* buf, int64_t len) {
    int64_t c = 1;
    for (int64_t i = 0; i < len; ++i) c += (buf[i] == '\n');
    return c;
}

// ---------------------------------------------------------------------------
// 2. ELL group packing (the problem-compiler hot path)
// ---------------------------------------------------------------------------

// Entries arrive as (gid, col, val) triples with 0 <= gid < n_groups, in
// arbitrary order. Packs them into fixed-width rows:
//     out_col[g, r] / out_val[g, r]  for r < count(g) (first-come order,
//     stable within equal gid), remaining slots keep their fill values.
// out_cnt must be zero-initialized with n_groups entries; out_col/out_val
// must be pre-filled with the pad column / 0.0 by the caller.
// Returns the max group count (so the caller can detect W overflow), with
// entries beyond W counted but not written.
int64_t ell_group_pack(const int64_t* gid, const int32_t* col,
                       const double* val, int64_t n_entries,
                       int64_t n_groups, int64_t W,
                       int32_t* out_col, double* out_val,
                       int32_t* out_cnt) {
    int64_t maxc = 0;
    for (int64_t e = 0; e < n_entries; ++e) {
        int64_t g = gid[e];
        if (g < 0 || g >= n_groups) continue;
        int32_t r = out_cnt[g]++;
        if ((int64_t)r < W) {
            out_col[g * W + r] = col[e];
            out_val[g * W + r] = val[e];
        }
        if (out_cnt[g] > maxc) maxc = out_cnt[g];
    }
    return maxc;
}

// Same packing with TWO value arrays (the constraint maps need both the
// raw value and the off-diag-doubled value; reference: src/preprocess.jl
// nzval_one / nzval_two).
int64_t ell_group_pack2(const int64_t* gid, const int32_t* col,
                        const double* val1, const double* val2,
                        int64_t n_entries, int64_t n_groups, int64_t W,
                        int32_t* out_col, double* out_val1,
                        double* out_val2, int32_t* out_cnt) {
    int64_t maxc = 0;
    for (int64_t e = 0; e < n_entries; ++e) {
        int64_t g = gid[e];
        if (g < 0 || g >= n_groups) continue;
        int32_t r = out_cnt[g]++;
        if ((int64_t)r < W) {
            out_col[g * W + r] = col[e];
            out_val1[g * W + r] = val1[e];
            out_val2[g * W + r] = val2[e];
        }
        if (out_cnt[g] > maxc) maxc = out_cnt[g];
    }
    return maxc;
}

// Per-group entry counts only (first pass when W is not yet known).
int64_t group_counts(const int64_t* gid, int64_t n_entries,
                     int64_t n_groups, int32_t* out_cnt) {
    int64_t maxc = 0;
    for (int64_t e = 0; e < n_entries; ++e) {
        int64_t g = gid[e];
        if (g < 0 || g >= n_groups) continue;
        int32_t c = ++out_cnt[g];
        if (c > maxc) maxc = c;
    }
    return maxc;
}

}  // extern "C"
