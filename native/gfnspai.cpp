// Native host-side components for gflownet_spai_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host
// runtime work the Python reference leaves to third-party native code
// (SURVEY.md §2 row L0: scipy SuperLU spilu, torch C++ sparse setup):
//
//   gfn_parse_mtx    — Matrix Market coordinate parser (data loader)
//   gfn_ilu0         — ILU(0) numeric factorization on CSR
//   gfn_rcm          — reverse Cuthill–McKee BFS ordering
//   gfn_spgemm_plan  — symbolic sparse product (pair lists for the
//                      fixed-pattern SpGEMM plan, SpGEMMPlan in ops.py)
//
// C ABI, ctypes-friendly: functions allocate outputs with malloc and the
// caller releases them with gfn_free.  All index types are int64.
//
// Build: make -C native   (g++ -O3 -fPIC -shared)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

void gfn_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Matrix Market parser
// ---------------------------------------------------------------------------
// Returns 0 on success.  Outputs: COO triplets (0-based, symmetry expanded),
// *sorted* row-major.  field: real/integer/pattern.  Supported symmetry:
// general / symmetric / skew-symmetric.
int gfn_parse_mtx(const char* path,
                  int64_t* nrows_out, int64_t* ncols_out, int64_t* nnz_out,
                  int64_t** rows_out, int64_t** cols_out, double** vals_out) {
  FILE* f = fopen(path, "r");
  if (!f) return 1;
  char line[1 << 16];
  if (!fgets(line, sizeof line, f)) { fclose(f); return 2; }
  // header: %%MatrixMarket matrix coordinate <field> <symmetry>
  char obj[64] = {0}, fmt[64] = {0}, field[64] = {0}, sym[64] = {0};
  if (sscanf(line, "%%%%MatrixMarket %63s %63s %63s %63s", obj, fmt, field,
             sym) != 4) { fclose(f); return 2; }
  for (char* p = fmt; *p; ++p) *p = (char)tolower(*p);
  for (char* p = field; *p; ++p) *p = (char)tolower(*p);
  for (char* p = sym; *p; ++p) *p = (char)tolower(*p);
  if (strcmp(fmt, "coordinate") != 0) { fclose(f); return 3; }
  bool pattern = strcmp(field, "pattern") == 0;
  bool symmetric = strcmp(sym, "symmetric") == 0;
  bool skew = strcmp(sym, "skew-symmetric") == 0;
  // reject anything we don't implement (complex values, hermitian mirror)
  // so the caller falls back to the full Python parser instead of reading
  // a silently corrupted matrix
  if (!pattern && strcmp(field, "real") != 0 && strcmp(field, "integer") != 0) {
    fclose(f); return 5;
  }
  if (!symmetric && !skew && strcmp(sym, "general") != 0) {
    fclose(f); return 5;
  }

  do {
    if (!fgets(line, sizeof line, f)) { fclose(f); return 2; }
  } while (line[0] == '%');
  long long nr, nc, nz;
  if (sscanf(line, "%lld %lld %lld", &nr, &nc, &nz) != 3) { fclose(f); return 2; }

  // bulk-read the remainder and parse with strtoll/strtod (fscanf is ~3×
  // slower than numpy.loadtxt; this path is ~10× faster)
  long body_start = ftell(f);
  fseek(f, 0, SEEK_END);
  long body_len = ftell(f) - body_start;
  fseek(f, body_start, SEEK_SET);
  std::vector<char> buf((size_t)body_len + 1);
  size_t got = fread(buf.data(), 1, (size_t)body_len, f);
  buf[got] = '\0';
  fclose(f);

  std::vector<int64_t> rows, cols;
  std::vector<double> vals;
  rows.reserve((size_t)nz * (symmetric || skew ? 2 : 1));
  cols.reserve(rows.capacity());
  vals.reserve(rows.capacity());
  char* p = buf.data();
  for (long long k = 0; k < nz; ++k) {
    char* end;
    long long r = strtoll(p, &end, 10);
    if (end == p) return 2;
    p = end;
    long long c = strtoll(p, &end, 10);
    if (end == p) return 2;
    p = end;
    double v = 1.0;
    if (!pattern) {
      v = strtod(p, &end);
      if (end == p) return 2;
      p = end;
    }
    rows.push_back(r - 1); cols.push_back(c - 1); vals.push_back(v);
    if ((symmetric || skew) && r != c) {
      rows.push_back(c - 1); cols.push_back(r - 1);
      vals.push_back(skew ? -v : v);
    }
  }

  // sort row-major
  size_t m = rows.size();
  std::vector<int64_t> order(m);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return rows[a] != rows[b] ? rows[a] < rows[b] : cols[a] < cols[b];
  });

  auto* ro = (int64_t*)malloc(m * sizeof(int64_t));
  auto* co = (int64_t*)malloc(m * sizeof(int64_t));
  auto* vo = (double*)malloc(m * sizeof(double));
  if (!ro || !co || !vo) { free(ro); free(co); free(vo); return 4; }
  for (size_t i = 0; i < m; ++i) {
    ro[i] = rows[order[i]]; co[i] = cols[order[i]]; vo[i] = vals[order[i]];
  }
  *nrows_out = nr; *ncols_out = nc; *nnz_out = (int64_t)m;
  *rows_out = ro; *cols_out = co; *vals_out = vo;
  return 0;
}

// ---------------------------------------------------------------------------
// ILU(0): in-place on a copy of CSR values; unit-diagonal L implied.
// ---------------------------------------------------------------------------
// indptr[n+1], indices[nnz] must be row-sorted CSR.  lu_vals_out gets the
// combined L\U values aligned with `indices`.  Returns 0, or 1+row on a
// zero pivot.
int gfn_ilu0(int64_t n, const int64_t* indptr, const int64_t* indices,
             const double* vals, double** lu_vals_out) {
  auto* a = (double*)malloc((size_t)indptr[n] * sizeof(double));
  if (!a) return -1;
  memcpy(a, vals, (size_t)indptr[n] * sizeof(double));
  // diag position per row
  std::vector<int64_t> diag(n, -1);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (indices[p] == i) { diag[i] = p; break; }

  std::vector<int64_t> pos(n, -1);  // column -> position in current row i
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) pos[indices[p]] = p;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j >= i) break;  // row-sorted: L part first
      if (diag[j] < 0 || a[diag[j]] == 0.0) { free(a); return (int)(1 + j); }
      double lij = a[p] / a[diag[j]];
      a[p] = lij;
      for (int64_t q = diag[j] + 1; q < indptr[j + 1]; ++q) {
        int64_t k = indices[q];
        int64_t ip = pos[k];
        if (ip >= indptr[i] && ip < indptr[i + 1]) a[ip] -= lij * a[q];
      }
    }
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) pos[indices[p]] = -1;
  }
  *lu_vals_out = a;
  return 0;
}

// ---------------------------------------------------------------------------
// Reverse Cuthill–McKee on a symmetrized CSR graph.
// ---------------------------------------------------------------------------
int gfn_rcm(int64_t n, const int64_t* indptr, const int64_t* indices,
            int64_t** perm_out) {
  std::vector<int64_t> degree(n);
  for (int64_t i = 0; i < n; ++i) degree[i] = indptr[i + 1] - indptr[i];
  std::vector<char> visited(n, 0);
  auto* order = (int64_t*)malloc((size_t)n * sizeof(int64_t));
  if (!order) return -1;
  int64_t posn = 0;

  std::vector<int64_t> by_degree(n);
  std::iota(by_degree.begin(), by_degree.end(), 0);
  std::stable_sort(by_degree.begin(), by_degree.end(),
                   [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });

  std::vector<int64_t> nbrs;
  for (int64_t s : by_degree) {
    if (visited[s]) continue;
    visited[s] = 1;
    order[posn++] = s;
    int64_t head = posn - 1;
    while (head < posn) {
      int64_t u = order[head++];
      nbrs.clear();
      for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p)
        if (!visited[indices[p]]) nbrs.push_back(indices[p]);
      std::stable_sort(nbrs.begin(), nbrs.end(), [&](int64_t a, int64_t b) {
        return degree[a] < degree[b];
      });
      for (int64_t v : nbrs) {
        if (!visited[v]) { visited[v] = 1; order[posn++] = v; }
      }
    }
  }
  std::reverse(order, order + n);
  *perm_out = order;
  return 0;
}

// ---------------------------------------------------------------------------
// Symbolic SpGEMM plan: pairs (a-entry, b-entry) per output nonzero.
// ---------------------------------------------------------------------------
// A given as sorted COO (rows_a/cols_a, nnz_a), B as CSR (indptr_b over
// n_mid rows, indices_b).  Outputs: unique output keys (row-major order),
// and pair lists sorted by output slot.
int gfn_spgemm_plan(int64_t nnz_a, const int64_t* rows_a, const int64_t* cols_a,
                    int64_t n_mid, int64_t ncols_b,
                    const int64_t* indptr_b, const int64_t* indices_b,
                    int64_t* out_nnz, int64_t* n_pairs,
                    int64_t** out_row, int64_t** out_col,
                    int64_t** pair_a, int64_t** pair_b, int64_t** pair_out) {
  // count pairs
  size_t total = 0;
  for (int64_t e = 0; e < nnz_a; ++e)
    total += (size_t)(indptr_b[cols_a[e] + 1] - indptr_b[cols_a[e]]);

  std::vector<int64_t> pa(total), pb(total), key(total);
  size_t t = 0;
  for (int64_t e = 0; e < nnz_a; ++e) {
    int64_t mid = cols_a[e];
    for (int64_t p = indptr_b[mid]; p < indptr_b[mid + 1]; ++p) {
      pa[t] = e;
      pb[t] = p;
      key[t] = rows_a[e] * ncols_b + indices_b[p];
      ++t;
    }
  }
  std::vector<int64_t> order(total);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return key[a] < key[b]; });

  auto* PA = (int64_t*)malloc(total * sizeof(int64_t));
  auto* PB = (int64_t*)malloc(total * sizeof(int64_t));
  auto* PO = (int64_t*)malloc(total * sizeof(int64_t));
  std::vector<int64_t> ukeys;
  ukeys.reserve(total);
  int64_t slot = -1, prev = INT64_MIN;
  for (size_t i = 0; i < total; ++i) {
    int64_t o = order[i];
    if (key[o] != prev) { ukeys.push_back(key[o]); prev = key[o]; ++slot; }
    PA[i] = pa[o]; PB[i] = pb[o]; PO[i] = slot;
  }
  auto* OR = (int64_t*)malloc(ukeys.size() * sizeof(int64_t));
  auto* OC = (int64_t*)malloc(ukeys.size() * sizeof(int64_t));
  for (size_t i = 0; i < ukeys.size(); ++i) {
    OR[i] = ukeys[i] / ncols_b;
    OC[i] = ukeys[i] % ncols_b;
  }
  *out_nnz = (int64_t)ukeys.size();
  *n_pairs = (int64_t)total;
  *out_row = OR; *out_col = OC;
  *pair_a = PA; *pair_b = PB; *pair_out = PO;
  (void)n_mid;
  return 0;
}

}  // extern "C"
