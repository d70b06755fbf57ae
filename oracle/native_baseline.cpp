// Compiled single-core PIHNA baseline: element assembly + BSR BiCGStab.
//
// Purpose (round-4 verdict item 2): the published CPU baseline for the
// north-star comparison was the scipy/NumPy oracle's measured single-core
// speed x ideal 8-rank MPI scaling, with an UNMEASURED assertion that
// compiled C++ (libMesh/PETSc) assembly is of similar per-core speed.
// This program measures that: the same linearized-CN PIHNA step
// (reference src/pihna.C:318-758 — 5 RHS blocks, 25 Jacobian blocks,
// 5-point Keast rule) written as straightforward compiled C++ in the
// reference's algorithmic class: per-element dense matrices scattered
// into a preallocated sparse matrix (PETSc MATBAIJ analogue: block-CSR
// with 5x5 nodal blocks) and a Jacobi-scaled BiCGStab to rtol 1e-10
// (PETSc KSP analogue).  Single-threaded; the MPI baseline is derived as
// measured-per-core x 8 ideal ranks, exactly like the scipy derivation.
//
// Input: a binary case dump (see oracle/measure_native_baseline.py):
//   int64 N, E, n_steps
//   f64 coords[N*3]; int64 conn[E*4]; f64 u0[N*5]; f64 params[20]
// argv: case_file [u_out_file]
// Output: one JSON line on stdout; optionally dumps u after the last
// timed step (N x 5 f64, node-major) for a parity diff vs the oracle.
//
// Build: g++ -O3 -march=native -std=c++17 (oracle/Makefile).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <chrono>
#include <vector>

using std::int64_t;
using std::size_t;

// 5-point degree-3 Keast rule on the reference tet (libMesh
// QGauss(3, THIRD) — same rule as oracle/pihna_numpy.py)
static const double QP[5][3] = {
    {0.25, 0.25, 0.25},
    {1.0 / 6, 1.0 / 6, 1.0 / 6},
    {1.0 / 6, 1.0 / 6, 0.5},
    {1.0 / 6, 0.5, 1.0 / 6},
    {0.5, 1.0 / 6, 1.0 / 6},
};
static const double QW[5] = {-2.0 / 15, 3.0 / 40, 3.0 / 40, 3.0 / 40,
                             3.0 / 40};
static const int Q = 5, K = 4, V = 5;

struct Params {
  double dt, cells_min_capacity, cells_max_capacity,
      cells_max_capacity_exponent, cytokines_max_capacity, necrosis_c,
      necrosis_h, necrosis_v, produce_c, produce_v, switch_c2h, switch_h2c,
      switch_h2n, diffuse_c, diffuse_h, diffuse_v, taxis_c, taxis_h, taxis_v,
      secrete_a_c, secrete_a_h, uptake_a_v, decay_a;
};
static const int N_PARAMS = 23;

struct Case {
  int64_t N, E, n_steps;
  std::vector<double> coords;   // N*3
  std::vector<int64_t> conn;    // E*4
  std::vector<double> u0;       // N*5 node-major
  Params p;
};

static Case read_case(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(1); }
  Case c;
  int64_t hdr[3];
  if (std::fread(hdr, sizeof(int64_t), 3, f) != 3) std::exit(1);
  c.N = hdr[0]; c.E = hdr[1]; c.n_steps = hdr[2];
  c.coords.resize(c.N * 3);
  c.conn.resize(c.E * 4);
  c.u0.resize(c.N * 5);
  double pbuf[N_PARAMS];
  if (std::fread(c.coords.data(), 8, c.coords.size(), f) != c.coords.size())
    std::exit(1);
  if (std::fread(c.conn.data(), 8, c.conn.size(), f) != c.conn.size())
    std::exit(1);
  if (std::fread(c.u0.data(), 8, c.u0.size(), f) != c.u0.size()) std::exit(1);
  if (std::fread(pbuf, 8, N_PARAMS, f) != (size_t)N_PARAMS) std::exit(1);
  std::fclose(f);
  std::memcpy(&c.p, pbuf, sizeof(Params));
  return c;
}

// ---------------------------------------------------------------------
// Block-CSR (5x5 nodal blocks) over the node-pair sparsity
// ---------------------------------------------------------------------
struct Bsr {
  int64_t N;
  std::vector<int64_t> rowptr;  // N+1
  std::vector<int64_t> col;     // nnzb
  std::vector<double> val;      // nnzb * 25, block-row-major
};

int main(int argc, char **argv) {
  if (argc < 2) { std::fprintf(stderr, "usage: %s case [u_out]\n", argv[0]);
                  return 1; }
  Case c = read_case(argv[1]);
  const int64_t N = c.N, E = c.E;
  const Params &p = c.p;

  // --- geometry: dphi[e][k][3], JxW[e][q] (affine TET4) ----------------
  static const double DN[4][3] = {{-1, -1, -1}, {1, 0, 0}, {0, 1, 0},
                                  {0, 0, 1}};
  std::vector<double> dphi(E * K * 3), JxW(E * Q);
  for (int64_t e = 0; e < E; ++e) {
    const int64_t *cn = &c.conn[e * 4];
    double J[3][3] = {};  // J[i][d] = dx_d/dxi_i
    for (int k = 0; k < K; ++k)
      for (int i = 0; i < 3; ++i)
        for (int d = 0; d < 3; ++d)
          J[i][d] += DN[k][i] * c.coords[cn[k] * 3 + d];
    double det = J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1]) -
                 J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0]) +
                 J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0]);
    double inv[3][3];  // inv[d][i] = dxi_i/dx_d (inverse transposed below)
    double id = 1.0 / det;
    inv[0][0] = (J[1][1] * J[2][2] - J[1][2] * J[2][1]) * id;
    inv[0][1] = (J[0][2] * J[2][1] - J[0][1] * J[2][2]) * id;
    inv[0][2] = (J[0][1] * J[1][2] - J[0][2] * J[1][1]) * id;
    inv[1][0] = (J[1][2] * J[2][0] - J[1][0] * J[2][2]) * id;
    inv[1][1] = (J[0][0] * J[2][2] - J[0][2] * J[2][0]) * id;
    inv[1][2] = (J[0][2] * J[1][0] - J[0][0] * J[1][2]) * id;
    inv[2][0] = (J[1][0] * J[2][1] - J[1][1] * J[2][0]) * id;
    inv[2][1] = (J[0][1] * J[2][0] - J[0][0] * J[2][1]) * id;
    inv[2][2] = (J[0][0] * J[1][1] - J[0][1] * J[1][0]) * id;
    // chain rule: dphi/dx_d = sum_i dN/dxi_i * dxi_i/dx_d, and with
    // J[i][d] = dx_d/dxi_i the xi->x derivative is dxi_i/dx_d =
    // (J^-1)[d][i] (inverse of the TRANSPOSED map) — so contract inv's
    // FIRST index with d
    for (int k = 0; k < K; ++k)
      for (int d = 0; d < 3; ++d)
        dphi[(e * K + k) * 3 + d] = DN[k][0] * inv[d][0] +
                                    DN[k][1] * inv[d][1] +
                                    DN[k][2] * inv[d][2];
    double adet = std::fabs(det);
    for (int q = 0; q < Q; ++q) JxW[e * Q + q] = adet * QW[q];
  }

  // PHI[q][k]
  double PHI[Q][K];
  for (int q = 0; q < Q; ++q) {
    PHI[q][1] = QP[q][0]; PHI[q][2] = QP[q][1]; PHI[q][3] = QP[q][2];
    PHI[q][0] = 1.0 - QP[q][0] - QP[q][1] - QP[q][2];
  }

  // --- node-pair sparsity + per-element slot table ---------------------
  // (PETSc-style preallocation: structure built once, values rewritten)
  std::vector<std::vector<int64_t>> adj(N);
  for (int64_t e = 0; e < E; ++e) {
    const int64_t *cn = &c.conn[e * 4];
    for (int a = 0; a < K; ++a)
      for (int b = 0; b < K; ++b) adj[cn[a]].push_back(cn[b]);
  }
  Bsr A;
  A.N = N;
  A.rowptr.assign(N + 1, 0);
  for (int64_t n = 0; n < N; ++n) {
    auto &v = adj[n];
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    A.rowptr[n + 1] = A.rowptr[n] + (int64_t)v.size();
  }
  int64_t nnzb = A.rowptr[N];
  A.col.resize(nnzb);
  for (int64_t n = 0; n < N; ++n)
    std::copy(adj[n].begin(), adj[n].end(), A.col.begin() + A.rowptr[n]);
  A.val.assign(nnzb * 25, 0.0);
  std::vector<int64_t> eslot(E * K * K);
  for (int64_t e = 0; e < E; ++e) {
    const int64_t *cn = &c.conn[e * 4];
    for (int a = 0; a < K; ++a) {
      int64_t lo = A.rowptr[cn[a]], hi = A.rowptr[cn[a] + 1];
      for (int b = 0; b < K; ++b) {
        const int64_t *it = std::lower_bound(&A.col[lo], &A.col[hi], cn[b]);
        eslot[(e * K + a) * K + b] = it - A.col.data();
      }
    }
  }
  adj.clear(); adj.shrink_to_fit();

  const double DT2 = p.dt / 2.0;
  const double Kk = p.cells_max_capacity, ek = p.cells_max_capacity_exponent,
               Ka = p.cytokines_max_capacity, Lk = p.cells_min_capacity;

  std::vector<double> u(c.u0), F(N * V), x(N * V), diag(N * V);
  std::vector<double> r(N * V), rhat(N * V), pv(N * V), vv(N * V),
      s(N * V), t(N * V), ph(N * V), sh(N * V);

  // --- one step: assemble + Jacobi-BiCGStab + clamp --------------------
  auto assemble = [&](const std::vector<double> &uo) {
    std::fill(A.val.begin(), A.val.end(), 0.0);
    std::fill(F.begin(), F.end(), 0.0);
    for (int64_t e = 0; e < E; ++e) {
      const int64_t *cn = &c.conn[e * 4];
      const double *dp = &dphi[e * K * 3];
      const double *w = &JxW[e * Q];
      double ue[K][V];
      for (int k = 0; k < K; ++k)
        for (int v = 0; v < V; ++v) ue[k][v] = uo[cn[k] * V + v];
      // gradients are q-invariant on TET4
      double g[V][3] = {};
      for (int v = 0; v < V; ++v)
        for (int k = 0; k < K; ++k)
          for (int d = 0; d < 3; ++d) g[v][d] += ue[k][v] * dp[k * 3 + d];
      const double *Gc = g[1], *Gh = g[2], *Gv = g[3], *Ga = g[4];
      // GG[i][j] = dphi_i . dphi_j
      double GG[K][K];
      for (int a = 0; a < K; ++a)
        for (int b = 0; b < K; ++b)
          GG[a][b] = dp[a * 3] * dp[b * 3] + dp[a * 3 + 1] * dp[b * 3 + 1] +
                     dp[a * 3 + 2] * dp[b * 3 + 2];
      double Ke[V][K][V][K] = {};
      double Fe[V][K] = {};
      double Dsum[V][V] = {};  // q-summed diffusion coefficients
      for (int q = 0; q < Q; ++q) {
        double uq[V];
        for (int v = 0; v < V; ++v) {
          uq[v] = 0.0;
          for (int k = 0; k < K; ++k) uq[v] += ue[k][v] * PHI[q][k];
        }
        const double n_o = uq[0], c_o = uq[1], h_o = uq[2], v_o = uq[3],
                     a_o = uq[4];
        // coefficients (reference src/pihna.C:444-509)
        double Te = (n_o + c_o + h_o + v_o) / Kk;
        bool interior = Te > 0.0 && Te < 1.0;
        double base = interior ? 1.0 - Te : 1.0;
        double Tau = Te <= 0.0 ? 1.0 : (interior ? std::pow(base, ek) : 0.0);
        double Tau_d =
            interior ? (-ek / Kk) * std::pow(base, ek - 1.0) : 0.0;
        double ssum = c_o + h_o + v_o;
        double safe = ssum == 0.0 ? 1.0 : ssum;
        double Ve_ = v_o / safe;
        bool vint = Ve_ > 0.0 && Ve_ < 1.0;
        double Ve = std::min(1.0, std::max(0.0, Ve_));
        double Ve_dch = vint ? -Ve_ / safe : 0.0;
        double Ve_dv = vint ? (1.0 - Ve_) / safe : 0.0;
        double Ua = a_o / (a_o + Ka);
        double Ua_da = 1.0 / (a_o + Ka) - Ua / (a_o + Ka);
        double dif_c = c_o > Lk ? p.diffuse_c : 0.0;
        double tax_c = c_o > Lk ? p.taxis_c : 0.0;
        double dif_h = h_o > Lk ? p.diffuse_h : 0.0;
        double tax_h = h_o > Lk ? p.taxis_h : 0.0;
        double dif_v = v_o > Lk ? p.diffuse_v : 0.0;
        double tax_v = v_o > Lk ? p.taxis_v : 0.0;

        const double wq = w[q];
        // mass coefficients m[i][j] (src/pihna.C:571-747)
        double m[V][V] = {};
        m[0][0] = 1.0 - DT2 * (p.necrosis_c * c_o + p.necrosis_h * h_o +
                               p.necrosis_v * v_o);
        m[0][1] = -DT2 * (p.necrosis_c * n_o + p.switch_h2n * (-Ve_dch) * h_o);
        m[0][2] = -DT2 * (p.necrosis_h * n_o + p.switch_h2n * (-Ve_dch) * h_o +
                          p.switch_h2n * (1.0 - Ve));
        m[0][3] = -DT2 * (p.necrosis_v * n_o + p.switch_h2n * (-Ve_dv) * h_o);
        m[1][0] = -DT2 * (p.produce_c * Tau_d * c_o - p.necrosis_c * c_o);
        m[1][1] = 1.0 - DT2 * (p.produce_c * Tau + p.produce_c * Tau_d * c_o -
                               p.switch_c2h * (1.0 - Ve) -
                               p.switch_c2h * (-Ve_dch) * c_o +
                               p.switch_h2c * Ve_dch * h_o -
                               p.necrosis_c * n_o);
        m[1][2] = -DT2 * (p.produce_c * Tau_d * c_o -
                          p.switch_c2h * (-Ve_dch) * c_o +
                          p.switch_h2c * Ve_dch * h_o + p.switch_h2c * Ve);
        m[1][3] = -DT2 * (p.produce_c * Tau_d * c_o -
                          p.switch_c2h * (-Ve_dv) * c_o +
                          p.switch_h2c * Ve_dv * h_o);
        m[2][0] = -DT2 * (-p.necrosis_h * h_o);
        m[2][1] = -DT2 * (p.switch_c2h * (1.0 - Ve) +
                          p.switch_c2h * (-Ve_dch) * c_o -
                          p.switch_h2c * Ve_dch * h_o -
                          p.switch_h2n * (-Ve_dch) * h_o);
        m[2][2] = 1.0 - DT2 * (p.switch_c2h * (-Ve_dch) * c_o -
                               p.switch_h2c * Ve_dch * h_o -
                               p.switch_h2c * Ve - p.necrosis_h * n_o -
                               p.switch_h2n * (-Ve_dch) * h_o -
                               p.switch_h2n * (1.0 - Ve));
        m[2][3] = -DT2 * (p.switch_c2h * (-Ve_dv) * c_o -
                          p.switch_h2c * Ve_dv * h_o -
                          p.switch_h2n * (-Ve_dv) * h_o);
        m[3][0] = -DT2 * (p.produce_v * Tau_d * Ua * v_o -
                          p.necrosis_v * v_o);
        m[3][1] = -DT2 * (p.produce_v * Tau_d * Ua * v_o);
        m[3][2] = -DT2 * (p.produce_v * Tau_d * Ua * v_o);
        m[3][3] = 1.0 - DT2 * (p.produce_v * Tau_d * Ua * v_o -
                               p.necrosis_v * n_o);
        m[3][4] = -DT2 * (p.produce_v * Tau * Ua_da * v_o);
        m[4][1] = -DT2 * p.secrete_a_c;
        m[4][2] = -DT2 * p.secrete_a_h;
        m[4][3] = -DT2 * (-p.uptake_a_v * a_o);
        m[4][4] = 1.0 - DT2 * (-p.uptake_a_v * v_o - p.decay_a);

        // advection coefficients adv[i][j][3]: (vec . dphi_i) * phi_j
        double adv[V][V][3] = {};
        bool has_adv[V][V] = {};
        for (int d = 0; d < 3; ++d) {
          double c_common = -DT2 * (-(dif_c * Tau_d) * Gc[d] -
                                    (tax_c * Tau_d * c_o) * Gv[d]);
          adv[1][0][d] = c_common;
          adv[1][1][d] = c_common - DT2 * (-(tax_c * Tau) * Gv[d]);
          adv[1][2][d] = c_common;
          adv[1][3][d] = c_common;
          double h_common = -DT2 * (-(dif_h * Tau_d) * Gh[d] -
                                    (tax_h * Tau_d * h_o) * Gv[d]);
          adv[2][0][d] = h_common;
          adv[2][1][d] = h_common;
          adv[2][2][d] = h_common - DT2 * (-(tax_h * Tau) * Gv[d]);
          adv[2][3][d] = h_common;
          double v_common = -DT2 * (-(dif_v * Tau_d) * Gv[d] -
                                    (tax_v * Tau_d * v_o) * Ga[d]);
          adv[3][0][d] = v_common;
          adv[3][1][d] = v_common;
          adv[3][2][d] = v_common;
          adv[3][3][d] = v_common - DT2 * (-(tax_v * Tau) * Ga[d]);
        }
        for (int j = 0; j < 4; ++j) {
          has_adv[1][j] = has_adv[2][j] = has_adv[3][j] = true;
        }

        // diffusion coefficients (q-summed; contracted with GG after)
        Dsum[1][1] += wq * (-DT2 * (-dif_c * Tau));
        Dsum[1][3] += wq * (-DT2 * (-tax_c * Tau * c_o));
        Dsum[2][2] += wq * (-DT2 * (-dif_h * Tau));
        Dsum[2][3] += wq * (-DT2 * (-tax_h * Tau * h_o));
        Dsum[3][3] += wq * (-DT2 * (-dif_v * Tau));
        Dsum[3][4] += wq * (-DT2 * (-tax_v * Tau * v_o));

        // RHS (src/pihna.C:514-566)
        double f[V], fgv[V][3] = {};
        f[0] = n_o + DT2 * (p.necrosis_c * c_o * n_o +
                            p.necrosis_h * h_o * n_o +
                            p.necrosis_v * v_o * n_o +
                            p.switch_h2n * (1.0 - Ve) * h_o);
        f[1] = c_o + DT2 * (p.produce_c * Tau * c_o -
                            p.switch_c2h * (1.0 - Ve) * c_o +
                            p.switch_h2c * Ve * h_o -
                            p.necrosis_c * c_o * n_o);
        f[2] = h_o + DT2 * (p.switch_c2h * (1.0 - Ve) * c_o -
                            p.switch_h2c * Ve * h_o -
                            p.necrosis_h * h_o * n_o -
                            p.switch_h2n * (1.0 - Ve) * h_o);
        f[3] = v_o + DT2 * (p.produce_v * Tau * Ua * v_o -
                            p.necrosis_v * v_o * n_o);
        f[4] = a_o + DT2 * (p.secrete_a_c * c_o + p.secrete_a_h * h_o -
                            p.uptake_a_v * v_o * a_o - p.decay_a * a_o);
        for (int d = 0; d < 3; ++d) {
          fgv[1][d] = DT2 * (-(dif_c * Tau) * Gc[d] -
                             (tax_c * Tau * c_o) * Gv[d]);
          fgv[2][d] = DT2 * (-(dif_h * Tau) * Gh[d] -
                             (tax_h * Tau * h_o) * Gv[d]);
          fgv[3][d] = DT2 * (-(dif_v * Tau) * Gv[d] -
                             (tax_v * Tau * v_o) * Ga[d]);
        }

        // contract this qp into Ke / Fe
        for (int vi = 0; vi < V; ++vi) {
          for (int ki = 0; ki < K; ++ki) {
            Fe[vi][ki] += wq * f[vi] * PHI[q][ki];
            if (vi >= 1 && vi <= 3)
              Fe[vi][ki] += wq * (fgv[vi][0] * dp[ki * 3] +
                                  fgv[vi][1] * dp[ki * 3 + 1] +
                                  fgv[vi][2] * dp[ki * 3 + 2]);
          }
          for (int vj = 0; vj < V; ++vj) {
            const double mm = wq * m[vi][vj];
            const bool ha = has_adv[vi][vj];
            double vd[K];
            if (ha)
              for (int ki = 0; ki < K; ++ki)
                vd[ki] = wq * (adv[vi][vj][0] * dp[ki * 3] +
                               adv[vi][vj][1] * dp[ki * 3 + 1] +
                               adv[vi][vj][2] * dp[ki * 3 + 2]);
            if (mm == 0.0 && !ha) continue;
            for (int ki = 0; ki < K; ++ki)
              for (int kj = 0; kj < K; ++kj) {
                double add = mm * PHI[q][ki] * PHI[q][kj];
                if (ha) add += vd[ki] * PHI[q][kj];
                Ke[vi][ki][vj][kj] += add;
              }
          }
        }
      }
      // q-summed diffusion blocks
      for (int vi = 0; vi < V; ++vi)
        for (int vj = 0; vj < V; ++vj) {
          double dcf = Dsum[vi][vj];
          if (dcf == 0.0) continue;
          for (int ki = 0; ki < K; ++ki)
            for (int kj = 0; kj < K; ++kj)
              Ke[vi][ki][vj][kj] += dcf * GG[ki][kj];
        }
      // scatter into BSR values + RHS (PETSc MatSetValues analogue via
      // the precomputed slot table)
      for (int ki = 0; ki < K; ++ki)
        for (int kj = 0; kj < K; ++kj) {
          double *blk = &A.val[eslot[(e * K + ki) * K + kj] * 25];
          for (int vi = 0; vi < V; ++vi)
            for (int vj = 0; vj < V; ++vj)
              blk[vi * V + vj] += Ke[vi][ki][vj][kj];
        }
      for (int vi = 0; vi < V; ++vi)
        for (int ki = 0; ki < K; ++ki) F[cn[ki] * V + vi] += Fe[vi][ki];
    }
  };

  auto spmv = [&](const std::vector<double> &xin, std::vector<double> &yout) {
    for (int64_t n = 0; n < N; ++n) {
      double acc[V] = {};
      for (int64_t s2 = A.rowptr[n]; s2 < A.rowptr[n + 1]; ++s2) {
        const double *blk = &A.val[s2 * 25];
        const double *xb = &xin[A.col[s2] * V];
        for (int vi = 0; vi < V; ++vi)
          for (int vj = 0; vj < V; ++vj) acc[vi] += blk[vi * V + vj] * xb[vj];
      }
      double *yb = &yout[n * V];
      for (int vi = 0; vi < V; ++vi) yb[vi] = acc[vi];
    }
  };

  auto dot = [&](const std::vector<double> &a, const std::vector<double> &b) {
    double s2 = 0.0;
    for (size_t i = 0; i < a.size(); ++i) s2 += a[i] * b[i];
    return s2;
  };

  // Jacobi-scaled BiCGStab (scipy-oracle solver analogue, rtol 1e-10)
  auto solve = [&](int64_t *iters_out) {
    for (int64_t n = 0; n < N; ++n) {
      for (int64_t s2 = A.rowptr[n]; s2 < A.rowptr[n + 1]; ++s2)
        if (A.col[s2] == n) {
          const double *blk = &A.val[s2 * 25];
          for (int vi = 0; vi < V; ++vi) {
            double d = blk[vi * V + vi];
            diag[n * V + vi] = d == 0.0 ? 1.0 : d;
          }
        }
    }
    std::fill(x.begin(), x.end(), 0.0);
    double bnorm2 = dot(F, F);
    double tol2 = 1e-20 * (bnorm2 == 0.0 ? 1.0 : bnorm2);  // (1e-10)^2
    r = F;  // x0 = 0
    rhat = r;
    double rho = 1.0, alpha = 1.0, omega = 1.0;
    std::fill(pv.begin(), pv.end(), 0.0);
    std::fill(vv.begin(), vv.end(), 0.0);
    int64_t it = 0;
    const int64_t maxiter = 2000;
    while (dot(r, r) > tol2 && it < maxiter) {
      double rho1 = dot(rhat, r);
      if (rho1 == 0.0) break;
      double beta = (rho1 / rho) * (alpha / omega);
      for (size_t i = 0; i < pv.size(); ++i)
        pv[i] = r[i] + beta * (pv[i] - omega * vv[i]);
      for (size_t i = 0; i < pv.size(); ++i) ph[i] = pv[i] / diag[i];
      spmv(ph, vv);
      double rtv = dot(rhat, vv);
      if (rtv == 0.0) break;
      alpha = rho1 / rtv;
      for (size_t i = 0; i < s.size(); ++i) s[i] = r[i] - alpha * vv[i];
      for (size_t i = 0; i < s.size(); ++i) sh[i] = s[i] / diag[i];
      spmv(sh, t);
      double tt = dot(t, t);
      omega = tt == 0.0 ? 0.0 : dot(t, s) / tt;
      for (size_t i = 0; i < x.size(); ++i)
        x[i] += alpha * ph[i] + omega * sh[i];
      for (size_t i = 0; i < r.size(); ++i) r[i] = s[i] - omega * t[i];
      rho = rho1;
      ++it;
      if (omega == 0.0) break;
    }
    *iters_out = it;
    return std::sqrt(dot(r, r) / (bnorm2 == 0.0 ? 1.0 : bnorm2));
  };

  auto one_step = [&](int64_t *iters_out) {
    assemble(u);
    double res = solve(iters_out);
    for (int64_t i = 0; i < N * V; ++i) u[i] = std::max(x[i], 0.0);
    return res;
  };

  // --dumpsys: assemble once from u0 and dump F plus A @ xtest
  // (xtest[i] = sin(i+1)) so the harness can diff the assembled system
  // against the scipy oracle to machine eps — solution-level diffs are
  // conditioning-limited (the deck's variable scales span ~13 orders)
  if (argc > 3 && std::strcmp(argv[3], "--dumpsys") == 0) {
    assemble(u);
    std::vector<double> xt(N * V), yt(N * V);
    for (int64_t i = 0; i < N * V; ++i) xt[i] = std::sin((double)(i + 1));
    spmv(xt, yt);
    FILE *f = std::fopen(argv[2], "wb");
    if (f) {
      std::fwrite(F.data(), 8, F.size(), f);
      std::fwrite(yt.data(), 8, yt.size(), f);
      std::fclose(f);
    }
    std::printf("{\"dumpsys\": true}\n");
    return 0;
  }

  // warm-up step (untimed, like the scipy measurement), then timed steps
  int64_t it0 = 0;
  double res0 = one_step(&it0);
  auto t0 = std::chrono::steady_clock::now();
  int64_t iters_total = 0;
  double res_last = 0.0;
  for (int64_t s2 = 0; s2 < c.n_steps; ++s2) {
    int64_t it = 0;
    res_last = one_step(&it);
    iters_total += it;
  }
  double wall =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();

  if (argc > 2) {
    FILE *f = std::fopen(argv[2], "wb");
    if (f) { std::fwrite(u.data(), 8, u.size(), f); std::fclose(f); }
  }
  std::printf(
      "{\"workload\": \"pihna\", \"impl\": \"native-c++\", "
      "\"steps_per_sec\": %.4f, \"sec_per_step\": %.3f, \"n_steps\": %lld, "
      "\"warm_iters\": %lld, \"iters_total\": %lld, \"residual\": %.3e, "
      "\"warm_residual\": %.3e, \"nnzb\": %lld}\n",
      c.n_steps / wall, wall / c.n_steps, (long long)c.n_steps,
      (long long)it0, (long long)iters_total, res_last, res0,
      (long long)nnzb);
  return 0;
}
