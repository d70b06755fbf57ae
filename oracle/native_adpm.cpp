// Compiled single-core ADPM baseline: element assembly + BSR BiCGStab.
//
// Purpose (round-5 verdict item 1): bench.py's adpm_vs_baseline divided by
// the scipy-oracle-derived 1.252 steps/s — the same soft denominator the
// round-3 judge rejected for PIHNA (measuring PIHNA's compiled baseline
// showed the scipy oracle ~29x slower than real C++).  This program
// measures the compiled-C++ ADPM step directly: the reference's 3-species
// linearized-CN weak form (reference src/adpm.C:324-652 — response-function
// reaction terms, tract-gated anisotropic taxis, 5-point Keast rule)
// written as straightforward compiled C++ in the reference's algorithmic
// class: per-element dense matrices scattered into a preallocated 3x3-block
// CSR (PETSc MATBAIJ analogue) + Jacobi-scaled BiCGStab to rtol 1e-10
// (PETSc KSP analogue).  Single-threaded; the MPI baseline is derived as
// measured-per-core x 8 ideal ranks, exactly like the PIHNA derivation
// (oracle/native_baseline.cpp).
//
// Input: a binary case dump (see oracle/measure_native2.py):
//   int64 N, E, n_steps
//   f64 coords[N*3]; int64 conn[E*4]; f64 u0[N*3]; f64 tracts[E*3];
//   f64 params[N_PARAMS]
// argv: case_file [u_out_file [--dumpsys]]
// Output: one JSON line on stdout; optionally dumps u after the last timed
// step (N x 3 f64, node-major) for a parity diff vs the scipy oracle.
//
// Build: g++ -O3 -march=native -std=c++17 (oracle/measure_native2.py).

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
// QGauss(3, THIRD) — same rule as oracle/adpm_numpy.py)
static const double QP[5][3] = {
    {0.25, 0.25, 0.25},
    {1.0 / 6, 1.0 / 6, 1.0 / 6},
    {1.0 / 6, 1.0 / 6, 0.5},
    {1.0 / 6, 0.5, 1.0 / 6},
    {0.5, 1.0 / 6, 1.0 / 6},
};
static const double QW[5] = {-2.0 / 15, 3.0 / 40, 3.0 / 40, 3.0 / 40,
                             3.0 / 40};
static const int Q = 5, K = 4, V = 3;

// parameter block layout (measure_native2.py PARAM_ORDER_ADPM):
// triples are (value, pulse0, pulse1); sigmoids (value, s0, s1);
// trapezoids (value, t0, t1, t2, t3)
struct Params {
  double dt;
  double decay_PrP, decay_PrP_time_exponent, decay_PrP_p0, decay_PrP_p1;
  double diffuse_Ab[3], taxis1_Ab[3], taxis2_Ab[3];
  double produce_Ab[3], transform_Ab[5], decay_Ab[3];
  double diffuse_Ta[3], taxis1_Ta[3], taxis2_Ta[3];
  double produce_Ta[3], transform_Ta[5], decay_Ta[3];
  double omega_Ab, omega_Ta, time;
};
static const int N_PARAMS = sizeof(Params) / sizeof(double);  // 48

struct Case {
  int64_t N, E, n_steps;
  std::vector<double> coords;   // N*3
  std::vector<int64_t> conn;    // E*4
  std::vector<double> u0;       // N*3 node-major
  std::vector<double> tracts;   // E*3
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
  c.u0.resize(c.N * V);
  c.tracts.resize(c.E * 3);
  double pbuf[N_PARAMS];
  if (std::fread(c.coords.data(), 8, c.coords.size(), f) != c.coords.size())
    std::exit(1);
  if (std::fread(c.conn.data(), 8, c.conn.size(), f) != c.conn.size())
    std::exit(1);
  if (std::fread(c.u0.data(), 8, c.u0.size(), f) != c.u0.size()) std::exit(1);
  if (std::fread(c.tracts.data(), 8, c.tracts.size(), f) != c.tracts.size())
    std::exit(1);
  if (std::fread(pbuf, 8, N_PARAMS, f) != (size_t)N_PARAMS) std::exit(1);
  std::fclose(f);
  std::memcpy(&c.p, pbuf, sizeof(Params));
  return c;
}

// ---- response functions (reference src/utils.h:100-187) ----------------
static inline double pi_(double C, const double *p) {
  if (p[0] <= 0.0) return 0.0;
  return (C >= p[1] && C < p[2]) ? p[0] : 0.0;
}
static inline double sd_(double C, const double *p) {
  if (p[0] <= 0.0) return 0.0;
  if (C < p[1]) return p[0];
  if (C < p[2]) return p[0] * (p[2] - C) / (p[2] - p[1]);
  return 0.0;
}
static inline double dsd_(double C, const double *p) {
  if (p[0] <= 0.0) return 0.0;
  return (C >= p[1] && C < p[2]) ? -p[0] / (p[2] - p[1]) : 0.0;
}
static inline double tr_(double C, const double *p) {
  if (p[0] <= 0.0) return 0.0;
  if (C < p[1]) return 0.0;
  if (C < p[2]) return p[0] * (C - p[1]) / (p[2] - p[1]);
  if (C < p[3]) return p[0];
  if (C < p[4]) return p[0] * (p[4] - C) / (p[4] - p[3]);
  return 0.0;
}
static inline double dtr_(double C, const double *p) {
  if (p[0] <= 0.0) return 0.0;
  if (C < p[1]) return 0.0;
  if (C < p[2]) return p[0] / (p[2] - p[1]);
  if (C < p[3]) return 0.0;
  if (C < p[4]) return -p[0] / (p[4] - p[3]);
  return 0.0;
}

struct Bsr {
  int64_t N;
  std::vector<int64_t> rowptr;  // N+1
  std::vector<int64_t> col;     // nnzb
  std::vector<double> val;      // nnzb * V*V, block-row-major
};

int main(int argc, char **argv) {
  if (argc < 2) { std::fprintf(stderr, "usage: %s case [u_out [--dumpsys]]\n",
                               argv[0]); return 1; }
  Case c = read_case(argv[1]);
  const int64_t N = c.N, E = c.E;
  const Params &p = c.p;

  // --- geometry: dphi[e][k][3], JxW[e][q] (affine TET4) ----------------
  static const double DN[4][3] = {{-1, -1, -1}, {1, 0, 0}, {0, 1, 0},
                                  {0, 0, 1}};
  std::vector<double> dphi(E * K * 3), JxW(E * Q);
  for (int64_t e = 0; e < E; ++e) {
    const int64_t *cn = &c.conn[e * 4];
    double J[3][3] = {};
    for (int k = 0; k < K; ++k)
      for (int i = 0; i < 3; ++i)
        for (int d = 0; d < 3; ++d)
          J[i][d] += DN[k][i] * c.coords[cn[k] * 3 + d];
    double det = J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1]) -
                 J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0]) +
                 J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0]);
    double inv[3][3];
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
    for (int k = 0; k < K; ++k)
      for (int d = 0; d < 3; ++d)
        dphi[(e * K + k) * 3 + d] = DN[k][0] * inv[d][0] +
                                    DN[k][1] * inv[d][1] +
                                    DN[k][2] * inv[d][2];
    double adet = std::fabs(det);
    for (int q = 0; q < Q; ++q) JxW[e * Q + q] = adet * QW[q];
  }

  double PHI[Q][K];
  for (int q = 0; q < Q; ++q) {
    PHI[q][1] = QP[q][0]; PHI[q][2] = QP[q][1]; PHI[q][3] = QP[q][2];
    PHI[q][0] = 1.0 - QP[q][0] - QP[q][1] - QP[q][2];
  }

  // --- node-pair sparsity + per-element slot table ---------------------
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
  A.val.assign(nnzb * V * V, 0.0);
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
  // decay_PrP pulse with the time^gamma-scaled amplitude
  // (reference src/adpm.C: input-derived, oracle/adpm_numpy.py:107-109)
  const double decay_PrP_tri[3] = {
      p.decay_PrP * std::pow(p.time, p.decay_PrP_time_exponent),
      p.decay_PrP_p0, p.decay_PrP_p1};

  std::vector<double> u(c.u0), F(N * V), x(N * V), diag(N * V);
  std::vector<double> r(N * V), rhat(N * V), pv(N * V), vv(N * V),
      s(N * V), t(N * V), ph(N * V), sh(N * V);

  auto assemble = [&](const std::vector<double> &uo) {
    std::fill(A.val.begin(), A.val.end(), 0.0);
    std::fill(F.begin(), F.end(), 0.0);
    for (int64_t e = 0; e < E; ++e) {
      const int64_t *cn = &c.conn[e * 4];
      const double *dp = &dphi[e * K * 3];
      const double *w = &JxW[e * Q];
      const double *tr = &c.tracts[e * 3];
      double ue[K][V];
      for (int k = 0; k < K; ++k)
        for (int v = 0; v < V; ++v) ue[k][v] = uo[cn[k] * V + v];
      // gradients are q-invariant on TET4
      double g[V][3] = {};
      for (int v = 0; v < V; ++v)
        for (int k = 0; k < K; ++k)
          for (int d = 0; d < 3; ++d) g[v][d] += ue[k][v] * dp[k * 3 + d];
      const double *GAb = g[1], *GTa = g[2];
      // tract gating (reference src/adpm.C:473-492): +/- tract when the
      // UNIT gradient aligns within the tolerance cosine, zero otherwise
      // or when the gradient vanishes — per element (P1 gradients)
      double tract_Ab[3] = {}, tract_Ta[3] = {};
      {
        double nA = std::sqrt(GAb[0] * GAb[0] + GAb[1] * GAb[1] +
                              GAb[2] * GAb[2]);
        if (nA > 0.0) {
          double d = (GAb[0] * tr[0] + GAb[1] * tr[1] + GAb[2] * tr[2]) / nA;
          double sgn = d > p.omega_Ab ? 1.0 : (d < -p.omega_Ab ? -1.0 : 0.0);
          for (int d2 = 0; d2 < 3; ++d2) tract_Ab[d2] = sgn * tr[d2];
        }
        double nT = std::sqrt(GTa[0] * GTa[0] + GTa[1] * GTa[1] +
                              GTa[2] * GTa[2]);
        if (nT > 0.0) {
          double d = (GTa[0] * tr[0] + GTa[1] * tr[1] + GTa[2] * tr[2]) / nT;
          double sgn = d > p.omega_Ta ? 1.0 : (d < -p.omega_Ta ? -1.0 : 0.0);
          for (int d2 = 0; d2 < 3; ++d2) tract_Ta[d2] = sgn * tr[d2];
        }
      }
      double GG[K][K];
      for (int a = 0; a < K; ++a)
        for (int b = 0; b < K; ++b)
          GG[a][b] = dp[a * 3] * dp[b * 3] + dp[a * 3 + 1] * dp[b * 3 + 1] +
                     dp[a * 3 + 2] * dp[b * 3 + 2];
      double Ke[V][K][V][K] = {};
      double Fe[V][K] = {};
      double D11 = 0.0, D22 = 0.0;  // q-summed diffusion coefficients
      for (int q = 0; q < Q; ++q) {
        double uq[V];
        for (int v = 0; v < V; ++v) {
          uq[v] = 0.0;
          for (int k = 0; k < K; ++k) uq[v] += ue[k][v] * PHI[q][k];
        }
        const double PrPq = uq[0], Abq = uq[1], Taq = uq[2];
        // response coefficients (reference src/adpm.C:497-530 via
        // src/utils.h:100-187)
        const double Tr_Ab = tr_(Abq, p.transform_Ab);
        const double Tr_Ta = tr_(Taq, p.transform_Ta);
        const double dTr_Ab = dtr_(Abq, p.transform_Ab);
        const double dTr_Ta = dtr_(Taq, p.transform_Ta);
        const double SD_Ab = sd_(Abq, p.produce_Ab);
        const double SD_Ta = sd_(Taq, p.produce_Ta);
        const double dSD_Ab = dsd_(Abq, p.produce_Ab);
        const double dSD_Ta = dsd_(Taq, p.produce_Ta);
        const double Pi_dec_P = pi_(PrPq, decay_PrP_tri);
        const double Pi_dec_Ab = pi_(Abq, p.decay_Ab);
        const double Pi_dec_Ta = pi_(Taq, p.decay_Ta);
        const double Pi_dif_Ab = pi_(Abq, p.diffuse_Ab);
        const double Pi_dif_Ta = pi_(Taq, p.diffuse_Ta);
        const double Pi_t1_Ab = pi_(Abq, p.taxis1_Ab);
        const double Pi_t2_Ab = pi_(Taq, p.taxis2_Ab);
        const double Pi_t1_Ta = pi_(Taq, p.taxis1_Ta);
        const double Pi_t2_Ta = pi_(Abq, p.taxis2_Ta);

        const double wq = w[q];
        // mass coefficients (reference src/adpm.C:532-591 — note NO
        // Ke[1][2]/Ke[2][1] blocks, no tract/pulse-gate derivatives)
        double m[V][V] = {};
        m[0][0] = 1.0 - DT2 * (-Tr_Ab - Tr_Ta - Pi_dec_P);
        m[0][1] = -DT2 * (-dTr_Ab * PrPq);
        m[0][2] = -DT2 * (-dTr_Ta * PrPq);
        m[1][0] = -DT2 * Tr_Ab;
        m[1][1] = 1.0 - DT2 * (SD_Ab + dSD_Ab * Abq + dTr_Ab * PrPq
                               - Pi_dec_Ab);
        m[2][0] = -DT2 * Tr_Ta;
        m[2][2] = 1.0 - DT2 * (SD_Ta + dSD_Ta * Taq + dTr_Ta * PrPq
                               - Pi_dec_Ta);

        // advection (vec . dphi_i) * phi_j on the two taxis diagonals
        double adv11[3], adv22[3];
        for (int d = 0; d < 3; ++d) {
          adv11[d] = -DT2 * (-Pi_t1_Ab * tract_Ab[d]
                             + Pi_t2_Ab * tract_Ta[d]);
          adv22[d] = -DT2 * (-Pi_t1_Ta * tract_Ta[d]
                             + Pi_t2_Ta * tract_Ab[d]);
        }

        // diffusion coefficients (q-summed; contracted with GG after)
        D11 += wq * (-DT2 * (-Pi_dif_Ab));
        D22 += wq * (-DT2 * (-Pi_dif_Ta));

        // RHS (reference src/adpm.C:497-530)
        double f[V];
        f[0] = PrPq + DT2 * (-Tr_Ab * PrPq - Tr_Ta * PrPq
                             - Pi_dec_P * PrPq);
        f[1] = Abq + DT2 * (SD_Ab * Abq + Tr_Ab * PrPq - Pi_dec_Ab * Abq);
        f[2] = Taq + DT2 * (SD_Ta * Taq + Tr_Ta * PrPq - Pi_dec_Ta * Taq);
        double fg1[3], fg2[3];
        for (int d = 0; d < 3; ++d) {
          fg1[d] = DT2 * (-Pi_dif_Ab * GAb[d]
                          - (Pi_t1_Ab * Abq) * tract_Ab[d]
                          + (Pi_t2_Ab * Abq) * tract_Ta[d]);
          fg2[d] = DT2 * (-Pi_dif_Ta * GTa[d]
                          - (Pi_t1_Ta * Taq) * tract_Ta[d]
                          + (Pi_t2_Ta * Taq) * tract_Ab[d]);
        }

        // contract this qp into Ke / Fe
        for (int ki = 0; ki < K; ++ki) {
          const double *dpi = &dp[ki * 3];
          Fe[0][ki] += wq * f[0] * PHI[q][ki];
          Fe[1][ki] += wq * (f[1] * PHI[q][ki] + fg1[0] * dpi[0] +
                             fg1[1] * dpi[1] + fg1[2] * dpi[2]);
          Fe[2][ki] += wq * (f[2] * PHI[q][ki] + fg2[0] * dpi[0] +
                             fg2[1] * dpi[1] + fg2[2] * dpi[2]);
        }
        for (int vi = 0; vi < V; ++vi)
          for (int vj = 0; vj < V; ++vj) {
            const double mm = wq * m[vi][vj];
            const double *av = (vi == 1 && vj == 1) ? adv11
                               : (vi == 2 && vj == 2) ? adv22 : nullptr;
            if (mm == 0.0 && !av) continue;
            double vd[K];
            if (av)
              for (int ki = 0; ki < K; ++ki)
                vd[ki] = wq * (av[0] * dp[ki * 3] + av[1] * dp[ki * 3 + 1] +
                               av[2] * dp[ki * 3 + 2]);
            for (int ki = 0; ki < K; ++ki)
              for (int kj = 0; kj < K; ++kj) {
                double add = mm * PHI[q][ki] * PHI[q][kj];
                if (av) add += vd[ki] * PHI[q][kj];
                Ke[vi][ki][vj][kj] += add;
              }
          }
      }
      // q-summed diffusion blocks
      for (int ki = 0; ki < K; ++ki)
        for (int kj = 0; kj < K; ++kj) {
          Ke[1][ki][1][kj] += D11 * GG[ki][kj];
          Ke[2][ki][2][kj] += D22 * GG[ki][kj];
        }
      // scatter into BSR values + RHS
      for (int ki = 0; ki < K; ++ki)
        for (int kj = 0; kj < K; ++kj) {
          double *blk = &A.val[eslot[(e * K + ki) * K + kj] * V * V];
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
        const double *blk = &A.val[s2 * V * V];
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

  // Jacobi-scaled BiCGStab (same solver class as oracle/native_baseline)
  auto solve = [&](int64_t *iters_out) {
    for (int64_t n = 0; n < N; ++n) {
      for (int64_t s2 = A.rowptr[n]; s2 < A.rowptr[n + 1]; ++s2)
        if (A.col[s2] == n) {
          const double *blk = &A.val[s2 * V * V];
          for (int vi = 0; vi < V; ++vi) {
            double d = blk[vi * V + vi];
            diag[n * V + vi] = d == 0.0 ? 1.0 : d;
          }
        }
    }
    std::fill(x.begin(), x.end(), 0.0);
    double bnorm2 = dot(F, F);
    double tol2 = 1e-20 * (bnorm2 == 0.0 ? 1.0 : bnorm2);  // (1e-10)^2
    r = F;
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
  // (xtest[i] = sin(i+1), node-major) for a machine-eps diff vs the
  // scipy oracle's assembled system
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

  // warm-up step (untimed), then timed steps
  int64_t it0 = 0;
  double res0 = one_step(&it0);
  auto t0 = std::chrono::steady_clock::now();
  int64_t iters_total = 0;
  double res_last = 0.0, res_max = 0.0;
  for (int64_t s2 = 0; s2 < c.n_steps; ++s2) {
    int64_t it = 0;
    res_last = one_step(&it);
    if (res_last > res_max) res_max = res_last;
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
      "{\"workload\": \"adpm\", \"impl\": \"native-c++\", "
      "\"steps_per_sec\": %.4f, \"sec_per_step\": %.4f, \"n_steps\": %lld, "
      "\"warm_iters\": %lld, \"iters_total\": %lld, \"residual\": %.3e, "
      "\"residual_max\": %.3e, \"warm_residual\": %.3e, \"nnzb\": %lld}\n",
      c.n_steps / wall, wall / c.n_steps, (long long)c.n_steps,
      (long long)it0, (long long)iters_total, res_last, res_max, res0,
      (long long)nnzb);
  return 0;
}
