// Reference-equivalent CPU baseline for Multigrid Monte Carlo sampling.
//
// The upstream reference (nilsfriess/MultigridMC) could not be compiled in this
// environment (its Eigen/libconfig/CholMod dependencies are unavailable and the
// sandbox has no network), so this standalone C++17 program re-creates the
// reference's *hot path* with the same algorithmic structure and data layout to
// provide an honest single-core CPU baseline:
//
//   * CSR sparse matrices with ordered lexicographic SOR sweeps
//     (cf. src/smoother/sor_smoother.cc:56-78: direct indptr/indices/values
//     walk, x[l] += omega*(b[l]-sum a_lk x_k)/a_ll),
//   * stochastic SOR (Gibbs) sweeps with std::mt19937_64 noise
//     c = f + sqrt(D(2-w)/w) xi + B Sigma^{-1/2} xi'
//     (cf. src/sampler/sor_sampler.cc:37-59),
//   * low-rank Woodbury correction x -= Bbar (B^T x) after each sweep
//     (cf. src/smoother/sor_smoother.cc:41-53),
//   * recursive MGMC V/W-cycle with restriction/prolongation as CSR products
//     (cf. src/sampler/multigridmc_sampler.cc:103-139),
//   * dense Cholesky coarse-level sampling via triangular solves
//     (cf. src/sampler/cholesky_sampler.hh:50-66).
//
// Problem data (per-level CSR operators, transfer operators, precomputed
// low-rank factors, coarse Cholesky factor) is exported by
// multigridmc_tpu/utils/baseline_export.py in a simple binary format.
//
// Build:  g++ -O3 -march=native -std=c++17 -o baseline_mgmc baseline_mgmc.cc
// Run:    ./baseline_mgmc problem.bin nwarmup nsamples
// Output: one JSON line {"ms_per_sample": ..., "samples_per_sec": ...}

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <cmath>
#include <random>
#include <string>
#include <vector>

namespace {

struct CSR {
    int64_t rows = 0, cols = 0;
    std::vector<int64_t> indptr;
    std::vector<int64_t> indices;
    std::vector<double> data;

    // y = A x
    void apply(const double* x, double* y) const {
        for (int64_t i = 0; i < rows; ++i) {
            double acc = 0.0;
            for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
                acc += data[k] * x[indices[k]];
            y[i] = acc;
        }
    }
};

struct LowRank {
    int64_t m = 0;
    std::vector<double> B;        // (n, m) row-major
    std::vector<double> Bbar_fw;  // (n, m)
    std::vector<double> Bbar_bw;  // (n, m)
    std::vector<double> sqrt_sigma_inv;  // (m)
};

struct Level {
    CSR A;
    std::vector<double> diag;                 // diagonal of A
    std::vector<double> sqrt_precision_diag;  // sqrt(diag*(2-w)/w)
    LowRank lowrank;
    CSR R;  // restriction (coarse x fine)
    CSR P;  // prolongation (fine x coarse)
    std::vector<double> x, f, r;  // work vectors
};

struct Problem {
    int64_t nlevel = 0, cycle = 1;
    double omega = 1.0;
    std::vector<Level> levels;
    int64_t nc = 0;
    std::vector<double> Lchol;  // (nc, nc) row-major lower-triangular factor
    std::vector<double> coarse_g, coarse_xi;
};

template <typename T>
void read_vec(FILE* fp, std::vector<T>& v, size_t count) {
    v.resize(count);
    if (fread(v.data(), sizeof(T), count, fp) != count) {
        fprintf(stderr, "short read\n");
        exit(1);
    }
}

int64_t read_i64(FILE* fp) {
    int64_t v;
    if (fread(&v, sizeof(v), 1, fp) != 1) { fprintf(stderr, "short read\n"); exit(1); }
    return v;
}

double read_f64(FILE* fp) {
    double v;
    if (fread(&v, sizeof(v), 1, fp) != 1) { fprintf(stderr, "short read\n"); exit(1); }
    return v;
}

CSR read_csr(FILE* fp) {
    CSR m;
    m.rows = read_i64(fp);
    m.cols = read_i64(fp);
    int64_t nnz = read_i64(fp);
    read_vec(fp, m.indptr, m.rows + 1);
    read_vec(fp, m.indices, nnz);
    read_vec(fp, m.data, nnz);
    return m;
}

Problem load(const char* path) {
    FILE* fp = fopen(path, "rb");
    if (!fp) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    if (read_i64(fp) != 0x4d474d43) { fprintf(stderr, "bad magic\n"); exit(1); }
    Problem p;
    p.nlevel = read_i64(fp);
    p.cycle = read_i64(fp);
    p.omega = read_f64(fp);
    p.levels.resize(p.nlevel);
    for (int64_t l = 0; l < p.nlevel; ++l) {
        Level& lev = p.levels[l];
        lev.A = read_csr(fp);
        int64_t n = lev.A.rows;
        read_vec(fp, lev.diag, n);
        lev.sqrt_precision_diag.resize(n);
        for (int64_t i = 0; i < n; ++i)
            lev.sqrt_precision_diag[i] = std::sqrt(lev.diag[i] * (2.0 - p.omega) / p.omega);
        lev.lowrank.m = read_i64(fp);
        if (lev.lowrank.m > 0) {
            read_vec(fp, lev.lowrank.B, n * lev.lowrank.m);
            read_vec(fp, lev.lowrank.Bbar_fw, n * lev.lowrank.m);
            read_vec(fp, lev.lowrank.Bbar_bw, n * lev.lowrank.m);
            read_vec(fp, lev.lowrank.sqrt_sigma_inv, lev.lowrank.m);
        }
        if (l < p.nlevel - 1) {
            lev.R = read_csr(fp);
            lev.P = read_csr(fp);
        }
        lev.x.assign(n, 0.0);
        lev.f.assign(n, 0.0);
        lev.r.assign(n, 0.0);
    }
    p.nc = read_i64(fp);
    read_vec(fp, p.Lchol, p.nc * p.nc);
    p.coarse_g.assign(p.nc, 0.0);
    p.coarse_xi.assign(p.nc, 0.0);
    fclose(fp);
    return p;
}

struct Sampler {
    Problem& p;
    std::mt19937_64 rng;
    std::normal_distribution<double> normal;

    Sampler(Problem& p_, uint64_t seed) : p(p_), rng(seed), normal(0.0, 1.0) {}

    // one lexicographic SOR sweep (forward: dir=+1, backward: dir=-1),
    // cf. sor_smoother.cc:56-78
    void sor_sweep(const Level& lev, const std::vector<double>& b,
                   std::vector<double>& x, int dir) {
        const int64_t n = lev.A.rows;
        const auto& indptr = lev.A.indptr;
        const auto& indices = lev.A.indices;
        const auto& data = lev.A.data;
        for (int64_t i_ = 0; i_ < n; ++i_) {
            int64_t i = (dir > 0) ? i_ : n - 1 - i_;
            double acc = 0.0;
            for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
                acc += data[k] * x[indices[k]];
            x[i] += p.omega * (b[i] - acc) / lev.diag[i];
        }
        // low-rank Woodbury correction (sor_smoother.cc:41-53)
        const LowRank& lr = lev.lowrank;
        if (lr.m > 0) {
            const auto& Bbar = (dir > 0) ? lr.Bbar_fw : lr.Bbar_bw;
            std::vector<double> bt(lr.m, 0.0);
            for (int64_t i = 0; i < n; ++i)
                for (int64_t j = 0; j < lr.m; ++j)
                    bt[j] += lr.B[i * lr.m + j] * x[i];
            for (int64_t i = 0; i < n; ++i)
                for (int64_t j = 0; j < lr.m; ++j)
                    x[i] -= Bbar[i * lr.m + j] * bt[j];
        }
    }

    // stochastic SOR sweep (sor_sampler.cc:37-59)
    void gibbs_sweep(Level& lev, const std::vector<double>& f,
                     std::vector<double>& x, int dir) {
        const int64_t n = lev.A.rows;
        std::vector<double>& c = lev.r;  // reuse work vector
        for (int64_t i = 0; i < n; ++i)
            c[i] = f[i] + lev.sqrt_precision_diag[i] * normal(rng);
        const LowRank& lr = lev.lowrank;
        if (lr.m > 0) {
            std::vector<double> xi(lr.m);
            for (int64_t j = 0; j < lr.m; ++j)
                xi[j] = lr.sqrt_sigma_inv[j] * normal(rng);
            for (int64_t i = 0; i < n; ++i)
                for (int64_t j = 0; j < lr.m; ++j)
                    c[i] += lr.B[i * lr.m + j] * xi[j];
        }
        sor_sweep(lev, c, x, dir);
    }

    // coarse-level exact sample via dense Cholesky (cholesky_sampler.hh:50-66)
    void coarse_sample(const std::vector<double>& f, std::vector<double>& x) {
        const int64_t n = p.nc;
        const double* L = p.Lchol.data();
        // solve L g = f
        for (int64_t i = 0; i < n; ++i) {
            double acc = f[i];
            for (int64_t j = 0; j < i; ++j) acc -= L[i * n + j] * p.coarse_g[j];
            p.coarse_g[i] = acc / L[i * n + i];
        }
        for (int64_t i = 0; i < n; ++i)
            p.coarse_xi[i] = normal(rng) + p.coarse_g[i];
        // solve L^T x = xi + g
        for (int64_t i = n - 1; i >= 0; --i) {
            double acc = p.coarse_xi[i];
            for (int64_t j = i + 1; j < n; ++j) acc -= L[j * n + i] * x[j];
            x[i] = acc / L[i * n + i];
        }
    }

    // recursive MGMC cycle (multigridmc_sampler.cc:103-130)
    void sample(int64_t level) {
        Level& lev = p.levels[level];
        if (level == p.nlevel - 1) {
            coarse_sample(lev.f, lev.x);
            return;
        }
        Level& coarse = p.levels[level + 1];
        int64_t ncycle = (level > 0) ? p.cycle : 1;
        for (int64_t j = 0; j < ncycle; ++j) {
            gibbs_sweep(lev, lev.f, lev.x, +1);  // presample (forward)
            lev.A.apply(lev.x.data(), lev.r.data());
            const LowRank& lr = lev.lowrank;
            if (lr.m > 0) {  // A x includes low-rank term (linear_operator.hh:66-76)
                std::vector<double> bt(lr.m, 0.0);
                for (int64_t i = 0; i < lev.A.rows; ++i)
                    for (int64_t k = 0; k < lr.m; ++k)
                        bt[k] += lr.B[i * lr.m + k] * lev.x[i];
                for (int64_t k = 0; k < lr.m; ++k)
                    bt[k] *= lr.sqrt_sigma_inv[k] * lr.sqrt_sigma_inv[k];
                for (int64_t i = 0; i < lev.A.rows; ++i)
                    for (int64_t k = 0; k < lr.m; ++k)
                        lev.r[i] += lr.B[i * lr.m + k] * bt[k];
            }
            for (int64_t i = 0; i < lev.A.rows; ++i)
                lev.r[i] = lev.f[i] - lev.r[i];
            lev.R.apply(lev.r.data(), coarse.f.data());
            std::fill(coarse.x.begin(), coarse.x.end(), 0.0);
            sample(level + 1);
            // prolongate-add (coarse_scaling = 1)
            lev.P.apply(coarse.x.data(), lev.r.data());
            for (int64_t i = 0; i < lev.A.rows; ++i) lev.x[i] += lev.r[i];
            gibbs_sweep(lev, lev.f, lev.x, -1);  // postsample (backward)
        }
    }

    void apply(const std::vector<double>& f, std::vector<double>& x) {
        p.levels[0].f = f;
        p.levels[0].x = x;
        sample(0);
        x = p.levels[0].x;
    }
};

}  // namespace

// Deterministic multigrid V/W-cycle (the driver_mg path): identical cycle
// skeleton with noise-free SOR sweeps and a coarse Cholesky *solve*
// (multigrid_preconditioner.cc:74-109).
struct DeterministicCycle {
    Problem& p;
    explicit DeterministicCycle(Problem& p_) : p(p_) {}

    void sor_sweep(const Level& lev, const std::vector<double>& b,
                   std::vector<double>& x, int dir) {
        const int64_t n = lev.A.rows;
        for (int64_t i_ = 0; i_ < n; ++i_) {
            int64_t i = (dir > 0) ? i_ : n - 1 - i_;
            double acc = 0.0;
            for (int64_t k = lev.A.indptr[i]; k < lev.A.indptr[i + 1]; ++k)
                acc += lev.A.data[k] * x[lev.A.indices[k]];
            x[i] += p.omega * (b[i] - acc) / lev.diag[i];
        }
        const LowRank& lr = lev.lowrank;
        if (lr.m > 0) {
            const auto& Bbar = (dir > 0) ? lr.Bbar_fw : lr.Bbar_bw;
            std::vector<double> bt(lr.m, 0.0);
            for (int64_t i = 0; i < n; ++i)
                for (int64_t j = 0; j < lr.m; ++j)
                    bt[j] += lr.B[i * lr.m + j] * x[i];
            for (int64_t i = 0; i < n; ++i)
                for (int64_t j = 0; j < lr.m; ++j)
                    x[i] -= Bbar[i * lr.m + j] * bt[j];
        }
    }

    void coarse_solve(const std::vector<double>& b, std::vector<double>& x) {
        const int64_t n = p.nc;
        const double* L = p.Lchol.data();
        for (int64_t i = 0; i < n; ++i) {
            double acc = b[i];
            for (int64_t j = 0; j < i; ++j) acc -= L[i * n + j] * p.coarse_g[j];
            p.coarse_g[i] = acc / L[i * n + i];
        }
        for (int64_t i = n - 1; i >= 0; --i) {
            double acc = p.coarse_g[i];
            for (int64_t j = i + 1; j < n; ++j) acc -= L[j * n + i] * x[j];
            x[i] = acc / L[i * n + i];
        }
    }

    void solve(int64_t level) {
        Level& lev = p.levels[level];
        std::fill(lev.x.begin(), lev.x.end(), 0.0);
        if (level == p.nlevel - 1) {
            coarse_solve(lev.f, lev.x);
            return;
        }
        Level& coarse = p.levels[level + 1];
        int64_t ncycle = (level > 0) ? p.cycle : 1;
        for (int64_t j = 0; j < ncycle; ++j) {
            sor_sweep(lev, lev.f, lev.x, +1);
            lev.A.apply(lev.x.data(), lev.r.data());
            const LowRank& lr = lev.lowrank;
            if (lr.m > 0) {
                std::vector<double> bt(lr.m, 0.0);
                for (int64_t i = 0; i < lev.A.rows; ++i)
                    for (int64_t k = 0; k < lr.m; ++k)
                        bt[k] += lr.B[i * lr.m + k] * lev.x[i];
                for (int64_t k = 0; k < lr.m; ++k)
                    bt[k] *= lr.sqrt_sigma_inv[k] * lr.sqrt_sigma_inv[k];
                for (int64_t i = 0; i < lev.A.rows; ++i)
                    for (int64_t k = 0; k < lr.m; ++k)
                        lev.r[i] += lr.B[i * lr.m + k] * bt[k];
            }
            for (int64_t i = 0; i < lev.A.rows; ++i)
                lev.r[i] = lev.f[i] - lev.r[i];
            lev.R.apply(lev.r.data(), coarse.f.data());
            solve(level + 1);
            lev.P.apply(coarse.x.data(), lev.r.data());
            for (int64_t i = 0; i < lev.A.rows; ++i) lev.x[i] += lev.r[i];
            sor_sweep(lev, lev.f, lev.x, -1);
        }
    }

    void apply(const std::vector<double>& b, std::vector<double>& x) {
        p.levels[0].f = b;
        solve(0);
        x = p.levels[0].x;
    }
};

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s problem.bin nwarmup nsamples [dump_prefix|--deterministic]\n",
                argv[0]);
        return 1;
    }
    Problem p = load(argv[1]);
    int64_t nwarmup = atoll(argv[2]);
    int64_t nsamples = atoll(argv[3]);
    bool deterministic = (argc == 5) && std::string(argv[4]) == "--deterministic";
    const char* dump_prefix = (argc == 5 && !deterministic) ? argv[4] : nullptr;

    if (deterministic) {
        // preconditioned Richardson: x <- x - P(Ax - b), cf. loop_solver.cc:26-41
        DeterministicCycle cyc(p);
        int64_t n = p.levels[0].A.rows;
        std::vector<double> b(n), x(n, 0.0), r(n), Pr(n);
        std::mt19937_64 rng_b(1482817ull);
        std::normal_distribution<double> nrm(0.0, 1.0);
        for (int64_t i = 0; i < n; ++i) b[i] = nrm(rng_b);
        auto resid = [&]() {
            p.levels[0].A.apply(x.data(), r.data());
            const LowRank& lr = p.levels[0].lowrank;
            if (lr.m > 0) {  // full operator includes the low-rank term
                std::vector<double> bt(lr.m, 0.0);
                for (int64_t i = 0; i < n; ++i)
                    for (int64_t k = 0; k < lr.m; ++k)
                        bt[k] += lr.B[i * lr.m + k] * x[i];
                for (int64_t k = 0; k < lr.m; ++k)
                    bt[k] *= lr.sqrt_sigma_inv[k] * lr.sqrt_sigma_inv[k];
                for (int64_t i = 0; i < n; ++i)
                    for (int64_t k = 0; k < lr.m; ++k)
                        r[i] += lr.B[i * lr.m + k] * bt[k];
            }
            double nr = 0.0;
            for (int64_t i = 0; i < n; ++i) { r[i] -= b[i]; nr += r[i] * r[i]; }
            return std::sqrt(nr);
        };
        double r0 = resid();
        auto t0 = std::chrono::high_resolution_clock::now();
        int64_t iters = nsamples;
        double rn = r0;
        for (int64_t k = 0; k < iters; ++k) {
            resid();
            cyc.apply(r, Pr);
            for (int64_t i = 0; i < n; ++i) x[i] -= Pr[i];
        }
        rn = resid();
        auto t1 = std::chrono::high_resolution_clock::now();
        double secs = std::chrono::duration<double>(t1 - t0).count();
        printf("{\"ms_per_cycle\": %.6f, \"cycles_per_sec\": %.3f, "
               "\"n\": %lld, \"residual_reduction\": %.6e}\n",
               1e3 * secs / iters, iters / secs, (long long)n, rn / r0);
        return 0;
    }

    // --convergence mode: the reference's measure_convergence diagnostic
    // (driver_mgmc.cc:188-314) for the *lexicographic* sweep order: nreplica
    // independent chains from x = 0, track q_j = |E[z_j] - E[z]| and
    // |Var[z_j] - Var[z]| of the centre-vertex observable z = x[n/2] over the
    // first nsteps chain steps.  Exact posterior mean/variance of z are
    // computed by the Python orchestrator (native/convergence_compare.py) and
    // passed in, since the q-table needs them as the limit values.
    if (argc >= 5 && std::string(argv[4]) == "--convergence") {
        int64_t nsteps = atoll(argv[2]);
        int64_t nreplica = atoll(argv[3]);
        double exact_mean = argc > 5 ? atof(argv[5]) : 0.0;
        double exact_var = argc > 6 ? atof(argv[6]) : 0.0;
        Sampler csampler(p, 5418513ull);
        int64_t n = p.levels[0].A.rows;
        std::vector<double> f(n, 0.0);
        std::mt19937_64 rng_f(1342517ull);
        std::uniform_real_distribution<double> uni(0.0, 1.0);
        for (int64_t i = 0; i < n; ++i) f[i] = uni(rng_f);
        std::vector<double> sum_z(nsteps, 0.0), sum_z2(nsteps, 0.0);
        std::vector<double> xc(n);
        for (int64_t r = 0; r < nreplica; ++r) {
            std::fill(xc.begin(), xc.end(), 0.0);
            for (int64_t j = 0; j < nsteps; ++j) {
                csampler.apply(f, xc);
                double z = xc[n / 2];
                sum_z[j] += z;
                sum_z2[j] += z * z;
            }
        }
        printf("{\"mode\": \"convergence\", \"nsteps\": %lld, \"nreplica\": %lld, "
               "\"q_mean\": [",
               (long long)nsteps, (long long)nreplica);
        for (int64_t j = 0; j < nsteps; ++j) {
            double m = sum_z[j] / nreplica;
            printf("%s%.8e", j ? ", " : "", std::abs(m - exact_mean));
        }
        printf("], \"q_var\": [");
        for (int64_t j = 0; j < nsteps; ++j) {
            double m = sum_z[j] / nreplica;
            double v = sum_z2[j] / nreplica - m * m;
            printf("%s%.8e", j ? ", " : "", std::abs(v - exact_var));
        }
        printf("]}\n");
        return 0;
    }

    Sampler sampler(p, 5418513ull);
    int64_t n = p.levels[0].A.rows;
    std::vector<double> f(n, 0.0), x(n, 0.0), mean(n, 0.0);
    std::mt19937_64 rng_f(1342517ull);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    for (int64_t i = 0; i < n; ++i) f[i] = uni(rng_f);

    for (int64_t k = 0; k < nwarmup; ++k) sampler.apply(f, x);
    auto t0 = std::chrono::high_resolution_clock::now();
    double acc = 0.0;
    for (int64_t k = 0; k < nsamples; ++k) {
        sampler.apply(f, x);
        acc += x[n / 2];
        if (dump_prefix)
            for (int64_t i = 0; i < n; ++i) mean[i] += (x[i] - mean[i]) / (k + 1.0);
    }
    auto t1 = std::chrono::high_resolution_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double ms = 1e3 * secs / nsamples;
    if (dump_prefix) {
        std::string base(dump_prefix);
        FILE* ff = fopen((base + "_f.bin").c_str(), "wb");
        fwrite(f.data(), sizeof(double), n, ff);
        fclose(ff);
        FILE* fm = fopen((base + "_mean.bin").c_str(), "wb");
        fwrite(mean.data(), sizeof(double), n, fm);
        fclose(fm);
    }
    printf("{\"ms_per_sample\": %.6f, \"samples_per_sec\": %.3f, \"n\": %lld, \"acc\": %.6e}\n",
           ms, nsamples / secs, (long long)n, acc / nsamples);
    return 0;
}
