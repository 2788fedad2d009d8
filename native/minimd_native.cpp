// Native host runtime for minimd-tpu: setup + IO hot paths.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the
// host-side work the reference also does natively: deterministic system
// generation (FCC lattice + Park-Miller velocities, ref/setup.cpp:315-517),
// the glibc-rand atom-type stream (ref/atom.cpp:97), and parsing of
// million-atom LAMMPS data files (ref/setup.cpp:55-301) where Python
// tokenization is the bottleneck.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// glibc rand() (TYPE_3 additive feedback), reproducing srand(seed)/rand()
// ---------------------------------------------------------------------------

struct GlibcRand {
    uint32_t r[344];
    int idx;
};

static void glibc_srand(GlibcRand* g, unsigned seed) {
    if (seed == 0) seed = 1;
    int32_t* r = reinterpret_cast<int32_t*>(g->r);
    r[0] = (int32_t)seed;
    for (int i = 1; i < 31; i++) {
        long long hi = r[i - 1] / 127773;
        long long lo = r[i - 1] % 127773;
        long long word = 16807 * lo - 2836 * hi;
        if (word < 0) word += 2147483647;
        r[i] = (int32_t)word;
    }
    for (int i = 31; i < 34; i++) g->r[i] = g->r[i - 31];
    for (int i = 34; i < 344; i++) g->r[i] = g->r[i - 31] + g->r[i - 3];
    g->idx = 344 - 31;  // next output position in the rolling window
}

// n draws of rand()%ntypes into out.
void mmd_rand_types(unsigned seed, int64_t n, int ntypes, int32_t* out) {
    GlibcRand g;
    glibc_srand(&g, seed);
    // rolling state: keep the last 344 words, generate forward
    // r[k] = r[k-31] + r[k-3]; output = r[k] >> 1 for k >= 344
    uint32_t win[344];
    memcpy(win, g.r, sizeof(win));
    int pos = 0;  // window is circular
    for (int64_t i = 0; i < n; i++) {
        uint32_t word = win[(pos + 344 - 31) % 344] + win[(pos + 344 - 3) % 344];
        win[pos % 344] = word;
        pos = (pos + 1) % 344;
        out[i] = (int32_t)((word >> 1) % (unsigned)ntypes);
    }
}

// ---------------------------------------------------------------------------
// Park-Miller minimal standard (Schrage), ref/setup.cpp:505-517
// ---------------------------------------------------------------------------

static inline double pm_random(int32_t* idum) {
    const int32_t IA = 16807, IM = 2147483647, IQ = 127773, IR = 2836;
    int32_t k = *idum / IQ;
    *idum = IA * (*idum - k * IQ) - IR * k;
    if (*idum < 0) *idum += IM;
    return (1.0 / IM) * (*idum);
}

// The deterministic per-site velocity: Park-Miller stream seeded by the
// 1-based global half-lattice site index, 5 warmup draws per component
// (the golden traces' step-0 state depends on this exact stream).
static inline void site_velocity(int32_t site_seed, double* v3) {
    int32_t s = site_seed;
    for (int c = 0; c < 3; c++) {
        for (int m = 0; m < 5; m++) pm_random(&s);
        v3[c] = pm_random(&s);
    }
}

// FCC lattice generation. Atoms are emitted in 8^3-half-cell block order
// (blocks swept x-fastest, sites within a block likewise) so the output
// sequence is byte-identical to the replicated-setup contract of
// ref/setup.cpp:315-422; only sites whose position falls inside [bounds]
// are kept. Returns the count, or -1 on capacity overflow.
int64_t mmd_create_atoms(
    int nx, int ny, int nz, double rho,
    const double* bounds,       // xlo xhi ylo yhi zlo zhi
    int64_t capacity,
    double* out_x,              // (capacity, 3)
    double* out_v               // (capacity, 3)
) {
    const double alat = pow(4.0 / rho, 1.0 / 3.0);
    const double half = 0.5 * alat;
    const double xlo = bounds[0], xhi = bounds[1];
    const double ylo = bounds[2], yhi = bounds[3];
    const double zlo = bounds[4], zhi = bounds[5];

    // half-lattice index window covering [bounds] (clamped to the box)
    int ilo = (int)(xlo / half - 1); if (ilo < 0) ilo = 0;
    int ihi = (int)(xhi / half + 1); if (ihi > 2 * nx - 1) ihi = 2 * nx - 1;
    int jlo = (int)(ylo / half - 1); if (jlo < 0) jlo = 0;
    int jhi = (int)(yhi / half + 1); if (jhi > 2 * ny - 1) jhi = 2 * ny - 1;
    int klo = (int)(zlo / half - 1); if (klo < 0) klo = 0;
    int khi = (int)(zhi / half + 1); if (khi > 2 * nz - 1) khi = 2 * nz - 1;

    const int B = 8;  // half-cells per block edge
    const int nbi = ihi / B, nbj = jhi / B, nbk = khi / B;

    int64_t count = 0;
    for (int bk = 0; bk <= nbk; bk++)
    for (int bj = 0; bj <= nbj; bj++)
    for (int bi = 0; bi <= nbi; bi++)
        for (int dk = 0; dk < B; dk++)
        for (int dj = 0; dj < B; dj++)
        for (int di = 0; di < B; di++) {
            const int i = bi * B + di;
            const int j = bj * B + dj;
            const int k = bk * B + dk;
            if ((i + j + k) % 2 != 0) continue;  // FCC sites only
            if (i < ilo || i > ihi || j < jlo || j > jhi ||
                k < klo || k > khi) continue;
            const double xt = half * i, yt = half * j, zt = half * k;
            if (xt < xlo || xt >= xhi || yt < ylo || yt >= yhi ||
                zt < zlo || zt >= zhi) continue;
            if (count >= capacity) return -1;
            out_x[count * 3 + 0] = xt;
            out_x[count * 3 + 1] = yt;
            out_x[count * 3 + 2] = zt;
            site_velocity(k * (2 * ny) * (2 * nx) + j * (2 * nx) + i + 1,
                          out_v + count * 3);
            count++;
        }
    return count;
}

// ---------------------------------------------------------------------------
// LAMMPS data-file parser (ref/setup.cpp:55-301)
// ---------------------------------------------------------------------------

// Pass 1: header scan. Returns natoms; fills box [xprd,yprd,zprd] and mass.
// Pass 2 (same call): fills x (natoms,3) and v (natoms,3) by 1-based id.
int64_t mmd_read_lammps_data(
    const char* path,
    double* box_out,   // xprd yprd zprd
    double* mass_out,
    double* x_out,     // pre-sized (natoms, 3); pass NULL for header-only
    double* v_out
) {
    FILE* fp = fopen(path, "r");
    if (!fp) return -1;
    char line[1024];
    int64_t natoms = 0;
    double xlo = 0, xhi = 0, ylo = 0, yhi = 0, zlo = 0, zhi = 0;
    *mass_out = 1.0;

    if (!fgets(line, sizeof line, fp)) { fclose(fp); return -1; }  // title

    while (fgets(line, sizeof line, fp)) {
        char* hash = strchr(line, '#');
        if (hash) *hash = '\0';
        char* s = line;
        while (*s == ' ' || *s == '\t') s++;
        if (*s == '\n' || *s == '\0' || *s == '\r') continue;

        if (strstr(s, "atom types")) {
            /* ignore count, types are assigned by the caller */
        } else if (strstr(s, "atoms")) {
            natoms = strtoll(s, nullptr, 10);
        } else if (strstr(s, "xlo xhi")) {
            sscanf(s, "%lg %lg", &xlo, &xhi);
        } else if (strstr(s, "ylo yhi")) {
            sscanf(s, "%lg %lg", &ylo, &yhi);
        } else if (strstr(s, "zlo zhi")) {
            sscanf(s, "%lg %lg", &zlo, &zhi);
        } else if (strncmp(s, "Masses", 6) == 0) {
            while (fgets(line, sizeof line, fp)) {
                int id; double m;
                if (sscanf(line, "%d %lg", &id, &m) == 2) { *mass_out = m; break; }
            }
        } else if (strncmp(s, "Atoms", 5) == 0 && x_out) {
            int64_t nread = 0;
            while (nread < natoms && fgets(line, sizeof line, fp)) {
                char* end;
                long long id = strtoll(line, &end, 10);
                if (end == line) continue;
                strtol(end, &end, 10);  // type (regenerated by caller)
                double xx = strtod(end, &end);
                double xy = strtod(end, &end);
                double xz = strtod(end, &end);
                int64_t idx = id - 1;
                x_out[idx * 3 + 0] = xx;
                x_out[idx * 3 + 1] = xy;
                x_out[idx * 3 + 2] = xz;
                nread++;
            }
        } else if (strncmp(s, "Velocities", 10) == 0 && v_out) {
            int64_t nread = 0;
            while (nread < natoms && fgets(line, sizeof line, fp)) {
                char* end;
                long long id = strtoll(line, &end, 10);
                if (end == line) continue;
                double vx = strtod(end, &end);
                double vy = strtod(end, &end);
                double vz = strtod(end, &end);
                int64_t idx = id - 1;
                v_out[idx * 3 + 0] = vx;
                v_out[idx * 3 + 1] = vy;
                v_out[idx * 3 + 2] = vz;
                nread++;
            }
        }
    }
    fclose(fp);
    box_out[0] = xhi - xlo;
    box_out[1] = yhi - ylo;
    box_out[2] = zhi - zlo;
    return natoms;
}

}  // extern "C"
