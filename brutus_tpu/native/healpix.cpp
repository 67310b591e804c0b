// Native HEALPix nested-order angular indexing + multi-resolution
// pixel lookup.
//
// This is the host-side hot path of the dust-map pipeline: every star
// in a catalog needs its sky pixel located in the Bayestar map's
// multi-nside index before fitting (reference brutus/dust.py:231-265
// does this through healpy + numpy searchsorted).  Implemented as a
// plain C ABI shared object loaded through ctypes; the pure-numpy
// implementation in brutus_tpu.healpix remains the fallback.
//
// Algorithms follow the standard HEALPix paper (Gorski et al. 2005).

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

inline uint64_t spread_bits(uint64_t x) {
    x &= 0xffffffffull;
    x = (x | (x << 16)) & 0x0000ffff0000ffffull;
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffull;
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0full;
    x = (x | (x << 2)) & 0x3333333333333333ull;
    x = (x | (x << 1)) & 0x5555555555555555ull;
    return x;
}

inline int64_t xy2pix(int64_t ix, int64_t iy) {
    return static_cast<int64_t>(spread_bits(ix) | (spread_bits(iy) << 1));
}

inline int64_t ang2pix_nest_one(int64_t nside, double theta, double phi) {
    const double z = std::cos(theta);
    const double za = std::fabs(z);
    double tt = std::fmod(phi, 2.0 * M_PI);
    if (tt < 0) tt += 2.0 * M_PI;
    tt *= 2.0 / M_PI;  // in [0, 4)

    int64_t face, ix, iy;
    if (za <= 2.0 / 3.0) {
        const double t1 = nside * (0.5 + tt);
        const double t2 = nside * (z * 0.75);
        const int64_t jp = static_cast<int64_t>(std::floor(t1 - t2));
        const int64_t jm = static_cast<int64_t>(std::floor(t1 + t2));
        const int64_t ifp = jp / nside;
        const int64_t ifm = jm / nside;
        if (ifp == ifm) face = (ifp & 3) + 4;
        else if (ifp < ifm) face = ifp & 3;
        else face = (ifm & 3) + 8;
        ix = jm & (nside - 1);
        iy = nside - (jp & (nside - 1)) - 1;
    } else {
        int64_t ntt = static_cast<int64_t>(tt);
        if (ntt >= 4) ntt = 3;
        const double tp = tt - ntt;
        const double tmp = nside * std::sqrt(3.0 * (1.0 - za));
        int64_t jp = static_cast<int64_t>(std::floor(tp * tmp));
        int64_t jm = static_cast<int64_t>(std::floor((1.0 - tp) * tmp));
        jp = std::min(jp, nside - 1);
        jm = std::min(jm, nside - 1);
        if (z >= 0) {
            face = ntt;
            ix = nside - jm - 1;
            iy = nside - jp - 1;
        } else {
            face = ntt + 8;
            ix = jp;
            iy = jm;
        }
    }
    return face * nside * nside + xy2pix(ix, iy);
}

}  // namespace

extern "C" {

// Galactic (l, b) degrees -> nested pixel indices (-1 for bad latitude).
void lb2pix_nest(int64_t nside, const double* l, const double* b,
                 int64_t n, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        if (b[i] < -90.0 || b[i] > 90.0) {
            out[i] = -1;
            continue;
        }
        const double theta = (90.0 - b[i]) * M_PI / 180.0;
        const double phi = l[i] * M_PI / 180.0;
        out[i] = ang2pix_nest_one(nside, theta, phi);
    }
}

// Multi-resolution dust-map row lookup: for each (l, b), walk the
// per-nside sorted pixel tables (finest matching level wins) and
// return the data row, or -1 when uncovered.
//
// nsides        : (n_levels,) unique nside per level (ascending)
// level_offsets : (n_levels+1,) start offsets into hp_sorted/data_idx
// hp_sorted     : concatenated sorted healpix indices per level
// data_idx      : matching data rows per level
void dustmap_lookup(const double* l, const double* b, int64_t n,
                    const int64_t* nsides, int64_t n_levels,
                    const int64_t* level_offsets,
                    const int64_t* hp_sorted, const int64_t* data_idx,
                    int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = -1;
        if (b[i] < -90.0 || b[i] > 90.0) continue;
        const double theta = (90.0 - b[i]) * M_PI / 180.0;
        const double phi = l[i] * M_PI / 180.0;
        for (int64_t k = 0; k < n_levels; ++k) {
            const int64_t pix = ang2pix_nest_one(nsides[k], theta, phi);
            const int64_t lo = level_offsets[k];
            const int64_t hi = level_offsets[k + 1];
            const int64_t* first = hp_sorted + lo;
            const int64_t* last = hp_sorted + hi;
            const int64_t* it = std::lower_bound(first, last, pix);
            if (it != last && *it == pix) {
                out[i] = data_idx[lo + (it - first)];
            }
        }
    }
}

}  // extern "C"
