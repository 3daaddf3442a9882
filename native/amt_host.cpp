// Native host-side geometry kernels for arcadia_microscopy_tools_tpu.
//
// The TPU owns all dense per-pixel compute; what remains on host are the
// inherently sequential per-cell geometry passes (the reference also keeps
// these host-side as lazy properties, masks.py:230-245):
//   - boundary tracing (Moore neighbor walk, cellpose-style integer outlines)
//   - convex hull areas (Andrew monotone chain + exact lattice-point count)
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// Build: make native  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Boundary tracing
// ---------------------------------------------------------------------------
// Moore-neighbor tracing of the outer boundary of each label, in label order.
// Outputs are packed: coords = [y0,x0, y1,x1, ...], with per-cell offsets.
//
// label_image: int32 (h*w), labels 1..n_cells (0 = background)
// coords_out:  preallocated int32 buffer of capacity `coords_cap` PAIRS
// offsets_out: int64 buffer of n_cells+1 entries; outline k occupies
//              coords[offsets[k] .. offsets[k+1])
// Returns 0 on success, -1 if coords_cap was exceeded.

static const int DY8[8] = {-1, -1, 0, 1, 1, 1, 0, -1};
static const int DX8[8] = {0, 1, 1, 1, 0, -1, -1, -1};

int trace_outlines(const int32_t* label_image, int64_t h, int64_t w,
                   int32_t n_cells, int32_t* coords_out, int64_t coords_cap,
                   int64_t* offsets_out) {
    // first pixel (scan order) of each label = trace start
    std::vector<int64_t> start(n_cells + 1, -1);
    for (int64_t i = 0; i < h * w; ++i) {
        int32_t v = label_image[i];
        if (v > 0 && v <= n_cells && start[v] < 0) start[v] = i;
    }

    int64_t pos = 0;
    offsets_out[0] = 0;
    for (int32_t k = 1; k <= n_cells; ++k) {
        if (start[k] < 0) {  // label absent: empty outline
            offsets_out[k] = pos;
            continue;
        }
        int64_t sy = start[k] / w, sx = start[k] % w;
        // Moore tracing: start facing "up" came-from direction 6 (west)
        int64_t cy = sy, cx = sx;
        int dir = 0;  // search start direction
        int64_t emitted = 0;
        // upper bound on boundary length: 4*(h+w) + area guard
        int64_t guard = 4 * (h * w) + 8;
        do {
            if (pos >= coords_cap) return -1;
            coords_out[2 * pos] = (int32_t)cy;
            coords_out[2 * pos + 1] = (int32_t)cx;
            ++pos;
            ++emitted;
            // find next boundary pixel: scan 8 neighbors clockwise starting
            // from (dir + 6) % 8 (backtrack direction + 1)
            int found = -1;
            for (int t = 0; t < 8; ++t) {
                int d = (dir + 6 + t) % 8;
                int64_t ny = cy + DY8[d], nx = cx + DX8[d];
                if (ny >= 0 && ny < h && nx >= 0 && nx < w &&
                    label_image[ny * w + nx] == k) {
                    found = d;
                    break;
                }
            }
            if (found < 0) break;  // isolated pixel
            cy += DY8[found];
            cx += DX8[found];
            dir = found;
            if (--guard <= 0) break;
        } while (!(cy == sy && cx == sx) || emitted < 2);
        offsets_out[k] = pos;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Convex hull areas
// ---------------------------------------------------------------------------
// For each label: Andrew monotone chain over the label's pixel coordinates,
// then count lattice points inside-or-on the hull polygon (matching
// skimage's convex_image pixel count): for each scanline y, the x-extent of
// the hull is [ceil(xmin(y)), floor(xmax(y))].

struct Pt {
    double x, y;
};

static double cross(const Pt& o, const Pt& a, const Pt& b) {
    return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

static std::vector<Pt> hull_of(std::vector<Pt>& pts) {
    std::sort(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
        return a.x < b.x || (a.x == b.x && a.y < b.y);
    });
    pts.erase(std::unique(pts.begin(), pts.end(),
                          [](const Pt& a, const Pt& b) {
                              return a.x == b.x && a.y == b.y;
                          }),
              pts.end());
    int n = (int)pts.size();
    if (n < 3) return pts;
    std::vector<Pt> hull(2 * n);
    int m = 0;
    for (int i = 0; i < n; ++i) {
        while (m >= 2 && cross(hull[m - 2], hull[m - 1], pts[i]) <= 0) --m;
        hull[m++] = pts[i];
    }
    int lower = m + 1;
    for (int i = n - 2; i >= 0; --i) {
        while (m >= lower && cross(hull[m - 2], hull[m - 1], pts[i]) <= 0) --m;
        hull[m++] = pts[i];
    }
    hull.resize(m - 1);
    return hull;
}

// count lattice points with y in [ymin, ymax] inside or on the hull
static double hull_pixel_count(const std::vector<Pt>& hull) {
    if (hull.size() == 1) return 1.0;
    if (hull.size() == 2) {
        // collinear segment: number of integer points on it
        double dy = hull[1].y - hull[0].y, dx = hull[1].x - hull[0].x;
        return std::max(std::abs(dy), std::abs(dx)) + 1.0;
    }
    double ymin = hull[0].y, ymax = hull[0].y;
    for (const Pt& p : hull) {
        ymin = std::min(ymin, p.y);
        ymax = std::max(ymax, p.y);
    }
    int64_t count = 0;
    int n = (int)hull.size();
    for (int64_t y = (int64_t)ymin; y <= (int64_t)ymax; ++y) {
        double xlo = 1e30, xhi = -1e30;
        for (int i = 0; i < n; ++i) {
            const Pt& a = hull[i];
            const Pt& b = hull[(i + 1) % n];
            if ((a.y <= y && b.y >= y) || (b.y <= y && a.y >= y)) {
                double x;
                if (a.y == b.y) {
                    xlo = std::min(xlo, std::min(a.x, b.x));
                    xhi = std::max(xhi, std::max(a.x, b.x));
                    continue;
                }
                x = a.x + (b.x - a.x) * ((double)y - a.y) / (b.y - a.y);
                xlo = std::min(xlo, x);
                xhi = std::max(xhi, x);
            }
        }
        if (xhi >= xlo) {
            int64_t lo = (int64_t)std::ceil(xlo - 1e-9);
            int64_t hi = (int64_t)std::floor(xhi + 1e-9);
            if (hi >= lo) count += hi - lo + 1;
        }
    }
    return (double)count;
}

// label_image int32 (h*w); areas_out double[n_cells]
int convex_areas(const int32_t* label_image, int64_t h, int64_t w,
                 int32_t n_cells, double* areas_out) {
    std::vector<std::vector<Pt>> pts(n_cells + 1);
    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            int32_t v = label_image[y * w + x];
            if (v > 0 && v <= n_cells) pts[v].push_back({(double)x, (double)y});
        }
    }
    for (int32_t k = 1; k <= n_cells; ++k) {
        if (pts[k].empty()) {
            areas_out[k - 1] = 0.0;
            continue;
        }
        std::vector<Pt> hull = hull_of(pts[k]);
        areas_out[k - 1] = hull_pixel_count(hull);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// ND2 frame de-interleave
// ---------------------------------------------------------------------------
// ND2 frames store components interleaved per pixel ((Y, X, C) uint16); the
// framework wants planar (C, Y, X). One sequential read pass scattering to C
// sequential write streams - the hot inner loop of host-side ND2 decode.
//
// src:    n_px * c uint16 values (interleaved)
// dst:    c * n_px uint16 values (planar), written
void deinterleave_u16(const uint16_t* src, int64_t n_px, int32_t c,
                      uint16_t* dst) {
    if (c == 1) {
        std::memcpy(dst, src, (size_t)n_px * sizeof(uint16_t));
        return;
    }
    // unrolled common cases keep the compiler vectorizing
    if (c == 2) {
        uint16_t* d0 = dst;
        uint16_t* d1 = dst + n_px;
        for (int64_t i = 0; i < n_px; ++i) {
            d0[i] = src[2 * i];
            d1[i] = src[2 * i + 1];
        }
        return;
    }
    if (c == 4) {
        uint16_t* d0 = dst;
        uint16_t* d1 = dst + n_px;
        uint16_t* d2 = dst + 2 * n_px;
        uint16_t* d3 = dst + 3 * n_px;
        for (int64_t i = 0; i < n_px; ++i) {
            d0[i] = src[4 * i];
            d1[i] = src[4 * i + 1];
            d2[i] = src[4 * i + 2];
            d3[i] = src[4 * i + 3];
        }
        return;
    }
    for (int32_t ch = 0; ch < c; ++ch) {
        uint16_t* d = dst + (int64_t)ch * n_px;
        const uint16_t* s = src + ch;
        for (int64_t i = 0; i < n_px; ++i) d[i] = s[(size_t)i * c];
    }
}

}  // extern "C"
