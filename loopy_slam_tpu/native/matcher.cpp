// Native host-side kernels for loopy_slam_tpu.
//
// The reference delegated its host-side hot loops to prebuilt C++ libraries
// (DBoW3 descriptor scoring, Open3D surface extraction — SURVEY.md §2.3).
// These are this framework's first-party equivalents, exposed through a
// plain C ABI consumed via ctypes (no pybind11 in the image).
//
//   hamming_mutual_matches : brute-force mutual-NN matching of packed
//       256-bit ORB descriptors (place recognition scoring).
//   march_tets             : marching-tetrahedra surface extraction over a
//       dense TSDF grid (6-tet cube decomposition, NaN = unobserved).
//   raster_depth           : z-buffer triangle rasterizer producing a depth
//       image (replaces the Open3D offscreen depth renders of reference
//       src/tools/eval_recon.py:162-214).
//
// Build: cc -O3 -march=native -shared -fPIC matcher.cpp -o libloopy.so
// (driven by loopy_slam_tpu/native/build.py at first import).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Hamming mutual matching.
// a: (na, 32) uint8 packed descriptors; b: (nb, 32).
// out_idx: (na,) int32 — index into b of a's nearest neighbor.
// out_dist: (na,) int32 — its Hamming distance.
// Returns the number of mutual matches with distance < max_dist.
// ---------------------------------------------------------------------
static inline int hdist(const uint8_t* x, const uint8_t* y) {
    // 4x 64-bit popcounts over the 32-byte descriptor
    uint64_t a0, a1, a2, a3, b0, b1, b2, b3;
    std::memcpy(&a0, x, 8);  std::memcpy(&a1, x + 8, 8);
    std::memcpy(&a2, x + 16, 8); std::memcpy(&a3, x + 24, 8);
    std::memcpy(&b0, y, 8);  std::memcpy(&b1, y + 8, 8);
    std::memcpy(&b2, y + 16, 8); std::memcpy(&b3, y + 24, 8);
    return __builtin_popcountll(a0 ^ b0) + __builtin_popcountll(a1 ^ b1)
         + __builtin_popcountll(a2 ^ b2) + __builtin_popcountll(a3 ^ b3);
}

int hamming_mutual_matches(const uint8_t* a, int na,
                           const uint8_t* b, int nb,
                           int max_dist,
                           int32_t* out_idx, int32_t* out_dist) {
    std::vector<int32_t> nn_ba(nb, -1);
    std::vector<int32_t> d_ba(nb, 1 << 30);
    for (int i = 0; i < na; ++i) {
        int best = 1 << 30, bj = -1;
        const uint8_t* ai = a + 32 * i;
        for (int j = 0; j < nb; ++j) {
            int d = hdist(ai, b + 32 * j);
            if (d < best) { best = d; bj = j; }
            if (d < d_ba[j]) { d_ba[j] = d; nn_ba[j] = i; }
        }
        out_idx[i] = bj;
        out_dist[i] = best;
    }
    int good = 0;
    for (int i = 0; i < na; ++i) {
        int j = out_idx[i];
        if (j >= 0 && nn_ba[j] == i && out_dist[i] < max_dist) ++good;
    }
    return good;
}

// ---------------------------------------------------------------------
// Marching tetrahedra over a dense (X,Y,Z) float32 TSDF where NaN marks
// unobserved voxels. Emits triangle soup (voxel coordinates).
// out_tris must hold up to max_tris * 9 floats. Returns triangle count
// (truncated at max_tris).
// ---------------------------------------------------------------------
static const int TETS[6][4] = {
    {0, 5, 1, 3}, {0, 5, 3, 7}, {0, 5, 7, 4},
    {0, 7, 3, 2}, {0, 7, 2, 6}, {0, 7, 6, 4},
};
static const int CORNER[8][3] = {
    {0,0,0},{0,0,1},{0,1,0},{0,1,1},{1,0,0},{1,0,1},{1,1,0},{1,1,1},
};

int march_tets(const float* vol, int X, int Y, int Z,
               float* out_tris, long max_tris) {
    long n = 0;
    auto V = [&](int x, int y, int z) -> float {
        return vol[(long)(x) * Y * Z + (long)(y) * Z + z];
    };
    float cv[8];
    float px[8], py[8], pz[8];
    for (int x = 0; x + 1 < X; ++x)
    for (int y = 0; y + 1 < Y; ++y)
    for (int z = 0; z + 1 < Z; ++z) {
        bool ok = true, neg = false, pos = false;
        for (int c = 0; c < 8; ++c) {
            float v = V(x + CORNER[c][0], y + CORNER[c][1], z + CORNER[c][2]);
            if (std::isnan(v)) { ok = false; break; }
            cv[c] = v;  // inside = v < 0, outside = v >= 0 (0 is outside)
            if (v < 0) neg = true; else pos = true;
            px[c] = x + CORNER[c][0];
            py[c] = y + CORNER[c][1];
            pz[c] = z + CORNER[c][2];
        }
        if (!ok || !neg || !pos) continue;
        for (int t = 0; t < 6; ++t) {
            const int* T = TETS[t];
            int code = 0;
            for (int k = 0; k < 4; ++k)
                if (cv[T[k]] < 0) code |= 1 << k;
            if (code == 0 || code == 15) continue;
            int ins[4], outs[4], ni = 0, no = 0;
            for (int k = 0; k < 4; ++k)
                (code & (1 << k)) ? ins[ni++] = T[k] : outs[no++] = T[k];
            auto emit_edge = [&](int a2, int b2, float* o) {
                float va = cv[a2], vb = cv[b2];
                float tt = va / (va - vb + 1e-12f);
                o[0] = px[a2] + tt * (px[b2] - px[a2]);
                o[1] = py[a2] + tt * (py[b2] - py[a2]);
                o[2] = pz[a2] + tt * (pz[b2] - pz[a2]);
            };
            if (ni == 1 || ni == 3) {
                int apex = (ni == 1) ? ins[0] : outs[0];
                int* ring = (ni == 1) ? outs : ins;
                if (n < max_tris) {
                    float* o = out_tris + n * 9;
                    emit_edge(ni == 1 ? apex : ring[0],
                              ni == 1 ? ring[0] : apex, o);
                    emit_edge(ni == 1 ? apex : ring[1],
                              ni == 1 ? ring[1] : apex, o + 3);
                    emit_edge(ni == 1 ? apex : ring[2],
                              ni == 1 ? ring[2] : apex, o + 6);
                    ++n;
                }
            } else {  // 2 in, 2 out -> quad -> 2 triangles
                float pac[3], pad[3], pbc[3], pbd[3];
                emit_edge(ins[0], outs[0], pac);
                emit_edge(ins[0], outs[1], pad);
                emit_edge(ins[1], outs[0], pbc);
                emit_edge(ins[1], outs[1], pbd);
                if (n < max_tris) {
                    float* o = out_tris + n * 9;
                    std::memcpy(o, pac, 12);
                    std::memcpy(o + 3, pad, 12);
                    std::memcpy(o + 6, pbd, 12);
                    ++n;
                }
                if (n < max_tris) {
                    float* o = out_tris + n * 9;
                    std::memcpy(o, pac, 12);
                    std::memcpy(o + 3, pbd, 12);
                    std::memcpy(o + 6, pbc, 12);
                    ++n;
                }
            }
        }
    }
    return (int)n;
}

// ---------------------------------------------------------------------
// Z-buffer triangle rasterization to a depth image.
// verts: (V,3) float32 world coords; faces: (F,3) int32; w2c: 4x4
// row-major world->camera. Camera convention matches the repo's datasets
// (ops/raster.py, tools/cull_mesh.py): the camera looks down -z, so the
// optical-axis depth is -z_cam, u = fx*x/(-z) + cx, v = -fy*y/(-z) + cy.
// out: (H*W) float32, 0 where nothing is hit. Depth is perspective-correct
// (1/z interpolated with screen-space barycentrics). Triangles with any
// vertex behind the near plane are skipped (no clipping — negligible for
// the room-scale interior views this serves).
// ---------------------------------------------------------------------
int raster_depth(const float* verts, int V, const int32_t* faces, int F,
                 const double* w2c, int H, int W,
                 double fx, double fy, double cx, double cy,
                 float* out) {
    const double kNear = 1e-4;
    std::vector<double> u(V), v(V), iz(V);   // screen coords + inverse depth
    std::vector<uint8_t> front(V);
    for (int i = 0; i < V; ++i) {
        double X = verts[3 * i], Y = verts[3 * i + 1], Zw = verts[3 * i + 2];
        double xc = w2c[0] * X + w2c[1] * Y + w2c[2] * Zw + w2c[3];
        double yc = w2c[4] * X + w2c[5] * Y + w2c[6] * Zw + w2c[7];
        double zc = w2c[8] * X + w2c[9] * Y + w2c[10] * Zw + w2c[11];
        double z = -zc;  // optical-axis depth
        front[i] = z > kNear;
        if (!front[i]) continue;
        u[i] = fx * xc / z + cx;
        v[i] = -fy * yc / z + cy;
        iz[i] = 1.0 / z;
    }
    for (long p = 0; p < (long)H * W; ++p) out[p] = 0.0f;
    std::vector<double> zbuf((long)H * W, 0.0);  // stores max 1/z
    for (int f = 0; f < F; ++f) {
        int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
        if (!front[a] || !front[b] || !front[c]) continue;
        double ux0 = u[a], uy0 = v[a], ux1 = u[b], uy1 = v[b];
        double ux2 = u[c], uy2 = v[c];
        double area = (ux1 - ux0) * (uy2 - uy0) - (ux2 - ux0) * (uy1 - uy0);
        if (std::fabs(area) < 1e-12) continue;
        int x0 = (int)std::floor(std::fmin(ux0, std::fmin(ux1, ux2)));
        int x1 = (int)std::ceil(std::fmax(ux0, std::fmax(ux1, ux2)));
        int y0 = (int)std::floor(std::fmin(uy0, std::fmin(uy1, uy2)));
        int y1 = (int)std::ceil(std::fmax(uy0, std::fmax(uy1, uy2)));
        if (x0 < 0) x0 = 0; if (y0 < 0) y0 = 0;
        if (x1 >= W) x1 = W - 1; if (y1 >= H) y1 = H - 1;
        if (x0 > x1 || y0 > y1) continue;
        double inv_area = 1.0 / area;
        for (int py = y0; py <= y1; ++py) {
            for (int px_ = x0; px_ <= x1; ++px_) {
                double sx = px_ + 0.0, sy = py + 0.0;
                double w0 = ((ux1 - sx) * (uy2 - sy)
                             - (ux2 - sx) * (uy1 - sy)) * inv_area;
                double w1 = ((ux2 - sx) * (uy0 - sy)
                             - (ux0 - sx) * (uy2 - sy)) * inv_area;
                double w2 = 1.0 - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                double invz = w0 * iz[a] + w1 * iz[b] + w2 * iz[c];
                long idx = (long)py * W + px_;
                if (invz > zbuf[idx]) {
                    zbuf[idx] = invz;
                    out[idx] = (float)(1.0 / invz);
                }
            }
        }
    }
    return 0;
}

// ---------------------------------------------------------------------
// Incremental multi-index Hamming inverted index over packed 256-bit ORB
// descriptors (place-recognition candidate retrieval; replaces the
// all-pairs anchor matching that made ScoreDB.query linear in
// segments x N^2 descriptors — reference uses a DBoW3 vocabulary tree,
// src/neural_point.py:77-80,136-142).
//
// Scheme (multi-index hashing, Norouzi et al.): each descriptor is split
// into 16 disjoint 16-bit substrings; substring c of value v files the
// descriptor in bucket (c, v). A query descriptor probes its own 16
// buckets; any stored descriptor sharing >=1 exact substring surfaces as
// a candidate, voting for its anchor (deduplicated per query
// descriptor). True ORB correspondences have Hamming distance ~20-50 of
// 256, so the expected number of untouched substrings is high and a
// matching ANCHOR (dozens of correspondences) is surfaced with
// probability ~1, while the probe cost is independent of the number of
// stored anchors (bucket occupancy stays near uniform-random).
// Exact mutual-match scoring then runs only on the voted shortlist.
// ---------------------------------------------------------------------
struct HamIndex {
    std::vector<std::vector<int32_t>> buckets;  // 16 * 65536
    std::vector<int32_t> entry_anchor;          // entry id -> anchor id
    int n_anchors = 0;
    HamIndex() : buckets((size_t)16 * 65536) {}
};

void* hamidx_create() { return new HamIndex(); }

void hamidx_destroy(void* p) { delete (HamIndex*)p; }

int hamidx_size(void* p) {
    return (int)((HamIndex*)p)->entry_anchor.size();
}

void hamidx_add(void* p, const uint8_t* des, int n, int anchor_id) {
    HamIndex* h = (HamIndex*)p;
    if (anchor_id >= h->n_anchors) h->n_anchors = anchor_id + 1;
    for (int i = 0; i < n; ++i) {
        int32_t eid = (int32_t)h->entry_anchor.size();
        h->entry_anchor.push_back(anchor_id);
        const uint8_t* d = des + 32 * i;
        for (int c = 0; c < 16; ++c) {
            uint16_t key;
            std::memcpy(&key, d + 2 * c, 2);
            h->buckets[(size_t)c * 65536 + key].push_back(eid);
        }
    }
}

// out_votes: (n_anchors,) float32, caller-zeroed. Each query descriptor
// adds at most one vote per anchor.
void hamidx_query(void* p, const uint8_t* des, int n,
                  float* out_votes, int n_anchors) {
    HamIndex* h = (HamIndex*)p;
    std::vector<int32_t> last(h->n_anchors, -1);
    for (int i = 0; i < n; ++i) {
        const uint8_t* d = des + 32 * i;
        for (int c = 0; c < 16; ++c) {
            uint16_t key;
            std::memcpy(&key, d + 2 * c, 2);
            const std::vector<int32_t>& b =
                h->buckets[(size_t)c * 65536 + key];
            for (int32_t eid : b) {
                int32_t an = h->entry_anchor[eid];
                if (an < n_anchors && last[an] != i) {
                    last[an] = i;
                    out_votes[an] += 1.0f;
                }
            }
        }
    }
}

}  // extern "C"
