// chorenat — native host-side geometry runtime for chore_tpu.
//
// TPU-native replacement for the reference's native host geometry deps
// (igl.signed_distance in preprocess/boundary_sampler.py:45-64, sklearn
// KD-tree chamfer in recon/eval/chamfer_distance.py:10-52, trimesh surface
// sampling in recon/recon_fit_base.py:121): an AABB-BVH over triangles with
// exact closest-point queries, a vantage-point-free KD-tree for point NN,
// and area-weighted surface sampling. All batch entry points are
// OpenMP-parallel over query points. C ABI, consumed from Python via ctypes
// (chore_tpu/native.py).
//
// Build: make -C native  (g++ -O3 -fopenmp -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 add(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 scale(Vec3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float sqnorm(Vec3 a) { return dot(a, a); }

// Closest point on triangle (a,b,c) to p — Ericson, "Real-Time Collision
// Detection" ch. 5.1.5 (same region test as chore_tpu/ops/point_mesh.py).
static Vec3 closest_on_triangle(Vec3 p, Vec3 a, Vec3 b, Vec3 c) {
  // denominators are guarded against zero like the device kernel
  // (ops/point_mesh.py): degenerate faces must yield a finite (vertex)
  // result, not NaN that silently drops them from the min
  constexpr float kEps = 1e-30f;
  Vec3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0.f && d2 <= 0.f) return a;

  Vec3 bp = sub(p, b);
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0.f && d4 <= d3) return b;

  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0.f && d1 >= 0.f && d3 <= 0.f) {
    float den = d1 - d3;
    float v = std::fabs(den) < kEps ? 0.f : d1 / den;
    return add(a, scale(ab, std::min(std::max(v, 0.f), 1.f)));
  }

  Vec3 cp = sub(p, c);
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0.f && d5 <= d6) return c;

  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0.f && d2 >= 0.f && d6 <= 0.f) {
    float den = d2 - d6;
    float w = std::fabs(den) < kEps ? 0.f : d2 / den;
    return add(a, scale(ac, std::min(std::max(w, 0.f), 1.f)));
  }

  float va = d3 * d6 - d5 * d4;
  if (va <= 0.f && (d4 - d3) >= 0.f && (d5 - d6) >= 0.f) {
    float den = (d4 - d3) + (d5 - d6);
    float w = std::fabs(den) < kEps ? 0.f : (d4 - d3) / den;
    return add(b, scale(sub(c, b), std::min(std::max(w, 0.f), 1.f)));
  }

  float sum = va + vb + vc;
  if (std::fabs(sum) < kEps) return a;  // fully degenerate face
  float denom = 1.f / sum;
  float v = vb * denom, w = vc * denom;
  return add(a, add(scale(ab, v), scale(ac, w)));
}

struct AABB {
  Vec3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  void grow(Vec3 p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB& o) { grow(o.lo); grow(o.hi); }
  float sqdist(Vec3 p) const {
    float dx = std::max({lo.x - p.x, 0.f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.f, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }
};

struct BVHNode {
  AABB box;
  int32_t left = -1;    // internal: child index; leaf: -1
  int32_t start = 0, count = 0;  // leaf: range into prim order
};

struct BVH {
  std::vector<Vec3> va, vb, vc;     // triangle vertices in prim order
  std::vector<int32_t> prim_face;   // prim order -> original face index
  std::vector<BVHNode> nodes;
  static constexpr int kLeafSize = 4;

  void build(const float* verts, const int32_t* faces, int64_t nf) {
    std::vector<Vec3> ca(nf), cb(nf), cc(nf), cent(nf);
    std::vector<AABB> boxes(nf);
    for (int64_t i = 0; i < nf; ++i) {
      const int32_t* f = faces + 3 * i;
      ca[i] = {verts[3 * f[0]], verts[3 * f[0] + 1], verts[3 * f[0] + 2]};
      cb[i] = {verts[3 * f[1]], verts[3 * f[1] + 1], verts[3 * f[1] + 2]};
      cc[i] = {verts[3 * f[2]], verts[3 * f[2] + 1], verts[3 * f[2] + 2]};
      boxes[i].grow(ca[i]); boxes[i].grow(cb[i]); boxes[i].grow(cc[i]);
      cent[i] = scale(add(add(ca[i], cb[i]), cc[i]), 1.f / 3.f);
    }
    std::vector<int32_t> order(nf);
    std::iota(order.begin(), order.end(), 0);
    nodes.reserve(2 * nf / kLeafSize + 2);
    build_node(order.data(), 0, (int32_t)nf, boxes, cent);
    va.resize(nf); vb.resize(nf); vc.resize(nf);
    prim_face.assign(order.begin(), order.end());
    for (int64_t i = 0; i < nf; ++i) {
      va[i] = ca[order[i]]; vb[i] = cb[order[i]]; vc[i] = cc[order[i]];
    }
  }

  int32_t build_node(int32_t* order, int32_t start, int32_t count,
                     const std::vector<AABB>& boxes,
                     const std::vector<Vec3>& cent) {
    int32_t idx = (int32_t)nodes.size();
    nodes.emplace_back();
    AABB box;
    for (int32_t i = start; i < start + count; ++i) box.grow(boxes[order[i]]);
    nodes[idx].box = box;
    if (count <= kLeafSize) {
      nodes[idx].start = start;
      nodes[idx].count = count;
      return idx;
    }
    Vec3 ext = sub(box.hi, box.lo);
    int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2) : (ext.y > ext.z ? 1 : 2);
    int32_t mid = start + count / 2;
    std::nth_element(order + start, order + mid, order + start + count,
                     [&](int32_t l, int32_t r) {
                       const float* cl = &cent[l].x;
                       const float* cr = &cent[r].x;
                       return cl[axis] < cr[axis];
                     });
    int32_t left = build_node(order, start, count / 2, boxes, cent);
    int32_t right = build_node(order, mid, count - count / 2, boxes, cent);
    nodes[idx].left = left;
    (void)right;  // right child is always left + subtree size; store via left+1 walk
    nodes[idx].start = right;  // reuse start as right-child index for internals
    nodes[idx].count = -1;     // mark internal
    return idx;
  }

  // Closest point query: returns squared distance, face idx, closest point.
  void query(Vec3 p, float* best_d2, int32_t* best_face, Vec3* best_pt) const {
    float bd = 1e30f;
    int32_t bf = -1;
    Vec3 bp{0, 0, 0};
    int32_t stack[128];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int32_t ni = stack[--sp];
      const BVHNode& n = nodes[ni];
      if (n.box.sqdist(p) >= bd) continue;
      if (n.count >= 0) {  // leaf
        for (int32_t i = n.start; i < n.start + n.count; ++i) {
          Vec3 q = closest_on_triangle(p, va[i], vb[i], vc[i]);
          float d2 = sqnorm(sub(p, q));
          if (d2 < bd) { bd = d2; bf = prim_face[i]; bp = q; }
        }
      } else {
        int32_t l = n.left, r = n.start;
        float dl = nodes[l].box.sqdist(p), dr = nodes[r].box.sqdist(p);
        // near child popped last -> visited first
        if (dl < dr) { stack[sp++] = r; stack[sp++] = l; }
        else         { stack[sp++] = l; stack[sp++] = r; }
      }
    }
    *best_d2 = bd;
    *best_face = bf;
    *best_pt = bp;
  }
};

// KD-tree over points (for nearest-vertex / point-cloud NN queries).
struct KDTree {
  std::vector<Vec3> pts;          // reordered
  std::vector<int32_t> idx;       // reorder -> original
  std::vector<int8_t> axis;       // split axis per node (median layout)

  void build(const float* p, int64_t n) {
    pts.resize(n);
    idx.resize(n);
    axis.assign(n, 0);
    for (int64_t i = 0; i < n; ++i) {
      pts[i] = {p[3 * i], p[3 * i + 1], p[3 * i + 2]};
      idx[i] = (int32_t)i;
    }
    build_range(0, (int64_t)n);
  }

  void build_range(int64_t lo, int64_t hi) {
    if (hi - lo <= 1) return;
    AABB box;
    for (int64_t i = lo; i < hi; ++i) box.grow(pts[i]);
    Vec3 ext = sub(box.hi, box.lo);
    int ax = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2) : (ext.y > ext.z ? 1 : 2);
    int64_t mid = lo + (hi - lo) / 2;
    // sort idx+pts together by axis
    std::vector<int64_t> ord(hi - lo);
    std::iota(ord.begin(), ord.end(), lo);
    std::nth_element(ord.begin(), ord.begin() + (mid - lo), ord.end(),
                     [&](int64_t a, int64_t b) {
                       return (&pts[a].x)[ax] < (&pts[b].x)[ax];
                     });
    std::vector<Vec3> tp(hi - lo);
    std::vector<int32_t> ti(hi - lo);
    for (int64_t k = 0; k < hi - lo; ++k) { tp[k] = pts[ord[k]]; ti[k] = idx[ord[k]]; }
    std::copy(tp.begin(), tp.end(), pts.begin() + lo);
    std::copy(ti.begin(), ti.end(), idx.begin() + lo);
    axis[mid] = (int8_t)ax;
    build_range(lo, mid);
    build_range(mid + 1, hi);
  }

  void nearest(Vec3 q, int64_t lo, int64_t hi, float* bd, int32_t* bi) const {
    if (hi <= lo) return;
    int64_t mid = lo + (hi - lo) / 2;
    float d2 = sqnorm(sub(q, pts[mid]));
    if (d2 < *bd) { *bd = d2; *bi = idx[mid]; }
    if (hi - lo == 1) return;
    int ax = axis[mid];
    float delta = (&q.x)[ax] - (&pts[mid].x)[ax];
    if (delta < 0) {
      nearest(q, lo, mid, bd, bi);
      if (delta * delta < *bd) nearest(q, mid + 1, hi, bd, bi);
    } else {
      nearest(q, mid + 1, hi, bd, bi);
      if (delta * delta < *bd) nearest(q, lo, mid, bd, bi);
    }
  }
};

struct SplitMix64 {
  uint64_t s;
  uint64_t next() {
    uint64_t z = (s += 0x9E3779B97f4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
};

}  // namespace

extern "C" {

void* chorenat_bvh_build(const float* verts, int64_t nv, const int32_t* faces,
                         int64_t nf) {
  (void)nv;
  BVH* bvh = new BVH();
  bvh->build(verts, faces, nf);
  return bvh;
}

void chorenat_bvh_free(void* h) { delete static_cast<BVH*>(h); }

// Batched closest-point query: dist (unsigned, not squared), closest face
// index, closest point (np x 3). Any output pointer may be null.
void chorenat_bvh_query(const void* h, const float* pts, int64_t np,
                        float* dist, int32_t* face_idx, float* closest) {
  const BVH* bvh = static_cast<const BVH*>(h);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < np; ++i) {
    Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    float d2;
    int32_t f;
    Vec3 cp;
    bvh->query(p, &d2, &f, &cp);
    if (dist) dist[i] = std::sqrt(std::max(d2, 0.f));
    if (face_idx) face_idx[i] = f;
    if (closest) { closest[3 * i] = cp.x; closest[3 * i + 1] = cp.y; closest[3 * i + 2] = cp.z; }
  }
}

void* chorenat_kdtree_build(const float* pts, int64_t n) {
  KDTree* t = new KDTree();
  t->build(pts, n);
  return t;
}

void chorenat_kdtree_free(void* h) { delete static_cast<KDTree*>(h); }

// Batched 1-NN: for each query, index of nearest tree point + distance.
void chorenat_kdtree_query(const void* h, const float* q, int64_t nq,
                           float* dist, int32_t* index) {
  const KDTree* t = static_cast<const KDTree*>(h);
  int64_t n = (int64_t)t->pts.size();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nq; ++i) {
    Vec3 p{q[3 * i], q[3 * i + 1], q[3 * i + 2]};
    float bd = 1e30f;
    int32_t bi = -1;
    t->nearest(p, 0, n, &bd, &bi);
    if (dist) dist[i] = std::sqrt(std::max(bd, 0.f));
    if (index) index[i] = bi;
  }
}

// Area-weighted surface sampling (trimesh.sample equivalent): n points
// uniform over the surface, deterministic in seed.
void chorenat_sample_surface(const float* verts, const int32_t* faces,
                             int64_t nf, int64_t n, uint64_t seed,
                             float* out) {
  if (nf <= 0 || n <= 0) return;  // empty mesh: leave output zeroed
  std::vector<double> cdf(nf);
  double acc = 0.0;
  for (int64_t i = 0; i < nf; ++i) {
    const int32_t* f = faces + 3 * i;
    Vec3 a{verts[3 * f[0]], verts[3 * f[0] + 1], verts[3 * f[0] + 2]};
    Vec3 b{verts[3 * f[1]], verts[3 * f[1] + 1], verts[3 * f[1] + 2]};
    Vec3 c{verts[3 * f[2]], verts[3 * f[2] + 1], verts[3 * f[2] + 2]};
    Vec3 cr = cross(sub(b, a), sub(c, a));
    acc += 0.5 * std::sqrt((double)sqnorm(cr));
    cdf[i] = acc;
  }
  // per-sample counter-based rng: deterministic in (seed, i) regardless of
  // thread count/schedule
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    SplitMix64 local{seed ^ (0xD1B54A32D192ED03ull + (uint64_t)i * 0x9E3779B97f4A7C15ull)};
    double u = local.uniform() * acc;
    int64_t fi = std::lower_bound(cdf.begin(), cdf.end(), u) - cdf.begin();
    if (fi >= nf) fi = nf - 1;
    const int32_t* f = faces + 3 * fi;
    Vec3 a{verts[3 * f[0]], verts[3 * f[0] + 1], verts[3 * f[0] + 2]};
    Vec3 b{verts[3 * f[1]], verts[3 * f[1] + 1], verts[3 * f[1] + 2]};
    Vec3 c{verts[3 * f[2]], verts[3 * f[2] + 1], verts[3 * f[2] + 2]};
    float r1 = std::sqrt((float)local.uniform());
    float r2 = (float)local.uniform();
    Vec3 p = add(scale(a, 1.f - r1),
                 add(scale(b, r1 * (1.f - r2)), scale(c, r1 * r2)));
    out[3 * i] = p.x; out[3 * i + 1] = p.y; out[3 * i + 2] = p.z;
  }
}

// Bidirectional sqrt chamfer between two point clouds
// (reference: recon/eval/chamfer_distance.py:10-52 — sum of the two
// directional mean sqrt distances).
float chorenat_chamfer(const float* a, int64_t na, const float* b, int64_t nb) {
  KDTree ta, tb;
  ta.build(a, na);
  tb.build(b, nb);
  double s_ab = 0.0, s_ba = 0.0;
#pragma omp parallel for schedule(static) reduction(+ : s_ab)
  for (int64_t i = 0; i < na; ++i) {
    Vec3 p{a[3 * i], a[3 * i + 1], a[3 * i + 2]};
    float bd = 1e30f;
    int32_t bi = -1;
    tb.nearest(p, 0, nb, &bd, &bi);
    s_ab += std::sqrt(std::max((double)bd, 0.0));
  }
#pragma omp parallel for schedule(static) reduction(+ : s_ba)
  for (int64_t i = 0; i < nb; ++i) {
    Vec3 p{b[3 * i], b[3 * i + 1], b[3 * i + 2]};
    float bd = 1e30f;
    int32_t bi = -1;
    ta.nearest(p, 0, na, &bd, &bi);
    s_ba += std::sqrt(std::max((double)bd, 0.0));
  }
  return (float)(s_ab / (double)na + s_ba / (double)nb);
}

}  // extern "C"
