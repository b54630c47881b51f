"""Collision-loss validation against an exact oracle.

The fitter's penetration term (recon/losses.py collision_signed) replaces
the reference's torch-mesh-isect BVH + conic penetration field
(reference: recon/recon_fit_base.py:610-639) with a k-NN tangent-plane
ensemble. This test quantifies its agreement with an EXACT oracle:

- sign: generalized winding number (van Oosterom-Strackee solid angles,
  numpy f64 — exact for closed triangle soups, including unions),
- depth: unsigned distance to the surface via the native C++ BVH
  (native/chorenat.cpp), with the pure-JAX point-mesh UDF as fallback.

Scenes stress the known failure modes of the nearest-vertex plane test:
a convex body, a two-sphere union with a deep crease (armpit analogue),
and a thin slab (thin-limb analogue).
"""
import numpy as np
import pytest

from chore_tpu.recon import losses as L
from chore_tpu.utils.meshio import octasphere


def winding_number(points, verts, faces, chunk=512):
    """(P,) generalized winding number, f64 host math (exact sign oracle)."""
    tri = verts[faces].astype(np.float64)  # (F, 3, 3)
    out = np.empty(len(points))
    for s in range(0, len(points), chunk):
        p = points[s:s + chunk].astype(np.float64)  # (C, 3)
        a = tri[None, :, 0] - p[:, None]
        b = tri[None, :, 1] - p[:, None]
        c = tri[None, :, 2] - p[:, None]
        la = np.linalg.norm(a, axis=-1)
        lb = np.linalg.norm(b, axis=-1)
        lc = np.linalg.norm(c, axis=-1)
        det = np.einsum("pfi,pfi->pf", a, np.cross(b, c))
        denom = (la * lb * lc + np.einsum("pfi,pfi->pf", a, b) * lc
                 + np.einsum("pfi,pfi->pf", b, c) * la
                 + np.einsum("pfi,pfi->pf", c, a) * lb)
        out[s:s + chunk] = 2.0 * np.arctan2(det, denom).sum(1)
    return out / (4.0 * np.pi)


def surface_distance(points, verts, faces):
    """(P,) unsigned distance to the mesh surface."""
    from chore_tpu import native

    if native.available():
        udf, _ = native.point_mesh_udf(points, verts, faces)
        return np.asarray(udf)
    from chore_tpu.ops.point_mesh import point_mesh_udf

    return np.asarray(point_mesh_udf(points, verts, faces))


def _merge(meshes):
    """Concatenate (verts, faces) pairs into one triangle soup."""
    vs, fs, off = [], [], 0
    for v, f in meshes:
        vs.append(v)
        fs.append(f + off)
        off += len(v)
    return np.concatenate(vs), np.concatenate(fs)


def _probes(verts, faces, seed, n=800, spread=0.25):
    """Query points clustered around the surface: random surface points
    jittered along random directions by graded offsets, plus box-uniform."""
    rng = np.random.RandomState(seed)
    fi = rng.randint(0, len(faces), n)
    w = rng.dirichlet([1, 1, 1], n).astype(np.float64)
    base = np.einsum("nk,nkd->nd", w, verts[faces[fi]])
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    off = rng.uniform(-spread, spread, (n, 1))
    near = base + d * off
    lo, hi = verts.min(0) - 0.2, verts.max(0) + 0.2
    box = rng.uniform(lo, hi, (n // 2, 3))
    return np.concatenate([near, box]).astype(np.float32)


def _scene_convex():
    return octasphere(radius=0.5, subdiv=3)


def _scene_crease():
    """Torus: a single watertight surface whose inner ring is strongly
    concave (armpit / between-legs analogue) with no interior geometry —
    unlike a two-sphere union, whose mutually-interior patches would count
    as 'surface' for both the oracle and the loss."""
    R, r, na, nb = 0.45, 0.18, 48, 24
    u = np.linspace(0, 2 * np.pi, na, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nb, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = np.stack([
        (R + r * np.cos(vv)) * np.cos(uu),
        r * np.sin(vv),
        (R + r * np.cos(vv)) * np.sin(uu),
    ], -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(na):
        for j in range(nb):
            a = i * nb + j
            b = i * nb + (j + 1) % nb
            c = ((i + 1) % na) * nb + j
            d = ((i + 1) % na) * nb + (j + 1) % nb
            faces += [[a, b, c], [b, d, c]]
    return verts, np.asarray(faces, np.int32)


def _scene_thin():
    """Thin slab (thin-limb analogue): an ellipsoid squashed to 12%."""
    v, f = octasphere(radius=0.5, subdiv=3)
    return v * np.array([1.0, 0.12, 1.0], np.float32), f


SCENES = {
    "convex": (_scene_convex, 0),
    "crease": (_scene_crease, 1),
    "thin": (_scene_thin, 2),
}


def _evaluate(scene, seed, k):
    """(sign_accuracy, depth_pearson_on_inside_points)."""
    verts, faces = scene()
    pts = _probes(verts, faces, seed)
    w = winding_number(pts, verts, faces)
    inside = w > 0.5
    depth = surface_distance(pts, verts, faces)

    normals = L.vertex_normals(verts[None].astype(np.float32), faces)
    signed = np.asarray(L.collision_signed(
        verts[None].astype(np.float32), normals, pts[None], k=k))[0]

    # exclude points within 2mm of the surface: sign there is genuinely
    # ambiguous at f32 and contributes ~0 loss either way
    clear = depth > 2e-3
    acc = float(np.mean((signed[clear] < 0) == inside[clear]))
    ins = inside & clear
    if ins.sum() >= 10:
        corr = float(np.corrcoef(-signed[ins], depth[ins])[0, 1])
    else:
        corr = 1.0
    return acc, corr


class TestCollisionOracle:
    @pytest.mark.parametrize("name", list(SCENES))
    def test_sign_and_depth(self, name):
        """The default (k=1 nearest-vertex plane) agrees with the exact
        oracle: measured acc .974/.999/.990, corr .999/.9996/.970 on
        convex/crease/thin."""
        scene, seed = SCENES[name]
        acc, corr = _evaluate(scene, seed, k=1)
        assert acc >= 0.97, f"{name}: sign accuracy {acc:.3f}"
        assert corr >= 0.95, f"{name}: depth correlation {corr:.3f}"

    def test_single_plane_beats_knn_ensemble(self):
        """Pins the k=1 default: the inverse-distance k-NN plane ensemble
        measured WORSE on every scene (averaging differently-oriented
        neighbor planes blurs the sign boundary), so the default must stay
        the single nearest-vertex plane. If this ever flips, re-measure
        and switch the default."""
        for name, (scene, seed) in SCENES.items():
            acc1, _ = _evaluate(scene, seed, k=1)
            acc4, _ = _evaluate(scene, seed, k=4)
            assert acc1 >= acc4 - 1e-9, (
                f"{name}: k=4 {acc4:.3f} now beats k=1 {acc1:.3f}"
            )

    def test_loss_zero_outside_positive_inside(self):
        verts, faces = _scene_convex()
        normals = L.vertex_normals(verts[None], faces)
        far = np.array([[[2.0, 0, 0], [0, 2.0, 0]]], np.float32)
        deep = np.array([[[0.0, 0, 0], [0.1, 0, 0]]], np.float32)
        l_out = float(L.collision_loss(verts[None], normals, far))
        l_in = float(L.collision_loss(verts[None], normals, deep))
        assert l_out == 0.0
        assert l_in > 1e-3
