"""Exact point-to-mesh unsigned distance, tiled for TPU.

Replaces ``igl.signed_distance`` in GT preprocessing (reference:
preprocess/boundary_sampler.py:45-55) -- the pipeline only consumes the
absolute value (UDF), so we compute unsigned distance directly, plus the
nearest-vertex index used for part-label transfer (reference:
boundary_sampler.py:58-64).

The inner routine is the classic closest-point-on-triangle region test
(Ericson, "Real-Time Collision Detection" ch. 5.1.5), fully vectorized over
points x triangles so XLA can tile it; memory is bounded by processing query
points in tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def closest_point_on_triangles(p, a, b, c):
    """Closest point on each triangle to each query point.

    Args:
      p: (N, 3) query points.
      a, b, c: (T, 3) triangle vertices.

    Returns:
      (N, T, 3) closest points.
    """
    ab = (b - a)[None]  # (1, T, 3)
    ac = (c - a)[None]
    ap = p[:, None, :] - a[None]  # (N, T, 3)

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p[:, None, :] - b[None]
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p[:, None, :] - c[None]
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    eps = 1e-30
    # Region tests (each (N, T) boolean), evaluated branch-free.
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # Edge AB
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, 1.0, d1 - d3)
    pt_ab = a[None] + jnp.clip(v_ab, 0.0, 1.0)[..., None] * ab
    # Edge AC
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, 1.0, d2 - d6)
    pt_ac = a[None] + jnp.clip(w_ac, 0.0, 1.0)[..., None] * ac
    # Edge BC
    denom_bc = (d4 - d3) + (d5 - d6)
    w_bc = (d4 - d3) / jnp.where(jnp.abs(denom_bc) < eps, 1.0, denom_bc)
    pt_bc = b[None] + jnp.clip(w_bc, 0.0, 1.0)[..., None] * ((c - b)[None])
    # Interior
    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) < eps, 1.0, denom)
    v = vb / denom
    w = vc / denom
    pt_in = a[None] + v[..., None] * ab + w[..., None] * ac

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    out = pt_in
    out = jnp.where(on_bc[..., None], pt_bc, out)
    out = jnp.where(on_ac[..., None], pt_ac, out)
    out = jnp.where(on_ab[..., None], pt_ab, out)
    out = jnp.where(in_c[..., None], c[None] + jnp.zeros_like(out), out)
    out = jnp.where(in_b[..., None], b[None] + jnp.zeros_like(out), out)
    out = jnp.where(in_a[..., None], a[None] + jnp.zeros_like(out), out)
    return out


@functools.partial(jax.jit, static_argnames=("tile",))
def point_mesh_udf(points, verts, faces, tile=512):
    """Unsigned distance from each point to a triangle mesh + nearest vertex.

    Args:
      points: (N, 3) query points.
      verts: (V, 3) mesh vertices.
      faces: (F, 3) int vertex indices.
      tile: query tile size (memory bound: tile * F * 3 floats).

    Returns:
      (udf (N,), nearest_vertex_index (N,)): exact unsigned mesh distance and
      the index of the nearest mesh *vertex* (for part-label transfer).
    """
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]

    n = points.shape[0]
    pad = (-n) % tile
    pp = jnp.pad(points, ((0, pad), (0, 0)))
    pt = pp.reshape(-1, tile, 3)

    def one_tile(pb):
        cp = closest_point_on_triangles(pb, a, b, c)  # (tile, F, 3)
        d2 = jnp.sum((pb[:, None, :] - cp) ** 2, -1)  # (tile, F)
        return jnp.min(d2, axis=1)

    d2 = jax.lax.map(one_tile, pt).reshape(-1)[:n]
    udf = jnp.sqrt(jnp.maximum(d2, 0.0))

    # Nearest vertex (cheaper than nearest point-on-face and exactly what the
    # reference uses for labels via trimesh vertex kd-tree).
    from chore_tpu.ops.chamfer import nn_sqdist

    _, vidx = nn_sqdist(points, verts, tile=max(tile, 2048))
    return udf, vidx
