"""Pallas TPU kernel: soft-silhouette coverage (forward + custom VJP).

The XLA soft rasterizer (ops/rasterizer.py soft_silhouette) is HBM-bound:
each of its elementwise stages materializes a (pixels, faces) buffer --
65536 x F floats, several times, forward and backward (measured 2.5 ms per
silhouette gradient step at 256^2 x 128 faces, and it scales linearly in
F). This kernel keeps the whole pixels x faces computation in VMEM:

  * per face edge e: signed distance is affine in the pixel,
        d_e(p) = A_e * px + B_e * py + C_e
    evaluated as (TILE_P, 1) x (1, TILE_F) broadcast FMAs on the VPU
    (contraction depth is only 3, so the MXU runs ~16x under-utilized on
    this shape — see _edge_d); coverage = sigmoid(min_e d_e) on the
    resident tile, reduced into a per-pixel accumulator.
  * the backward pass re-computes the tile and contracts the sigmoid
    derivative against the pixel coordinates (sublane-axis reductions),
    accumulating per-face coefficient gradients across the sequential TPU
    grid. d(coeffs)/d(vertices) stays in XLA autodiff outside the kernel.

Coefficients arrive pre-scaled by 1/sigma; invalid faces (degenerate,
behind camera, padding) carry C = -1e9 so they contribute sigmoid(-inf)=0
forward and a zero derivative backward -- no separate mask plumbing.

Replaces the forward/backward CUDA rasterizer pair of the reference for
the silhouette loss (reference:
external/neural_renderer/neural_renderer/cuda/rasterize_cuda_kernel.cu:98-215
forward, :291+ hand-written edge-gradient backward; ours differentiates a
soft coverage instead, same as ops/rasterizer.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chore_tpu.ops.rasterizer import COVERAGE_CUTOFF


def _edge_d(px, py, e_ref, sl):
    """One edge's affine evaluation as VPU broadcast multiply-adds.

    px/py: (TILE_P, 1) pixel coordinate columns. e_ref: (8, Fp)
    coefficient block (rows 0..2 = A, B, C). Returns (TILE_P, TILE_F).

    A (TILE_P,1)x(1,TILE_F) broadcast FMA beats the former
    (TILE_P,8)@(8,F) MXU matmul here: the contraction depth is only 8
    (padded to the MXU's 128) and HIGHEST-precision f32 multiplies the
    pass count, so the systolic array ran ~16x under-utilized — measured
    2.6-3.2x slower than this VPU form at 256^2 x {128,2048} faces.
    Exact f32 FMAs also replace the 6-pass bf16 HIGHEST emulation.
    """
    A = e_ref[0:1, sl]  # (1, TILE_F)
    B = e_ref[1:2, sl]
    C = e_ref[2:3, sl]
    return px * A + py * B + C


def _box_d(pxs, pys, e0_ref, sl):
    """AABB plane distances (pre-scaled by 1/sigma): block-0 rows 3..6
    carry [xmin, xmax, ymin, ymax]/sigma per face; pxs/pys are the
    pixel coords/sigma. Caps the edge-LINE min, which misclassifies the
    thin wedge beyond a sliver's corners as near-or-inside (see
    rasterizer._signed_distance)."""
    bx0 = e0_ref[3:4, sl]
    bx1 = e0_ref[4:5, sl]
    by0 = e0_ref[5:6, sl]
    by1 = e0_ref[6:7, sl]
    return jnp.minimum(jnp.minimum(pxs - bx0, bx1 - pxs),
                       jnp.minimum(pys - by0, by1 - pys))


def _tile_y_range(image_size, tile_p, inv_sigma):
    """This grid step's pixel-tile y extent in SCALED (1/sigma) NDC units.

    Pixel tiles are TILE_P consecutive row-major pixels = whole image rows
    (plus zero-padded rows past P on the last tile, which carry zero
    upstream gradient and are sliced off forward, so overshooting the row
    range there is harmless -- it only makes the cull conservative)."""
    t = pl.program_id(0)
    r0 = (t * tile_p) // image_size
    r1 = jnp.minimum(((t + 1) * tile_p - 1) // image_size, image_size - 1)
    scale = inv_sigma / image_size
    y_lo = (2.0 * r0.astype(jnp.float32) + 1.0) * scale - inv_sigma
    y_hi = (2.0 * r1.astype(jnp.float32) + 1.0) * scale - inv_sigma
    return y_lo, y_hi


def _chunk_hit(b_ref, j, y_lo, y_hi, inv_sigma):
    """True iff face-chunk j's union AABB, dilated by the coverage window,
    can reach any pixel of this tile. Everything is pre-scaled by 1/sigma,
    so the window radius is exactly COVERAGE_CUTOFF. A miss means every
    pixel of the tile is > CUTOFF*sigma outside every face AABB of the
    chunk, hence dmin < -CUTOFF for all of them and the chunk's forward
    coverage AND backward sigmoid derivative are exactly zero -- skipping
    is exact, not approximate. Pixel tiles span the full image width, so
    the y test is per-tile; the x test only fires when the chunk hangs
    fully off the screen (pixel x covers (-inv_sigma, inv_sigma))."""
    y_hit = ((b_ref[j, 2] <= y_hi + COVERAGE_CUTOFF)
             & (b_ref[j, 3] >= y_lo - COVERAGE_CUTOFF))
    x_hit = ((b_ref[j, 0] <= inv_sigma + COVERAGE_CUTOFF)
             & (b_ref[j, 1] >= -inv_sigma - COVERAGE_CUTOFF))
    return y_hit & x_hit


def _fwd_kernel(pix_ref, e0_ref, e1_ref, e2_ref, b_ref, out_ref, *,
                tile_f, image_size, inv_sigma):
    n_chunks = e0_ref.shape[1] // tile_f
    px = pix_ref[:, 0:1]  # (TILE_P, 1)
    py = pix_ref[:, 1:2]
    pxs = pix_ref[:, 2:3]  # px / sigma (for the AABB cap)
    pys = pix_ref[:, 3:4]
    y_lo, y_hi = _tile_y_range(image_size, px.shape[0], inv_sigma)

    out_ref[:] = jnp.zeros_like(out_ref)

    def chunk(j, _):
        # tile-level face culling (the TPU analog of NMR's face binning,
        # reference rasterize_cuda_kernel.cu:25-95): with the windowed
        # support most (pixel tile, face chunk) pairs contribute exactly
        # zero; one scalar AABB test skips all their VPU work
        @pl.when(_chunk_hit(b_ref, j, y_lo, y_hi, inv_sigma))
        def _do():
            sl = pl.ds(j * tile_f, tile_f)
            d0 = _edge_d(px, py, e0_ref, sl)
            d1 = _edge_d(px, py, e1_ref, sl)
            d2 = _edge_d(px, py, e2_ref, sl)
            dmin = jnp.minimum(jnp.minimum(jnp.minimum(d0, d1), d2),
                               _box_d(pxs, pys, e0_ref, sl))
            # windowed support (see rasterizer.COVERAGE_CUTOFF): far tails
            # must be exactly 0 or thousands of faces sum to >0.5 background
            cov = jnp.where(dmin > -COVERAGE_CUTOFF,
                            jax.nn.sigmoid(dmin), 0.0)
            out_ref[:] += jnp.sum(cov, axis=1, keepdims=True)

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _bwd_kernel(pix_ref, e0_ref, e1_ref, e2_ref, g_ref, b_ref,
                de0_ref, de1_ref, de2_ref, *, tile_f, image_size,
                inv_sigma):
    pi = pl.program_id(0)

    @pl.when(pi == 0)
    def _init():
        de0_ref[:] = jnp.zeros_like(de0_ref)
        de1_ref[:] = jnp.zeros_like(de1_ref)
        de2_ref[:] = jnp.zeros_like(de2_ref)

    n_chunks = e0_ref.shape[1] // tile_f
    g = g_ref[:]  # (TILE_P, 1) upstream dL/d(raw coverage sum)
    y_lo, y_hi = _tile_y_range(image_size, pix_ref.shape[0], inv_sigma)
    # whole-tile skip on zero upstream gradient: the loss clips coverage
    # to [0, 1], so every pixel deep INSIDE the object (raw sum > 1,
    # which with an ROI-zoomed template is most of the frame) arrives
    # with g == 0 exactly, as does the far background through the loss's
    # keep-mask/windowed support. Their contributions are g * s * (1-s)
    # = 0 for every face -- skipping the tile is exact.
    tile_live = jnp.max(jnp.abs(g)) > 0.0

    def chunk(j, _):
        # both culls are exact (see _chunk_hit / tile_live above): a
        # skipped (tile, chunk) pair accumulates exactly zero into every
        # de row it would have touched
        @pl.when(tile_live & _chunk_hit(b_ref, j, y_lo, y_hi, inv_sigma))
        def _do():
            _bwd_chunk(pix_ref, e0_ref, e1_ref, e2_ref, g,
                       de0_ref, de1_ref, de2_ref, j, tile_f)

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _bwd_chunk(pix_ref, e0_ref, e1_ref, e2_ref, g,
               de0_ref, de1_ref, de2_ref, j, tile_f):
    """One live (pixel tile, face chunk) backward contraction."""
    px = pix_ref[:, 0:1]
    py = pix_ref[:, 1:2]
    pxs = pix_ref[:, 2:3]
    pys = pix_ref[:, 3:4]
    sl = pl.ds(j * tile_f, tile_f)
    d0 = _edge_d(px, py, e0_ref, sl)
    d1 = _edge_d(px, py, e1_ref, sl)
    d2 = _edge_d(px, py, e2_ref, sl)
    t0 = pxs - e0_ref[3:4, sl]
    t1 = e0_ref[4:5, sl] - pxs
    t2 = pys - e0_ref[5:6, sl]
    t3 = e0_ref[6:7, sl] - pys
    dbox = jnp.minimum(jnp.minimum(t0, t1), jnp.minimum(t2, t3))
    dedge = jnp.minimum(jnp.minimum(d0, d1), d2)
    dmin = jnp.minimum(dedge, dbox)
    s = jax.nn.sigmoid(dmin)
    # same windowed support as forward (XLA-path parity)
    ds = jnp.where(dmin > -COVERAGE_CUTOFF,
                   g * s * (1.0 - s), 0.0)  # (TILE_P, TILE_F)
    # min subgradient: first term attaining the min (argmin semantics;
    # edges win a box tie to match jnp.minimum(dedge, dbox) autodiff)
    mbox = dbox < dedge
    m0 = (~mbox) & (d0 <= d1) & (d0 <= d2)
    m1 = (~mbox) & ~m0 & (d1 <= d2)
    m2 = (~mbox) & ~(m0 | m1)
    for m, de_ref in ((m0, de0_ref), (m1, de1_ref), (m2, de2_ref)):
        w = jnp.where(m, ds, 0.0)  # (TILE_P, TILE_F)
        # d(coeffs): contract over the pixel tile on the VPU (sublane
        # reduction); rows are [dA, dB, dC] = sum_p w * [px, py, 1]
        dA = jnp.sum(w * px, axis=0, keepdims=True)  # (1, TILE_F)
        dB = jnp.sum(w * py, axis=0, keepdims=True)
        dC = jnp.sum(w, axis=0, keepdims=True)
        de_ref[0:1, sl] += dA
        de_ref[1:2, sl] += dB
        de_ref[2:3, sl] += dC
    # AABB rows (block 0, rows 3..6): d(t0)/d(xmin_s) = -1,
    # d(t1)/d(xmax_s) = +1, etc., routed to the single active term
    n0 = (t0 <= t1) & (t0 <= t2) & (t0 <= t3)
    n1 = ~n0 & (t1 <= t2) & (t1 <= t3)
    n2 = ~(n0 | n1) & (t2 <= t3)
    n3 = ~(n0 | n1 | n2)
    for n, row, sgn in ((n0, 3, -1.0), (n1, 4, 1.0),
                        (n2, 5, -1.0), (n3, 6, 1.0)):
        w = jnp.where(mbox & n, ds, 0.0)
        de0_ref[row:row + 1, sl] += sgn * jnp.sum(w, axis=0,
                                                  keepdims=True)


@functools.lru_cache(maxsize=16)
def _pix_aug(image_size, inv_sigma):
    """(P, 8) pixel rows [px, py, px/sigma, py/sigma, 1, 0...] at NDC
    pixel centers (the scaled columns feed the AABB cap).

    Pure NUMPY on purpose: the arguments are jit-static, so this embeds as
    an XLA constant that gets hoisted out of the fit's while_loops. As jnp
    ops it was re-materialized EVERY optimizer step inside the loop body
    (traced: concatenate.641 + broadcasts = ~150 ms of a 444 ms sil phase,
    2 MB rebuilt 500x); XLA does not hoist non-constant producers from
    while bodies."""
    import numpy as np

    coords = (2.0 * np.arange(image_size) + 1.0) / image_size - 1.0
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    p = gx.size
    gx = gx.reshape(p, 1)
    gy = gy.reshape(p, 1)
    return np.concatenate([
        gx, gy, gx * inv_sigma, gy * inv_sigma, np.ones((p, 1)),
        np.zeros((p, 3)),
    ], axis=-1).astype(np.float32)


def _chunk_boxes(ep, tile_f):
    """Per-face-chunk union AABBs for the in-kernel cull: (n_chunks, 4)
    rows [xmin, xmax, ymin, ymax], pre-scaled by 1/sigma like the per-face
    rows they union (ep[0] rows 3..6). Invalid/padding faces (C = -1e9)
    are excluded via +/-big fills, so an all-padding chunk unions to an
    empty box (min > max) and is never hit -- exact, they contribute zero
    coverage anyway."""
    valid = ep[0, 2] > -1e8  # (Fp,)
    big = jnp.float32(4e9)
    n = ep.shape[-1] // tile_f

    def red(row, fill, fn):
        vals = jnp.where(valid, ep[0, row], fill)
        return fn(vals.reshape(n, tile_f), axis=1)

    return jnp.stack([
        red(3, big, jnp.min), red(4, -big, jnp.max),
        red(5, big, jnp.min), red(6, -big, jnp.max),
    ], axis=1)


def _pad_inputs(e, image_size, tile_p, tile_f, inv_sigma):
    """Pad faces (C = -1e9 -> zero coverage) and pixels (rows of zeros,
    sliced off after) to tile multiples."""
    f = e.shape[-1]
    tile_f = min(tile_f, -(-max(f, 1) // 128) * 128)
    fpad = (-f) % tile_f or (tile_f if f == 0 else 0)
    pad_col = jnp.zeros((3, 8, fpad), e.dtype).at[:, 2, :].set(-1e9)
    ep = jnp.concatenate([e, pad_col], axis=-1) if fpad else e
    pix = _pix_aug(image_size, inv_sigma)
    p = pix.shape[0]
    ppad = (-p) % tile_p
    if ppad:
        # numpy pad: pix stays a trace-time constant (see _pix_aug)
        import numpy as np

        pix = np.pad(pix, ((0, ppad), (0, 0)))
    return ep, pix, p, tile_f


@functools.partial(jax.jit, static_argnames=("image_size", "inv_sigma",
                                              "tile_p", "tile_f"))
def _coverage_fwd_call(e, image_size, inv_sigma, tile_p=512, tile_f=512):
    """e: (3, 8, F) edge coefficients -> (P,) raw coverage sums."""
    ep, pix, p, tile_f = _pad_inputs(e, image_size, tile_p, tile_f,
                                     inv_sigma)
    grid = (pix.shape[0] // tile_p,)
    fp = ep.shape[-1]
    boxes = _chunk_boxes(ep, tile_f)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_f=tile_f,
                          image_size=image_size, inv_sigma=inv_sigma),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 8), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(boxes.shape, lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_p, 1), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pix.shape[0], 1), jnp.float32),
    )(pix, ep[0], ep[1], ep[2], boxes)
    return out[:p, 0]


@functools.partial(jax.jit, static_argnames=("image_size", "inv_sigma",
                                              "tile_p", "tile_f"))
def _coverage_bwd_call(e, g, image_size, inv_sigma, tile_p=512, tile_f=512):
    """g: (P,) upstream grads -> (3, 8, F) coefficient grads."""
    f = e.shape[-1]
    ep, pix, p, tile_f = _pad_inputs(e, image_size, tile_p, tile_f,
                                     inv_sigma)
    # padded pixel rows carry zero upstream grad -> zero contribution
    g = jnp.pad(g, (0, pix.shape[0] - p))
    grid = (pix.shape[0] // tile_p,)
    fp = ep.shape[-1]
    boxes = _chunk_boxes(ep, tile_f)
    de = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_f=tile_f,
                          image_size=image_size, inv_sigma=inv_sigma),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 8), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(boxes.shape, lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((8, fp), jnp.float32)] * 3,
    )(pix, ep[0], ep[1], ep[2], g[:, None].astype(jnp.float32), boxes)
    return jnp.stack([d[:, :f] for d in de], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def coverage_sums(e, image_size, inv_sigma):
    """Raw per-pixel coverage sums sum_f sigmoid(min(min_e d_ef, d_box))
    from edge coefficients e (3 edges, 8 rows [A;B;C;xmin;xmax;ymin;ymax;
    pad] -- the AABB rows live in block 0 only, F faces)."""
    return _coverage_fwd_call(e, image_size, inv_sigma)


def _cov_fwd(e, image_size, inv_sigma):
    return _coverage_fwd_call(e, image_size, inv_sigma), e


def _cov_bwd(image_size, inv_sigma, e, g):
    return (_coverage_bwd_call(e, g, image_size, inv_sigma),)


coverage_sums.defvjp(_cov_fwd, _cov_bwd)


def edge_coeffs(verts_ndc_one, faces, sigma):
    """Differentiable per-face edge coefficients for one example.

    verts_ndc_one: (V, 3) projected vertices. faces: (F, 3). Returns
    (3, 8, F): rows 0..2 of dim 1 are A, B, C of d_e(p) = A px + B py + C,
    scaled by 1/sigma and orientation-normalized; degenerate or
    behind-camera faces carry C = -1e9 (zero coverage, zero gradient).
    Same math as ops/rasterizer._signed_distance.
    """
    tri = verts_ndc_one[faces]  # (F, 3, 3)
    xy = tri[..., :2]
    a, b, c = xy[:, 0], xy[:, 1], xy[:, 2]

    area2 = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
             - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    sign = jnp.where(area2 > 0, 1.0, -1.0)
    ok = (jnp.abs(area2) >= 1e-12) & jnp.all(tri[..., 2] > 0.0, axis=-1)

    def edge(p0, p1):
        d = p1 - p0  # (F, 2)
        ln = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        s = sign / (ln * sigma)
        # d_e(p) = (dx*(py - p0y) - dy*(px - p0x)) / len * sign / sigma
        A = -d[:, 1] * s
        B = d[:, 0] * s
        C = (d[:, 1] * p0[:, 0] - d[:, 0] * p0[:, 1]) * s
        C = jnp.where(ok, C, -1e9)
        A = jnp.where(ok, A, 0.0)
        B = jnp.where(ok, B, 0.0)
        return jnp.stack([A, B, C], axis=0)  # (3, F)

    e = jnp.stack([edge(a, b), edge(b, c), edge(c, a)], axis=0)  # (3, 3, F)
    f = faces.shape[0]
    # block-0 rows 3..6: the face AABB scaled by 1/sigma, for the in-kernel
    # cap on the edge-line min (see _box_d / rasterizer._signed_distance).
    # Differentiable: jnp.min/max route the gradient to the extreme vertex.
    inv_sigma = 1.0 / sigma
    box = jnp.stack([
        jnp.min(xy[..., 0], axis=1), jnp.max(xy[..., 0], axis=1),
        jnp.min(xy[..., 1], axis=1), jnp.max(xy[..., 1], axis=1),
    ], axis=0) * inv_sigma  # (4, F)
    pad0 = jnp.concatenate([box, jnp.zeros((1, f), e.dtype)], axis=0)
    pad12 = jnp.zeros((2, 5, f), e.dtype)
    pad = jnp.concatenate([pad0[None], pad12], axis=0)  # (3, 5, F)
    return jnp.concatenate([e, pad], axis=1)  # (3, 8, F)


def soft_silhouette_pallas(verts_ndc, faces, image_size=256, sigma=None):
    """Drop-in TPU path for ops.rasterizer.soft_silhouette: (B, S, S)
    clipped coverage, differentiable w.r.t. verts_ndc through the custom
    VJP + XLA autodiff of the coefficient construction."""
    if sigma is None:
        sigma = 0.5 * (2.0 / image_size)

    def one(v):
        e = edge_coeffs(v, faces, sigma)
        raw = coverage_sums(e, image_size, 1.0 / sigma)
        return jnp.clip(raw, 0.0, 1.0).reshape(image_size, image_size)

    return jax.vmap(one)(verts_ndc)
