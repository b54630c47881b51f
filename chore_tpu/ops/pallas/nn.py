"""Pallas TPU kernel: fused grouped 1-nearest-neighbor (min dist + argmin).

Replaces the XLA path that materializes the full (N, M) distance matrix in
HBM (2 passes over up to 400 MB at eval sizes) with a single-pass kernel:
the reference cloud lives entirely in VMEM (10k pts = 120 KB), the query
cloud streams through in tiles, and each (TILE_N, TILE_M) distance block is
produced by ONE MXU matmul via the augmented-coordinate trick

    a = [x, |x|^2, 1]      b = [-2y, 1, |y|^2]      a . b = |x - y|^2

then immediately min/argmin-reduced in VMEM. HBM traffic drops from
O(N*M) to O(N + M).

Grouping: every point carries an int group id; a query only matches
reference points of ITS OWN group (others read as +inf). Masked-out
reference points get group -1, which no query ever carries. This folds
three distinct reference patterns into ONE kernel launch:

  * batching -- group = example index (replacing a per-example kernel loop),
  * per-part contact pairing -- group = example * 14 + part label
    (replacing the dense (6890, No) matrix of the torch contact loss,
    reference: recon/recon_fit_base.py:553-608),
  * validity masks -- group -1.

Group ids are compared as f32 (exact for ids < 2^24); the distances stay
purely spatial, so no precision is lost to offset-coordinate tricks.

Used (through ops.chamfer.nn_sqdist) by the contact loss, the collision
loss, the evaluation chamfer and nearest-vertex label transfer -- the
TPU-native equivalent of pytorch3d's knn_points CUDA kernel
(reference: lib_smpl/torch_functions.py:18-92).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10  # python float: jnp constants cannot be captured by kernels


def _nn_kernel(a_ref, b_ref, qg_ref, rg_ref, d_ref, i_ref, *, tile_m):
    """One query tile vs the whole reference cloud.

    a_ref: (TILE_N, 8) augmented queries. b_ref: (8, Mp) augmented refs
    (column-major for the matmul). qg_ref: (TILE_N, 1) query group ids.
    rg_ref: (1, Mp) reference group ids (-1 = invalid/padded).
    d_ref/i_ref: (TILE_N, 1) outputs.
    """
    n_chunks = b_ref.shape[1] // tile_m
    tile_n = a_ref.shape[0]
    a = a_ref[:]  # (TILE_N, 8)
    qg = qg_ref[:]  # (TILE_N, 1)

    def chunk(j, carry):
        best_d, best_i = carry
        b = b_ref[:, pl.ds(j * tile_m, tile_m)]  # (8, TILE_M)
        rg = rg_ref[:, pl.ds(j * tile_m, tile_m)]  # (1, TILE_M)
        # HIGHEST: the default f32 "matmul" is a single bf16 pass whose
        # input truncation injects ~0.1 absolute error into the
        # |x|^2 - 2<x,y> + |y|^2 cancellation
        d = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TILE_N, TILE_M)
        d = jnp.maximum(d, 0.0)
        d = jnp.where(qg == rg, d, _BIG)  # broadcast group match
        dmin = jnp.min(d, axis=1, keepdims=True)  # (TILE_N, 1)
        col = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]
        imin = col + j * tile_m
        take = dmin < best_d
        return jnp.where(take, dmin, best_d), jnp.where(take, imin, best_i)

    best_d = jnp.full((tile_n, 1), _BIG, jnp.float32)
    best_i = jnp.zeros((tile_n, 1), jnp.int32)
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, chunk, (best_d, best_i))
    d_ref[:] = best_d
    i_ref[:] = best_i


def _augment(x, is_ref):
    """(P, 3) -> (P, 8) augmented coords (zero-padded to the 8-sublane f32
    tile)."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    one = jnp.ones_like(sq)
    zeros = jnp.zeros((x.shape[0], 3), x.dtype)
    if is_ref:
        return jnp.concatenate([-2.0 * x, one, sq, zeros], axis=-1)
    return jnp.concatenate([x, sq, one, zeros], axis=-1)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m"))
def nn_pallas(x, y, y_mask=None, x_group=None, y_group=None,
              tile_n=512, tile_m=1024):
    """(min_sqdist (N,), argmin (N,)) of each x point vs its group's y points.

    Runs the fused Pallas kernel; y (and its group row) must fit VMEM
    (M up to ~200k points). Indices are exact; distances are clamped >= 0.
    Queries with no valid same-group reference return the _BIG sentinel.
    """
    n, m = x.shape[0], y.shape[0]
    npad = (-n) % tile_n
    mpad = (-m) % tile_m
    a = _augment(jnp.asarray(x, jnp.float32), is_ref=False)
    b = _augment(jnp.asarray(y, jnp.float32), is_ref=True)
    a = jnp.pad(a, ((0, npad), (0, 0)))
    bt = jnp.pad(b, ((0, mpad), (0, 0))).T  # (8, Mp)

    qg = (jnp.zeros(n, jnp.float32) if x_group is None
          else jnp.asarray(x_group, jnp.float32))
    rg = (jnp.zeros(m, jnp.float32) if y_group is None
          else jnp.asarray(y_group, jnp.float32))
    if y_mask is not None:
        rg = jnp.where(jnp.asarray(y_mask, bool), rg, -1.0)
    qg = jnp.pad(qg, (0, npad))[:, None]  # (Np, 1)
    rg = jnp.pad(rg, (0, mpad), constant_values=-1.0)[None, :]  # (1, Mp)

    np_, mp_ = a.shape[0], bt.shape[1]
    grid = (np_ // tile_n,)
    d, i = pl.pallas_call(
        functools.partial(_nn_kernel, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 8), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, mp_), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp_), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ],
    )(a, bt, qg, rg)
    return d[:n, 0], i[:n, 0]


def nn_sqdist_exact_grad(x, y, y_mask=None, x_group=None, y_group=None):
    """Differentiable nearest-neighbor squared distance via the kernel.

    The argmin index is computed by the (non-differentiable) Pallas kernel;
    the distance is then re-expressed as |x - y[idx]|^2 so autodiff produces
    the exact min-distance gradients w.r.t. both clouds (the same
    subgradient convention as pytorch3d's knn backward). Queries whose group
    has no valid reference keep the _BIG sentinel (zero gradient).
    """
    # stop_gradient on the INPUTS: pallas_call has no autodiff rule, so the
    # kernel must sit entirely outside the differentiated subgraph
    d_kern, idx = nn_pallas(
        jax.lax.stop_gradient(x), jax.lax.stop_gradient(y),
        y_mask, x_group, y_group,
    )
    d = jnp.sum((x - y[idx]) ** 2, axis=-1)
    # unmatched queries (all-masked / empty group): keep the sentinel
    # instead of a phantom distance to y[0]
    return jnp.where(d_kern >= 0.5 * _BIG, _BIG, d), idx
