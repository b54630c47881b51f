"""Chamfer / nearest-neighbor distances, tiled for TPU.

Replaces three native components of the reference:
  * the sklearn KD-tree evaluation chamfer (reference:
    recon/eval/chamfer_distance.py:10-52 -- sqrt distance, sum of the two
    directional means),
  * pytorch3d's CUDA ``chamfer_distance``/``knn_points`` used by the contact
    loss (reference: recon/recon_fit_base.py:553-608,
    lib_smpl/torch_functions.py:18-92 -- squared distance),
  * nearest-vertex label transfer in preprocessing (reference:
    preprocess/boundary_sampler.py:58-64).

KD-trees are hostile to TPUs (irregular memory access); brute-force tiled
distance matrices map straight onto the MXU via the ||x||^2 - 2<x,y> + ||y||^2
expansion and win at these sizes (10k-50k points).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10


def _pairwise_sqdist(x, y):
    """(N, 3) x (M, 3) -> (N, M) squared distances via the MXU-friendly
    expansion; clamped at 0 to absorb cancellation error."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)
    # HIGHEST precision: bf16 matmul passes put a ~1e-2 floor on distances.
    d = xx - 2.0 * jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST) + yy.T
    return jnp.maximum(d, 0.0)


def _use_pallas():
    """Fused Pallas NN kernel on TPU only (Mosaic lowering; the tiled XLA
    path serves CPU/GPU)."""
    return jax.default_backend() == "tpu"


def nn_sqdist(x, y, y_mask=None, x_group=None, y_group=None, tile=2048):
    """Per-point (optionally grouped) nearest-neighbor sq distance + index.

    Args:
      x: (N, 3) query points.
      y: (M, 3) reference points.
      y_mask: optional (M,) bool; masked-out reference points are ignored.
      x_group / y_group: optional int group ids; a query only matches
        reference points of its own group (one kernel pass batches many
        independent NN problems: per-example, per-part, ...).
      tile: query tile size (memory bound: tile * M floats).

    Returns:
      (sqdist (N,), index (N,)) of the nearest valid same-group reference
      point; the 1e10 sentinel (index meaningless) when none exists.

    On TPU this runs the fused single-pass Pallas kernel (ops/pallas/nn.py)
    instead of materializing the (N, M) matrix.
    """
    if _use_pallas():
        # exact-grad wrapper: the kernel (no autodiff rule) runs outside the
        # differentiated subgraph; distance is re-expressed vs the argmin so
        # gradients match the XLA path's min-distance subgradients
        from chore_tpu.ops.pallas.nn import nn_sqdist_exact_grad

        return nn_sqdist_exact_grad(x, y, y_mask=y_mask,
                                    x_group=x_group, y_group=y_group)
    return _nn_sqdist_xla(x, y, y_mask=y_mask, x_group=x_group,
                          y_group=y_group, tile=tile)


@functools.partial(jax.jit, static_argnames=("tile",))
def _nn_sqdist_xla(x, y, y_mask=None, x_group=None, y_group=None, tile=2048):
    n, m = x.shape[0], y.shape[0]
    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xt = xp.reshape(-1, tile, 3)
    # fold mask + groups into one reference-group row (-1 = invalid)
    rg = (jnp.zeros(m, jnp.float32) if y_group is None
          else jnp.asarray(y_group, jnp.float32))
    if y_mask is not None:
        rg = jnp.where(jnp.asarray(y_mask, bool), rg, -1.0)
    qg = (jnp.zeros(n, jnp.float32) if x_group is None
          else jnp.asarray(x_group, jnp.float32))
    qg = jnp.pad(qg, (0, pad)).reshape(-1, tile)

    def one_tile(args):
        xb, qgb = args
        d = _pairwise_sqdist(xb, y)
        d = jnp.where(qgb[:, None] == rg[None, :], d, _BIG)
        return jnp.min(d, axis=1), jnp.argmin(d, axis=1)

    dmin, idx = jax.lax.map(one_tile, (xt, qg))
    return dmin.reshape(-1)[:n], idx.reshape(-1)[:n]


def chamfer_eval(x, y, tile=2048):
    """Evaluation-protocol chamfer: mean_x min_y ||x-y|| + mean_y min_x ||x-y||.

    Square-root distances, directional means summed -- matching the reference
    evaluator exactly (recon/eval/chamfer_distance.py:45-50, direction='bi').
    """
    dx, _ = nn_sqdist(x, y, tile=tile)
    dy, _ = nn_sqdist(y, x, tile=tile)
    return jnp.mean(jnp.sqrt(dx)) + jnp.mean(jnp.sqrt(dy))


def masked_chamfer_sq(x, y, x_mask, y_mask):
    """pytorch3d-style masked squared chamfer for a single cloud pair.

    mean over valid x of min_y sqdist + mean over valid y of min_x sqdist,
    where invalid points neither query nor serve as targets. Returns 0 when
    either side is empty (matching the reference skipping empty part pairs,
    recon_fit_base.py:591-601).
    """
    d = _pairwise_sqdist(x, y)
    d_xy = jnp.where(y_mask[None, :], d, _BIG)
    d_yx = jnp.where(x_mask[:, None], d, _BIG)
    nx = jnp.sum(x_mask)
    ny = jnp.sum(y_mask)
    valid = (nx > 0) & (ny > 0)
    min_xy = jnp.min(d_xy, axis=1)
    min_yx = jnp.min(d_yx, axis=0)
    loss_x = jnp.sum(jnp.where(x_mask, min_xy, 0.0)) / jnp.maximum(nx, 1)
    loss_y = jnp.sum(jnp.where(y_mask, min_yx, 0.0)) / jnp.maximum(ny, 1)
    return jnp.where(valid, loss_x + loss_y, 0.0)
