"""Neural-field -> dense point cloud via iterative surface projection.

TPU-native rewrite of the reference Generator (reference:
recon/generator.py:17-282). The reference loops "until >= num_points
survivors" with ragged python-side harvesting; here the whole sampler is one
jitted computation with static shapes:

  * ``approx_surface``: Alg. 1 of the paper -- x <- x - normalize(grad) * df
    for num_steps, where grad = d(sum clamp(df))/dx via jax.grad through the
    frozen field (reference: generator.py:50-79 does the same with
    torch backward).
  * a fixed number of resampling rounds replaces the while-loop: each round
    projects 20k points, records survivors (df < filter_val), and resamples
    survivors + Gaussian noise for the next round (reference:
    generator.py:123-188).
  * the harvest (rounds 1..R-1, like the reference which skips round 0)
    is compacted by a stable argsort putting valid points first in
    round-then-index order, matching the reference's "first samples_count
    points" selection (generator.py:200-217).

Deviation from the reference (bug fix): init_samples only rescaled batch row
0 into the scene box, leaving rows 1+ in [0,1)^3 (generator.py:275-282); we
scale every row.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    threshold: float = 2.0  # df clamp during projection (recon_fit_behave.py:35)
    filter_val: float = 0.004  # surface acceptance (chore-release.json filter_val)
    num_steps: int = 10  # projection steps per round
    sample_num: int = 20000  # live samples per round (generator.py:144)
    num_rounds: int = 6  # total rounds; rounds 1.. harvest
    num_points: int = 5000  # output points per target (recon_fit_behave.py:46)
    # the reference draws 30k initial box samples then caps the live set
    # at sample_num (generator.py:275-282,144); the fixed-capacity rewrite
    # draws sample_num directly, so no separate init_num knob exists


def init_box_samples(key, batch_size, n):
    """Uniform samples in the scene box x[-3,3], y[-2.5,2.5], z[1.95,2.45]
    around the fixed SMPL depth (reference: generator.py:275-282)."""
    u = jax.random.uniform(key, (batch_size, n, 3))
    lo = jnp.array([-3.0, -2.5, 1.95])
    hi = jnp.array([3.0, 2.5, 2.45])
    return lo + u * (hi - lo)


def make_surface_sampler(query_fn, cfg: SamplerConfig = SamplerConfig()):
    """Build the jitted sampler.

    Args:
      query_fn: (points (B,N,3)) -> head dict with 'df' (B,N,2), 'parts'
        (B,N,14), 'pca' (B,N,3,3), 'centers' (B,N,6). Should close over the
        encoded image features (encode once, query many).
      cfg: sampler config.

    Returns:
      sample(key, df_idx) -> dict with points (B,P,3), parts (B,P),
      pca_axis (B,3,3), centers (B,6), valid (B,P) bool, n_valid (B,).
    """

    def df_of(points, df_idx):
        return query_fn(points)["df"][..., df_idx]

    def approx_surface(points, df_idx):
        def step(i, pts):
            def clamped_sum(p):
                df = jnp.clip(df_of(p, df_idx), max=cfg.threshold)
                return df.sum(), df  # aux: per-point df from the same pass

            (_, dfv), grad = jax.value_and_grad(
                clamped_sum, has_aux=True
            )(pts)
            gnorm = grad / (
                jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-12
            )
            return pts - gnorm * dfv[..., None]

        return jax.lax.fori_loop(0, cfg.num_steps, step, points)

    def sample(key, df_idx, batch_size):
        k_init, k_loop = jax.random.split(key)
        # the fixed-capacity rewrite only ever consumes sample_num live
        # points (round 0 and the fallback re-draw both), so drawing the
        # reference's larger init_num (generator.py:275-282 draws 30k then
        # caps the live set) would be dead work — generate exactly what is
        # used
        init = init_box_samples(k_init, batch_size, cfg.sample_num)
        live = init

        n_harvest = cfg.num_rounds - 1

        def round_body(carry, k):
            live, _ = carry
            surf = approx_surface(live, df_idx)
            preds = query_fn(surf)
            dfv = preds["df"][..., df_idx]
            mask = dfv < cfg.filter_val  # (B, S)

            # resample: survivors + noise, or re-draw from init if none
            k1, k2, k3 = jax.random.split(k, 3)
            any_valid = mask.any(axis=1)  # (B,)
            # uniform-with-replacement over survivors via cumsum +
            # searchsorted: the r-th survivor for r ~ U{1..n_valid}.
            # Distributionally identical to categorical over uniform
            # survivor logits, but O(S log S) instead of the (draws x
            # classes) Gumbel-argmax materialization (measured 118 ms of
            # the 1.2 s fit as an iota_reduce fusion at 20k x 20k).
            csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # (B, S)
            n_valid = csum[:, -1:]  # (B, 1)
            u = jax.random.uniform(k1, (batch_size, cfg.sample_num))
            r = jnp.floor(u * n_valid).astype(jnp.int32) + 1  # in {1..n}
            idx = jax.vmap(
                lambda c, q: jnp.searchsorted(c, q, side="left")
            )(csum, r)  # (B, sample_num)
            # n_valid == 0 -> r=1 lands past the end; clamp (the fallback
            # branch below discards these rows anyway)
            idx = jnp.minimum(idx, mask.shape[1] - 1)
            picked = jnp.take_along_axis(surf, idx[..., None], axis=1)
            picked = picked + (cfg.threshold / 3.0) * jax.random.normal(
                k2, picked.shape
            )
            # fallback: fresh box samples + wide noise (generator.py:173-176)
            fresh = init + 0.5 * jax.random.normal(
                k3, (batch_size, cfg.sample_num, 3)
            )
            new_live = jnp.where(any_valid[:, None, None], picked, fresh)

            out = {
                "points": surf,
                "mask": mask,
                "df": dfv,
                "parts": preds["parts"],
                "pca": preds["pca"],
                "centers": preds["centers"],
            }
            return (new_live, 0), out

        keys = jax.random.split(k_loop, cfg.num_rounds)
        (_, _), rounds = jax.lax.scan(round_body, (live, 0), keys)
        # harvest rounds 1.. (the reference skips the first projection round)
        harvest = jax.tree_util.tree_map(lambda x: x[1:], rounds)

        # flatten (R, B, S, ...) -> (B, R*S, ...) preserving round order
        def flat(x):
            x = jnp.moveaxis(x, 0, 1)  # (B, R, S, ...)
            return x.reshape(batch_size, n_harvest * cfg.sample_num, *x.shape[3:])

        pts = flat(harvest["points"])
        mask = flat(harvest["mask"])
        dfs = flat(harvest["df"])
        parts = flat(harvest["parts"])
        pca = flat(harvest["pca"])
        centers = flat(harvest["centers"])

        # stable compaction: valid points first in round-then-index order
        # (reference "first samples_count" semantics); the remainder sorted
        # by df so that an under-trained/hard frame with few survivors
        # still yields the closest-to-surface points instead of noise
        M = mask.shape[1]
        df_rank = jnp.argsort(jnp.argsort(dfs, axis=1), axis=1)
        order_key = jnp.where(
            mask, jnp.arange(M)[None, :], M + df_rank
        )
        order = jnp.argsort(order_key, axis=1)[:, : cfg.num_points]  # (B, P)

        take = lambda x: jnp.take_along_axis(
            x, order.reshape(batch_size, -1, *([1] * (x.ndim - 2))), axis=1
        )
        sel_pts = take(pts)
        sel_valid = jnp.take_along_axis(mask, order, axis=1)
        sel_parts = jnp.argmax(take(parts), axis=-1)
        sel_pca = take(pca)
        sel_centers = take(centers)

        vw = sel_valid.astype(jnp.float32)[..., None]
        # no survivors at all -> average over the selected (lowest-df)
        # points rather than returning zeros
        any_valid = sel_valid.any(axis=1)[:, None, None]
        vw = jnp.where(any_valid, vw, 1.0)
        denom = jnp.maximum(vw.sum(axis=1), 1.0)
        mean_centers = (sel_centers * vw).sum(axis=1) / denom
        mean_pca = (sel_pca * vw[..., None]).sum(axis=1) / denom[..., None]

        return {
            "points": sel_pts,
            "parts": sel_parts,
            "pca_axis": mean_pca,
            "centers": mean_centers,
            "valid": sel_valid,
            "n_valid": sel_valid.sum(axis=1),
        }

    return sample


class Generator:
    """Encode an image batch once, then generate human and object point
    clouds (reference: generator.py:102-121).

    Both the encoder and the sampler are per-instance jitted PURE functions
    taking params/features as explicit arguments -- nothing per-frame is
    closed over, so each compiles exactly once and is reused across every
    frame of a sequence (the reference re-dispatches per frame)."""

    def __init__(self, model, params, cfg: SamplerConfig = SamplerConfig()):
        self.model = model
        self.params = params
        self.cfg = cfg

        def encode(params, images):
            return model.apply(params, images, train=False, method="encode")

        def sample(params, feats, tmpx, crop_center, key, df_idx):
            def query_fn(points):
                # frozen net: grads flow only to the points (approx_surface
                # projection) -- the corner-saving sampler skips all
                # backward feature re-gathers
                preds = model.apply(
                    params, feats, tmpx, points, crop_center,
                    frozen_features=True, method="query"
                )
                return preds[-1]

            sampler = make_surface_sampler(query_fn, cfg)
            return sampler(key, df_idx, tmpx.shape[0])

        self._encode = jax.jit(encode)
        self._sample = jax.jit(sample, static_argnums=(5,))
        # unjitted pure fns, for callers that trace the sampler INSIDE a
        # larger jit (the fitter's fused whole-fit program)
        self.encode_pure = encode
        self.sample_pure = sample

    def encode(self, images):
        return self._encode(self.params, jnp.asarray(images))

    def sample_from_feats(self, feats, tmpx, crop_center, key, df_idx):
        return self._sample(self.params, feats, tmpx, crop_center, key,
                            df_idx)

    def generate_pclouds(self, images, crop_center, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        feats, tmpx = self.encode(images)
        return self.generate_from_feats(feats, tmpx, crop_center, key)

    def generate_from_feats(self, feats, tmpx, crop_center, key):
        kh, ko = jax.random.split(key)
        return {
            "human": self.sample_from_feats(feats, tmpx, crop_center, kh, 0),
            "object": self.sample_from_feats(feats, tmpx, crop_center, ko, 1),
        }
