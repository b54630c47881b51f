"""End-to-end ReconFitter.fit_batch on a tiny model (CPU).

Exercises the full flagship path — encode, surface sampling, the jitted
SMPL phase chain, silhouette ROI prep, the jitted object phase chain —
on synthetic inputs. Catches trace/shape bugs in the per-instance jitted
stage functions without needing trained weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.models import CHOREField, FieldConfig
from chore_tpu.recon.fitter import FitConfig, ReconFitter
from chore_tpu.recon.generator import SamplerConfig
from chore_tpu.smpl import SMPLH, synthetic_smplh
from chore_tpu.utils.meshio import octasphere

TINY = FieldConfig(num_stack=1, num_hourglass=1, net_img_size=64)
FIT = FitConfig(iter_betas=1, iter_pose=1, iter_kpts_max=2, iter_obj=1,
                iter_sil=1, iter_joint_max=2, steps_per_iter=2,
                obj_samples=128, net_in_size=64, sil_rend_size=32)
SAMP = SamplerConfig(num_steps=2, sample_num=256, num_rounds=2,
                     num_points=128)


@pytest.fixture(scope="module")
def fitter():
    model = CHOREField(cfg=TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
    )
    smplh = SMPLH(synthetic_smplh())
    tv, tf = octasphere(radius=0.15, subdiv=2)
    return ReconFitter(model, params, smplh, tv, tf, cfg=FIT,
                       sampler_cfg=SAMP)


def _batch(B=1):
    rng = np.random.RandomState(0)
    mask = np.zeros((B, 64, 64), np.float32)
    mask[:, 20:40, 25:45] = 1.0
    images = np.concatenate(
        [rng.rand(B, 64, 64, 3).astype(np.float32),
         mask[..., None], mask[..., None]], axis=-1,
    )
    cc = np.tile([[1018.0, 779.0]], (B, 1)).astype(np.float32)
    poses = np.zeros((B, 72), np.float32)
    betas = np.zeros((B, 10), np.float32)
    kpts = np.concatenate(
        [rng.rand(B, 25, 2).astype(np.float32) * 64,
         np.ones((B, 25, 1), np.float32)], axis=-1,
    )
    return images, cc, poses, betas, kpts


class TestFitBatch:
    @pytest.mark.slow  # ~2 min compile+run; the no-sil path below
    # plus the driver bench cover the fit per commit
    def test_full_pipeline(self, fitter):
        images, cc, poses, betas, kpts = _batch()
        result = fitter.fit_batch(images, cc, poses, betas, kpts,
                                  use_silhouette=True)
        sp = result["smpl_params"]
        assert sp["trans"].shape == (1, 3)
        assert np.isfinite(np.asarray(sp["trans"])).all()
        op = result["obj_params"]
        assert np.isfinite(np.asarray(op["obj_t"])).all()
        R = np.asarray(result["obj_R"])[0]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert np.isfinite(float(np.asarray(result["scale"])[0]))
        # verts come out usable for output saving
        verts = np.asarray(fitter.smplh.verts(sp))
        assert verts.shape[1:] == (6890, 3)
        obj_verts = np.asarray(
            fitter.transform_obj(op, points=fitter.template_verts)
        )
        assert np.isfinite(obj_verts).all()
        # phase timing collected
        summary = fitter.timer.summary()
        assert "optimize_smpl" in summary and "optimize_object" in summary

    def test_no_silhouette_path(self, fitter):
        images, cc, poses, betas, kpts = _batch()
        result = fitter.fit_batch(images, cc, poses, betas, kpts,
                                  use_silhouette=False)
        assert np.isfinite(np.asarray(result["obj_params"]["obj_t"])).all()

    def test_second_call_reuses_compilation(self, fitter):
        """Same shapes on a second frame must not retrace the stage jits."""
        images, cc, poses, betas, kpts = _batch()
        fitter.fit_batch(images, cc, poses, betas, kpts, use_silhouette=False)
        before = fitter._jit_fit_smpl._cache_size()
        fitter.fit_batch(images + 0.01, cc, poses, betas, kpts,
                         use_silhouette=False)
        assert fitter._jit_fit_smpl._cache_size() == before


@pytest.mark.slow  # compiles the whole-fit jit (~2 min)
class TestFusedPipeline:
    def test_fused_matches_staged(self, fitter):
        """cfg.fused_pipeline folds the five stage dispatches into one jit;
        the math and the PRNG key splits are identical, so results must
        match the staged path to trace-recompilation tolerance."""
        import dataclasses

        images, cc, poses, betas, kpts = _batch()
        key = jax.random.PRNGKey(7)
        r_staged = fitter.fit_batch(images, cc, poses, betas, kpts, key=key,
                                    use_silhouette=True)
        fused = ReconFitter(
            fitter.model, fitter.params, fitter.smplh,
            fitter.template_verts, fitter.template_faces,
            cfg=dataclasses.replace(FIT, fused_pipeline=True),
            sampler_cfg=SAMP)
        r_fused = fused.fit_batch(images, cc, poses, betas, kpts, key=key,
                                  use_silhouette=True)
        assert "fit_fused" in fused.timer.summary()
        for k in ("trans", "global_pose"):
            np.testing.assert_allclose(
                np.asarray(r_staged["smpl_params"][k]),
                np.asarray(r_fused["smpl_params"][k]), atol=1e-5)
        # the object stage is NOT float-identical: the fused program fuses
        # differently, and a 1-ulp df difference flips the generator's
        # argsort compaction -> different selected points -> the object
        # init/means shift at the mm level (measured ~8 mm here). The
        # tolerance below catches wiring bugs (wrong key / swapped
        # human-object clouds / missing sil data move obj_t by >> 5 cm)
        # while allowing that chaotic amplification.
        np.testing.assert_allclose(
            np.asarray(r_staged["obj_params"]["obj_t"]),
            np.asarray(r_fused["obj_params"]["obj_t"]), atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(r_staged["obj_params"]["obj_s"]),
            np.asarray(r_fused["obj_params"]["obj_s"]), atol=1e-2)
        assert np.isfinite(np.asarray(r_fused["obj_R"])).all()
        assert (np.asarray(r_fused["pclouds"]["object"]["points"]).shape
                == np.asarray(r_staged["pclouds"]["object"]["points"]).shape)

    def test_fused_no_silhouette(self, fitter):
        import dataclasses

        images, cc, poses, betas, kpts = _batch()
        fused = ReconFitter(
            fitter.model, fitter.params, fitter.smplh,
            fitter.template_verts, fitter.template_faces,
            cfg=dataclasses.replace(FIT, fused_pipeline=True),
            sampler_cfg=SAMP)
        r = fused.fit_batch(images, cc, poses, betas, kpts,
                            use_silhouette=False)
        assert np.isfinite(np.asarray(r["obj_params"]["obj_t"])).all()


@pytest.mark.slow  # 8-device mesh fit (~3.5 min)
class TestShardedFit:
    def test_mesh_sharded_matches_single(self):
        """B=8 frames sharded over the 8-device mesh must reproduce the
        unsharded result (same math, XLA inserts the batch reductions)."""
        import jax
        from chore_tpu.parallel import make_mesh

        model = CHOREField(cfg=TINY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
        )
        smplh = SMPLH(synthetic_smplh())
        tv, tf = octasphere(radius=0.15, subdiv=2)
        fit_plain = ReconFitter(model, params, smplh, tv, tf, cfg=FIT,
                                sampler_cfg=SAMP)
        fit_shard = ReconFitter(model, params, smplh, tv, tf, cfg=FIT,
                                sampler_cfg=SAMP, mesh=make_mesh())

        images, cc, poses, betas, kpts = _batch(B=8)
        key = jax.random.PRNGKey(3)
        r1 = fit_plain.fit_batch(images, cc, poses, betas, kpts, key=key,
                                 use_silhouette=False)
        r2 = fit_shard.fit_batch(images, cc, poses, betas, kpts, key=key,
                                 use_silhouette=False)
        np.testing.assert_allclose(
            np.asarray(r1["smpl_params"]["trans"]),
            np.asarray(r2["smpl_params"]["trans"]), atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(r1["obj_params"]["obj_t"]),
            np.asarray(r2["obj_params"]["obj_t"]), atol=1e-3,
        )
