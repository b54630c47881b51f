"""Surface-projection sampler tests against analytic fields (a sphere UDF
gives an exact oracle for where projected points must land)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.recon import SamplerConfig, init_box_samples, make_surface_sampler

CENTER = jnp.array([0.1, -0.2, 2.2])
RADIUS = 0.4


def sphere_query_fn(points):
    """Analytic field: human df = sphere UDF, object df = offset sphere."""
    d1 = jnp.abs(jnp.linalg.norm(points - CENTER, axis=-1) - RADIUS)
    c2 = CENTER + jnp.array([0.5, 0.0, 0.0])
    d2 = jnp.abs(jnp.linalg.norm(points - c2, axis=-1) - 0.2)
    n = points.shape[:-1]
    parts = jnp.zeros(n + (14,)).at[..., 3].set(1.0)
    pca = jnp.broadcast_to(jnp.eye(3), n + (3, 3))
    centers = jnp.broadcast_to(
        jnp.concatenate([CENTER, jnp.array([0.5, 0.0, 0.0])]), n + (6,)
    )
    return {
        "df": jnp.stack([d1, d2], axis=-1),
        "parts": parts,
        "pca": pca,
        "centers": centers,
    }


CFG = SamplerConfig(num_steps=8, sample_num=2048, num_rounds=4,
                    num_points=1024)


class TestInitBox:
    def test_bounds_all_batch_rows(self):
        # the reference only scaled row 0 (generator.py:275-282); we fixed it
        s = init_box_samples(jax.random.PRNGKey(0), 3, 1000)
        s = np.asarray(s)
        for b in range(3):
            assert s[b, :, 0].min() < -2 and s[b, :, 0].max() > 2
            assert 1.95 <= s[b, :, 2].min() and s[b, :, 2].max() <= 2.45


class TestSurfaceSampler:
    @pytest.fixture(scope="class")
    def result(self):
        sampler = make_surface_sampler(sphere_query_fn, CFG)
        f = jax.jit(sampler, static_argnums=(1, 2))
        return f(jax.random.PRNGKey(0), 0, 2)

    def test_points_on_sphere(self, result):
        pts = np.asarray(result["points"])
        valid = np.asarray(result["valid"])
        r = np.linalg.norm(pts - np.asarray(CENTER), axis=-1)
        err = np.abs(r - RADIUS)[valid]
        assert err.mean() < CFG.filter_val
        assert np.median(err) < CFG.filter_val

    def test_enough_valid_points(self, result):
        n_valid = np.asarray(result["n_valid"])
        assert (n_valid == CFG.num_points).all()

    def test_aggregates(self, result):
        assert np.allclose(np.asarray(result["pca_axis"]),
                           np.eye(3)[None], atol=1e-4)
        assert np.allclose(np.asarray(result["centers"])[:, :3],
                           np.asarray(CENTER)[None], atol=1e-4)
        assert (np.asarray(result["parts"]) == 3).all()

    def test_object_field_selects_other_sphere(self):
        sampler = make_surface_sampler(sphere_query_fn, CFG)
        out = jax.jit(sampler, static_argnums=(1, 2))(jax.random.PRNGKey(1), 1, 1)
        pts = np.asarray(out["points"])[np.asarray(out["valid"])]
        c2 = np.asarray(CENTER) + [0.5, 0, 0]
        r = np.linalg.norm(pts - c2, axis=-1)
        assert np.abs(r - 0.2).mean() < CFG.filter_val


class TestLowDfFallback:
    def test_impossible_threshold_still_lands_near_surface(self):
        """With a filter_val no point can pass, selection must fall back to
        the lowest-df points (near the surface) and finite masked means."""
        def biased_query_fn(points):
            # like a trained-but-imperfect net: df has a +1cm floor, so
            # no point can ever beat the release filter_val
            preds = sphere_query_fn(points)
            return dict(preds, df=preds["df"] + 0.01)

        cfg = SamplerConfig(num_steps=8, sample_num=1024, num_rounds=3,
                            num_points=256, filter_val=0.004)
        sampler = make_surface_sampler(biased_query_fn, cfg)
        out = sampler(jax.random.PRNGKey(0), 0, 2)
        assert int(out["n_valid"].sum()) == 0
        d = np.abs(
            np.linalg.norm(np.asarray(out["points"]) - np.asarray(CENTER),
                           axis=-1) - RADIUS
        )
        # fallback points are the best available: still close to the sphere
        assert d.mean() < 0.02
        assert np.isfinite(np.asarray(out["centers"])).all()
        # centers mean uses the fallback weights, not zeros
        np.testing.assert_allclose(
            np.asarray(out["centers"])[:, :3],
            np.broadcast_to(np.asarray(CENTER), (2, 3)), rtol=0, atol=1e-3,
        )
