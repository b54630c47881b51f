"""Fused Pallas 1-NN kernel tests (ops/pallas/nn.py), run in interpreter
mode on the CPU test mesh; the same kernel compiles with Mosaic on TPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import chore_tpu.ops.pallas.nn as nn_mod


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    # bypass the jit cache built against the real pallas_call
    monkeypatch.setattr(nn_mod, "nn_pallas", nn_mod.nn_pallas.__wrapped__)
    yield


@pytest.fixture()
def clouds():
    rng = np.random.RandomState(3)
    x = rng.randn(700, 3).astype(np.float32)
    y = rng.randn(450, 3).astype(np.float32)
    return x, y


class TestNNKernel:
    def test_matches_bruteforce(self, clouds):
        x, y = clouds
        d, i = nn_mod.nn_pallas(x, y)
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(i), d2.argmin(1))
        np.testing.assert_allclose(np.asarray(d), d2.min(1), atol=1e-5)

    def test_mask(self, clouds):
        x, y = clouds
        mask = np.arange(len(y)) % 3 != 0
        d, i = nn_mod.nn_pallas(x, y, y_mask=mask)
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        d2m = np.where(mask[None], d2, 1e10)
        np.testing.assert_array_equal(np.asarray(i), d2m.argmin(1))

    def test_non_tile_sizes(self):
        rng = np.random.RandomState(5)
        x = rng.randn(13, 3).astype(np.float32)
        y = rng.randn(7, 3).astype(np.float32)
        d, i = nn_mod.nn_pallas(x, y)
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(i), d2.argmin(1))

    def test_exact_gradients(self, clouds):
        x, y = clouds
        x = x[:64]

        def loss(xx):
            d, _ = nn_mod.nn_sqdist_exact_grad(xx, jnp.asarray(y))
            return d.sum()

        g = jax.grad(loss)(jnp.asarray(x))
        # analytic: 2 * (x - y[nn])
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        want = 2.0 * (x - y[d2.argmin(1)])
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)


class TestGroupedNN:
    """Group ids restrict matches: the one-kernel batching used by the
    contact (example*14+part) and collision (example) losses."""

    def _oracle(self, x, y, xg, yg, y_mask=None):
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        ok = xg[:, None] == yg[None, :]
        if y_mask is not None:
            ok &= y_mask[None, :]
        d2 = np.where(ok, d2, 1e10)
        return d2.min(1), d2.argmin(1)

    def test_groups_match_bruteforce(self, clouds):
        x, y = clouds
        rng = np.random.RandomState(7)
        xg = rng.randint(0, 5, len(x)).astype(np.int32)
        yg = rng.randint(0, 5, len(y)).astype(np.int32)
        d, i = nn_mod.nn_pallas(x, y, x_group=xg, y_group=yg)
        dw, iw = self._oracle(x, y, xg, yg)
        np.testing.assert_array_equal(np.asarray(i), iw)
        np.testing.assert_allclose(np.asarray(d), dw, atol=1e-5)

    def test_groups_plus_mask(self, clouds):
        x, y = clouds
        rng = np.random.RandomState(8)
        xg = rng.randint(0, 4, len(x)).astype(np.int32)
        yg = rng.randint(0, 4, len(y)).astype(np.int32)
        mask = rng.rand(len(y)) > 0.4
        d, i = nn_mod.nn_pallas(x, y, y_mask=mask, x_group=xg, y_group=yg)
        dw, iw = self._oracle(x, y, xg, yg, mask)
        matched = dw < 1e9
        np.testing.assert_array_equal(np.asarray(i)[matched], iw[matched])
        assert (np.asarray(d)[~matched] >= 1e9).all()

    def test_empty_group_sentinel(self, clouds):
        x, y = clouds
        xg = np.full(len(x), 3, np.int32)  # group 3 has no refs
        yg = np.zeros(len(y), np.int32)
        d, _ = nn_mod.nn_sqdist_exact_grad(
            jnp.asarray(x[:16]), jnp.asarray(y),
            x_group=jnp.asarray(xg[:16]), y_group=jnp.asarray(yg))
        assert float(jnp.min(d)) >= 1e9

    def test_xla_path_groups(self, clouds):
        from chore_tpu.ops.chamfer import _nn_sqdist_xla

        x, y = clouds
        rng = np.random.RandomState(9)
        xg = rng.randint(0, 3, len(x)).astype(np.int32)
        yg = rng.randint(0, 3, len(y)).astype(np.int32)
        d, i = _nn_sqdist_xla(jnp.asarray(x), jnp.asarray(y),
                              x_group=jnp.asarray(xg), y_group=jnp.asarray(yg),
                              tile=128)
        dw, iw = self._oracle(x, y, xg, yg)
        np.testing.assert_array_equal(np.asarray(i), iw)
        np.testing.assert_allclose(np.asarray(d), dw, atol=1e-4)


class TestChamferDispatch:
    def test_cpu_uses_xla_path(self, clouds):
        from chore_tpu.ops.chamfer import nn_sqdist

        x, y = clouds
        d, i = nn_sqdist(jnp.asarray(x), jnp.asarray(y))
        d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(i), d2.argmin(1))


class TestAllMasked:
    def test_all_masked_matches_sentinel(self, clouds):
        x, y = clouds
        import jax.numpy as jnp
        d, i = nn_mod.nn_sqdist_exact_grad(
            jnp.asarray(x[:16]), jnp.asarray(y),
            y_mask=jnp.zeros(len(y), bool),
        )
        assert float(jnp.min(d)) >= 1e9  # sentinel, not phantom distances


class TestVmappedNN:
    def test_vmap_matches_per_example(self, clouds):
        """vmapped kernel (batch grid dim) == per-example calls; this is
        how the contact/collision losses batch without B^2 work."""
        rng = np.random.RandomState(11)
        B = 3
        x = rng.randn(B, 70, 3).astype(np.float32)
        y = rng.randn(B, 40, 3).astype(np.float32)
        xg = rng.randint(0, 4, (B, 70)).astype(np.int32)
        yg = rng.randint(0, 4, (B, 40)).astype(np.int32)
        ym = rng.rand(B, 40) > 0.3
        d_b, i_b = jax.vmap(
            lambda a, b, m, g1, g2: nn_mod.nn_sqdist_exact_grad(
                a, b, y_mask=m, x_group=g1, y_group=g2)
        )(jnp.asarray(x), jnp.asarray(y), jnp.asarray(ym),
          jnp.asarray(xg), jnp.asarray(yg))
        for b in range(B):
            d1, i1 = nn_mod.nn_sqdist_exact_grad(
                jnp.asarray(x[b]), jnp.asarray(y[b]),
                y_mask=jnp.asarray(ym[b]), x_group=jnp.asarray(xg[b]),
                y_group=jnp.asarray(yg[b]))
            np.testing.assert_allclose(np.asarray(d_b[b]), np.asarray(d1),
                                       atol=1e-5)
