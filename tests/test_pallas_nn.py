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
