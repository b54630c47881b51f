"""Pallas soft-silhouette kernel tests (ops/pallas/silhouette.py), run in
interpreter mode on CPU; the same kernel compiles with Mosaic on TPU
(driven there: forward matches XLA to 4e-6, grads to 2e-5, 5.8x faster at
2048 faces)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import chore_tpu.ops.pallas.silhouette as sil_mod
import chore_tpu.ops.rasterizer as R
from chore_tpu.utils.meshio import octasphere


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(sil_mod, "_coverage_fwd_call",
                        sil_mod._coverage_fwd_call.__wrapped__)
    monkeypatch.setattr(sil_mod, "_coverage_bwd_call",
                        sil_mod._coverage_bwd_call.__wrapped__)
    yield


@pytest.fixture
def scene():
    tv, tf = octasphere(radius=0.18, center=(0.1, 0.05, 2.0), subdiv=2)
    K = np.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]], np.float32)
    ndc = R.project_unit_k(jnp.asarray(tv)[None], jnp.asarray(K))
    return ndc, jnp.asarray(tf)


class TestForwardParity:
    def test_matches_xla_path(self, scene):
        ndc, faces = scene
        # the XLA path (soft_silhouette dispatches to it on CPU)
        want = np.asarray(R.soft_silhouette(ndc, faces, image_size=64))
        got = np.asarray(
            sil_mod.soft_silhouette_pallas(ndc, faces, image_size=64))
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert want.sum() > 50  # the sphere is actually on screen

    def test_degenerate_and_behind_camera_faces(self, scene):
        ndc, faces = scene
        bad = jnp.asarray(np.array(ndc))
        bad = bad.at[0, 0, 2].set(-1.0)  # one vertex behind the camera
        bad = bad.at[0, 1].set(bad[0, 2])  # and a degenerate face
        want = np.asarray(R.soft_silhouette(bad, faces, image_size=64))
        got = np.asarray(
            sil_mod.soft_silhouette_pallas(bad, faces, image_size=64))
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert np.isfinite(got).all()


class TestGradients:
    def test_grad_matches_xla(self, scene):
        ndc, faces = scene
        ref = (np.asarray(R.soft_silhouette(ndc, faces, image_size=64))
               > 0.5).astype(np.float32)
        shift = jnp.asarray([0.03, -0.02, 0.0])

        def loss(fn, t):
            sil = fn(ndc + t[None, None], faces, image_size=64)
            return jnp.mean((sil - jnp.asarray(ref)) ** 2)

        g_xla = np.asarray(jax.grad(
            lambda t: loss(R.soft_silhouette, t))(shift))
        g_pal = np.asarray(jax.grad(
            lambda t: loss(sil_mod.soft_silhouette_pallas, t))(shift))
        np.testing.assert_allclose(g_pal, g_xla, rtol=1e-4, atol=1e-7)
        assert np.abs(g_xla).max() > 0  # non-trivial gradient

    def test_padding_faces_get_zero_grad(self, scene):
        """F=128 pads to the tile; padding must not leak gradient."""
        ndc, faces = scene

        def loss(v):
            return sil_mod.soft_silhouette_pallas(v, faces,
                                                  image_size=64).sum()

        g = np.asarray(jax.grad(loss)(ndc))
        assert np.isfinite(g).all()


class TestOddSizes:
    def test_non_multiple_image_size(self, scene):
        """image_size whose pixel count is not a tile multiple must pad,
        not truncate (200^2 = 40000 is not divisible by 256)."""
        ndc, faces = scene
        want = np.asarray(R.soft_silhouette(ndc, faces, image_size=200))
        got = np.asarray(
            sil_mod.soft_silhouette_pallas(ndc, faces, image_size=200))
        # the two paths evaluate the same distances through different
        # algebra (ev/len vs pre-scaled coefficients; /sigma vs *inv_sigma),
        # so on a handful of pixels the edge-vs-edge / edge-vs-box argmin
        # flips at f32 (measured: 2/40000 pixels differ by >1e-5 here);
        # both routings are valid subgradients of the same min
        np.testing.assert_allclose(got, want, atol=5e-5)

        def loss(fn, t):
            sil = fn(ndc + t[None, None], faces, image_size=200)
            return jnp.mean(sil ** 2)

        g_xla = np.asarray(jax.grad(
            lambda t: loss(R.soft_silhouette, t))(jnp.zeros(3)))
        g_pal = np.asarray(jax.grad(
            lambda t: loss(sil_mod.soft_silhouette_pallas, t))(jnp.zeros(3)))
        # cross-path sanity only: the tie flips above hit ~3/66 vertex
        # grads at ~1e-4 absolute, so this cannot be tight. Padding
        # correctness is guarded by test_padding_is_exact below.
        np.testing.assert_allclose(g_pal, g_xla, rtol=5e-2, atol=5e-4)

    def test_padding_is_exact(self, scene):
        """Same-algebra guard for the pixel-padding plumbing: 200^2=40000
        pads 448 zero rows at tile_p=512 and pads NOTHING at tile_p=800.
        Forward and backward must agree to float-sum tolerance -- a
        truncated/misaligned pad (the bug this class exists for) shifts
        whole pixel rows. The cross-path check above can't see this at
        sub-percent level through the argmin tie-flip noise."""
        ndc, faces = scene
        sigma = 0.5 * (2.0 / 200)
        e = sil_mod.edge_coeffs(ndc[0], faces, sigma)
        inv = 1.0 / sigma
        f_pad = np.asarray(sil_mod._coverage_fwd_call(
            e, 200, inv, tile_p=512))
        f_exact = np.asarray(sil_mod._coverage_fwd_call(
            e, 200, inv, tile_p=800))
        np.testing.assert_allclose(f_pad, f_exact, atol=1e-6)
        g = jnp.asarray(np.random.RandomState(3).rand(40000), jnp.float32)
        b_pad = np.asarray(sil_mod._coverage_bwd_call(
            e, g, 200, inv, tile_p=512))
        b_exact = np.asarray(sil_mod._coverage_bwd_call(
            e, g, 200, inv, tile_p=800))
        np.testing.assert_allclose(b_pad, b_exact, rtol=1e-5, atol=1e-6)

    def test_empty_faces_render_empty(self):
        empty = jnp.zeros((0, 3), jnp.int32)
        ndc = jnp.zeros((1, 4, 3))
        out = np.asarray(R.soft_silhouette(ndc, empty, image_size=32))
        assert out.shape == (1, 32, 32) and (out == 0).all()
        fi, _, _ = R.hard_rasterize(ndc, empty, image_size=32)
        assert (np.asarray(fi) == -1).all()


class TestCulling:
    """The tile/chunk culls (chunk AABB vs pixel-tile y-range, zero-
    upstream-gradient tile skip) claim to be EXACT. Different tile_p
    values produce different skip patterns over the same math, so
    agreement across tile_p is the direct test of that claim."""

    def test_sparse_gradient_tile_skip_is_exact(self, scene):
        """g zero outside a thin band (the clip-saturated-interior /
        keep-masked shape the bwd tile_live skip exists for): results
        must be identical across tile sizes, i.e. independent of WHICH
        tiles get skipped."""
        ndc, faces = scene
        sigma = 0.5 * (2.0 / 64)
        e = sil_mod.edge_coeffs(ndc[0], faces, sigma)
        inv = 1.0 / sigma
        g = np.zeros(64 * 64, np.float32)
        g[64 * 20 : 64 * 22] = np.random.RandomState(0).randn(128)
        g = jnp.asarray(g)
        outs = [np.asarray(sil_mod._coverage_bwd_call(
            e, g, 64, inv, tile_p=tp)) for tp in (256, 512, 1024)]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6, atol=1e-7)
        assert np.abs(outs[0]).max() > 0  # the band actually hits faces

    def test_all_zero_gradient_gives_zero(self, scene):
        ndc, faces = scene
        sigma = 0.5 * (2.0 / 64)
        e = sil_mod.edge_coeffs(ndc[0], faces, sigma)
        de = np.asarray(sil_mod._coverage_bwd_call(
            e, jnp.zeros(64 * 64), 64, 1.0 / sigma))
        assert (de == 0).all()

    def test_offscreen_object_culls_to_zero(self, scene):
        """Object fully off-screen in x: the chunk-AABB x test must skip
        every (tile, chunk) pair, and the result must equal the XLA path
        (all-zero coverage, finite zero-ish grads)."""
        ndc, faces = scene
        off = ndc + jnp.asarray([5.0, 0.0, 0.0])[None, None]
        want = np.asarray(R.soft_silhouette(off, faces, image_size=64))
        got = np.asarray(
            sil_mod.soft_silhouette_pallas(off, faces, image_size=64))
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert (got == 0).all()
        g = np.asarray(jax.grad(lambda v: sil_mod.soft_silhouette_pallas(
            v, faces, image_size=64).sum())(off))
        assert np.isfinite(g).all() and (g == 0).all()

    def test_object_far_below_frame_culls_in_y(self, scene):
        ndc, faces = scene
        off = ndc + jnp.asarray([0.0, 5.0, 0.0])[None, None]
        got = np.asarray(
            sil_mod.soft_silhouette_pallas(off, faces, image_size=64))
        assert (got == 0).all()

    def test_forward_tile_size_independent(self, scene):
        """Forward y-cull exactness: same sums for every tile_p (hence
        every tile-row partition)."""
        ndc, faces = scene
        sigma = 0.5 * (2.0 / 64)
        e = sil_mod.edge_coeffs(ndc[0], faces, sigma)
        inv = 1.0 / sigma
        outs = [np.asarray(sil_mod._coverage_fwd_call(
            e, 64, inv, tile_p=tp)) for tp in (256, 512, 1024)]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6, atol=1e-7)
        assert outs[0].sum() > 50


class TestSigmaOverride:
    def test_explicit_sigma_widens_and_differentiates(self, scene):
        """Explicit (non-None) sigma must work through the jitted dispatch
        (regression: soft_silhouette's jit traced sigma instead of
        treating it as static, so any explicit float -- e.g. the annealed
        sil phase's levels -- crashed the custom_vjp's nondiff plumbing)."""
        ndc, faces = scene
        base = 0.5 * (2.0 / 64)
        narrow = np.asarray(R.soft_silhouette(ndc, faces, image_size=64,
                                              sigma=base))
        wide = np.asarray(R.soft_silhouette(ndc, faces, image_size=64,
                                            sigma=4 * base))
        # wider sigma smears coverage outward: strictly more pixels above
        # a faint threshold, fewer fully-saturated ones
        assert (wide > 0.01).sum() > (narrow > 0.01).sum()
        g = np.asarray(jax.grad(lambda t: sil_mod.soft_silhouette_pallas(
            ndc + t[None, None], faces, image_size=64,
            sigma=4 * base).sum())(jnp.zeros(3)))
        assert np.isfinite(g).all() and np.abs(g).max() > 0
