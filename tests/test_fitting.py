"""Fitting-layer tests against analytic fields: each loss term, the phase
runner, and object-pose convergence on a synthetic scene."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.recon import losses as L
from chore_tpu.recon.optimize import PhaseSpec, freeze_all_except, run_phase
from chore_tpu.ops.rotation import project_so3
from chore_tpu.utils.meshio import octasphere




class TestLossTerms:
    def test_smplz(self):
        joints = jnp.zeros((2, 25, 3)).at[:, 8, 2].set(jnp.array([2.2, 2.4]))
        assert np.isclose(float(L.smplz_loss(joints)), 0.5 * 0.04, atol=1e-6)

    def test_j2d_perfect_projection_zero(self):
        from chore_tpu.ops.camera import PerspectiveCamera

        cam = PerspectiveCamera()
        pts = jnp.asarray(np.random.RandomState(0).randn(1, 25, 3).astype(np.float32))
        pts = pts.at[..., 2].set(2.2)
        cc = jnp.array([[1000.0, 800.0]])
        px, py = cam.project_screen(pts, cc)
        proj = jnp.concatenate([px, py], -1) * (512.0 / cam.crop_size)
        kpts = jnp.concatenate([proj, jnp.ones((1, 25, 1))], -1)
        assert float(L.j2d_loss(pts, kpts, cc, cam)) < 1e-8

    def test_collision_detects_penetration(self):
        # unit sphere "body"; object points inside vs outside
        sv, sf = octasphere(radius=0.5, subdiv=2)
        verts = jnp.asarray(sv)[None]
        normals = L.vertex_normals(verts, sf)
        # normals point outward for this sphere
        outward = np.einsum("vd,vd->v", np.asarray(normals[0]), sv / np.linalg.norm(sv, axis=1, keepdims=True))
        assert (outward > 0.9).all()
        inside = jnp.zeros((1, 10, 3))  # center: deep inside
        outside = jnp.full((1, 10, 3), 2.0)
        assert float(L.collision_loss(verts, normals, inside)) > 0.01
        assert float(L.collision_loss(verts, normals, outside)) < 1e-8

    def test_contact_pulls_matching_parts(self):
        B, Nh, No = 1, 40, 20
        rng = np.random.RandomState(0)
        hv = jnp.asarray(rng.randn(B, Nh, 3).astype(np.float32))
        ov = jnp.asarray(rng.randn(B, No, 3).astype(np.float32))
        labels_h = jnp.asarray(rng.randint(0, 14, (Nh,)))
        labels_o = jnp.asarray(rng.randint(0, 14, (B, No)))
        df_close = jnp.zeros((B, Nh)), jnp.zeros((B, No))  # all in contact
        loss = L.contact_loss(hv, ov, df_close[0], df_close[1],
                              labels_h, labels_o)
        assert float(loss) > 0
        # identical clouds with identical labels -> zero
        labels_same = jnp.asarray(rng.randint(0, 14, (Nh,)))
        loss0 = L.contact_loss(hv, hv, jnp.zeros((B, Nh)), jnp.zeros((B, Nh)),
                               labels_same, jnp.tile(labels_same[None], (B, 1)))
        assert float(loss0) < 1e-6

    def test_contact_no_contacts_returns_zero(self):
        B, Nh, No = 1, 10, 10
        hv = jnp.zeros((B, Nh, 3))
        ov = jnp.ones((B, No, 3))
        big = jnp.full((B, Nh), 1.0)
        loss = L.contact_loss(hv, ov, big, jnp.full((B, No), 1.0),
                              jnp.zeros((Nh,), jnp.int32),
                              jnp.zeros((B, No), jnp.int32))
        assert float(loss) == 0.0

    def test_contact_matches_dense_oracle(self):
        """Grouped-kernel contact vs a literal dense per-part chamfer
        (the reference semantics, recon_fit_base.py:553-608)."""
        B, Nh, No = 3, 50, 30
        rng = np.random.RandomState(2)
        hv = rng.randn(B, Nh, 3).astype(np.float32)
        ov = rng.randn(B, No, 3).astype(np.float32)
        labels_h = rng.randint(0, 14, (Nh,))
        labels_o = rng.randint(0, 14, (B, No))
        df_h = rng.rand(B, Nh).astype(np.float32) * 0.2
        df_o = rng.rand(B, No).astype(np.float32) * 0.2
        df_o[2] = 1.0  # example 2: no object-side contacts -> all eligible

        # dense numpy oracle
        thresh = 0.08
        mh, mo = df_h < thresh, df_o < thresh
        total, pairs = 0.0, 0
        for b in range(B):
            eh = mh[b] if mh[b].any() else np.ones(Nh, bool)
            eo = mo[b] if mo[b].any() else np.ones(No, bool)
            if not (mh[b].any() or mo[b].any()):
                continue
            d = ((hv[b][:, None] - ov[b][None]) ** 2).sum(-1)
            for k in range(14):
                hk = eh & (labels_h == k)
                ok = eo & (labels_o[b] == k)
                if hk.sum() == 0 or ok.sum() == 0:
                    continue
                total += d[hk][:, ok].min(1).mean() + d[hk][:, ok].min(0).mean()
                pairs += 1
        want = total / pairs if pairs else 0.0

        got = float(L.contact_loss(
            jnp.asarray(hv), jnp.asarray(ov), jnp.asarray(df_h),
            jnp.asarray(df_o), jnp.asarray(labels_h), jnp.asarray(labels_o)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_collision_batched_matches_per_example(self):
        """One grouped kernel call over B must equal per-example losses."""
        sv, sf = octasphere(radius=0.5, subdiv=2)
        rng = np.random.RandomState(4)
        B = 3
        verts = jnp.asarray(np.stack([sv + rng.randn(3) * 0.01
                                      for _ in range(B)]).astype(np.float32))
        normals = L.vertex_normals(verts, sf)
        obj = jnp.asarray(rng.randn(B, 25, 3).astype(np.float32) * 0.4)
        batched = float(L.collision_loss(verts, normals, obj))
        singles = [float(L.collision_loss(verts[b:b + 1], normals[b:b + 1],
                                          obj[b:b + 1])) for b in range(B)]
        np.testing.assert_allclose(batched, np.mean(singles), rtol=1e-5)

    def test_weighted_sum_decay(self):
        ld = {"df_h": jnp.asarray(2.0), "scale": jnp.asarray(1.0)}
        w = {"df_h": 900.0, "scale": 100.0}
        assert np.isclose(float(L.weighted_sum(ld, w, 1.0)),
                          (900 * 2 + 100) / 2.0)


class TestPhaseRunner:
    def test_converges_quadratic(self):
        target = jnp.array([1.0, -2.0, 3.0])

        def loss_fn(params, decay, key):
            l = jnp.sum((params["x"] - target) ** 2)
            return l, {"l": l}

        params = {"x": jnp.zeros(3), "frozen": jnp.zeros(2)}
        # steps_per_iter=1: with the reference's per-OUTER-iteration
        # zero_grad (recon_fit_behave.py:243,273), >1 inner steps
        # accumulate gradients and Adam limit-cycles around the optimum
        # (torch does the exact same: this toy at steps_per_iter=10 ends
        # at x[0]=1.2723 in BOTH frameworks, matched to 5e-6 -- see
        # tests/test_trajectory_parity.py for the oracle). Single-step
        # iterations make accumulation a no-op so convergence is exact.
        spec = PhaseSpec(lr=0.1, n_iters=500, steps_per_iter=1,
                         trainable=freeze_all_except(params, "x"))
        out, loss, n = run_phase(loss_fn, params, spec)
        assert np.allclose(out["x"], target, atol=1e-2)
        assert np.allclose(out["frozen"], 0.0)

    def test_accumulated_grads_match_torch_adam(self):
        # reference semantics: zero_grad once per outer iteration, 10
        # backward+step calls accumulate (recon_fit_behave.py:243,266-281).
        # Endpoint pinned from torch.optim.Adam run with that exact loop:
        # [1.2723281, -1.9999301, 3.000001] (limit cycle, NOT the optimum).
        target = jnp.array([1.0, -2.0, 3.0])

        def loss_fn(params, decay, key):
            l = jnp.sum((params["x"] - target) ** 2)
            return l, {"l": l}

        params = {"x": jnp.zeros(3)}
        spec = PhaseSpec(lr=0.1, n_iters=50, steps_per_iter=10)
        out, _, _ = run_phase(loss_fn, params, spec)
        np.testing.assert_allclose(
            np.asarray(out["x"]), [1.2723281, -1.9999301, 3.000001],
            atol=1e-4)

    def test_early_stop_triggers(self):
        # the reference plateau rule is scale-dependent
        # (abs(prev-loss)/prev < prev * rel); use an O(100) loss like the
        # real weighted fitting losses so it can fire
        def loss_fn(params, decay, key):
            l = jnp.sum(params["x"] ** 2) + 100.0
            return l, {}

        params = {"x": jnp.ones(2)}
        spec = PhaseSpec(lr=0.05, n_iters=100, steps_per_iter=2,
                         early_stop_after=0.05, early_stop_rel=1e-3)
        _, _, n = run_phase(loss_fn, params, spec)
        assert int(n) < 100

    def test_kpts_stop_iteration_matches_reference_formula(self):
        """The kpts phase must stop at exactly the iteration the reference
        formula gives (recon_fit_behave.py:278: plateau AND global it >
        0.25*max_iter + iter_for_betas + iter_for_pose, prev_loss updated
        per inner step). Simulate the reference loop in Python on the same
        constant loss and compare."""
        iter_betas, iter_pose, iter_kpts, max_iter = 1, 1, 1, 150
        const = 100.0

        # --- reference simulation (global counter, per-step test) ---
        prev_loss, stop_global = 300.0, None
        for it in range(iter_betas + iter_kpts + iter_pose + max_iter):
            for _ in range(10):
                loss = const
                if (abs(prev_loss - loss) / prev_loss < prev_loss * 1e-3
                        and it > 0.25 * max_iter + iter_betas + iter_pose):
                    stop_global = it
                    break
                prev_loss = loss
            if stop_global is not None:
                break
        expected_local_iters = stop_global - (iter_betas + iter_pose) + 1

        # --- ours: betas/pose phases thread prev_loss into kpts ---
        def loss_fn(p, decay, key):
            return jnp.sum(p["x"] * 0.0) + const, {}

        params = {"x": jnp.ones(2)}
        warm = PhaseSpec(lr=0.006, n_iters=iter_betas + iter_pose,
                         steps_per_iter=10)
        params, prev, _ = run_phase(loss_fn, params, warm)
        spec = PhaseSpec(lr=0.006, n_iters=max_iter + iter_kpts,
                         steps_per_iter=10,
                         early_stop_min_iter=0.25 * max_iter,
                         early_stop_rel=1e-3)
        _, _, n = run_phase(loss_fn, params, spec, prev_loss=prev)
        assert int(n) == expected_local_iters, (int(n), expected_local_iters)

    def test_negative_gate_allows_immediate_stop(self):
        """Joint phase: the reference gate it > 0.25*max_iter uses the
        GLOBAL counter (recon_fit_behave.py:159) and is already satisfied
        when the joint phase begins, so with a negative local gate a
        plateau on iteration 0 must stop immediately."""
        const = 50.0

        def loss_fn(p, decay, key):
            return jnp.sum(p["x"] * 0.0) + const, {}

        spec = PhaseSpec(lr=0.002, n_iters=110, steps_per_iter=10,
                         early_stop_min_iter=-45.0, early_stop_rel=1e-4)
        # prev_loss == const: plateau at the very first step
        _, _, n = run_phase(loss_fn, {"x": jnp.ones(2)}, spec,
                            prev_loss=const)
        assert int(n) == 1

    def test_params_frozen_after_stop(self):
        """Once the per-step stop fires mid-iteration, the remaining steps
        of that iteration must not touch the parameters (the reference
        returns immediately)."""
        const = 50.0

        def loss_fn(p, decay, key):
            # constant VALUE (plateau at step 0) but nonzero gradient
            return jnp.sum(p["x"] - jax.lax.stop_gradient(p["x"])) + const, {}

        spec = PhaseSpec(lr=0.1, n_iters=10, steps_per_iter=10,
                         early_stop_min_iter=-1.0, early_stop_rel=1e-4)
        out, _, n = run_phase(loss_fn, {"x": jnp.ones(2)}, spec,
                              prev_loss=const)
        # step 0: plateau fires (prev==const) AFTER the update -> exactly
        # one Adam step applied (|update| == lr at t=1), then frozen
        assert int(n) == 1
        np.testing.assert_allclose(np.asarray(out["x"]), 1.0 - 0.1, rtol=1e-5)


class TestObjectPhaseConvergence:
    def test_object_pose_recovers_translation(self):
        """Analytic object UDF (sphere at c_o): the 'object only' phase must
        pull a mis-initialized template onto it."""
        c_o = jnp.array([0.4, -0.1, 2.3])
        radius = 0.2
        tv, tf = octasphere(radius=radius, subdiv=2)
        template = jnp.asarray(tv)

        def query_fn(points):
            d_o = jnp.abs(jnp.linalg.norm(points - c_o, axis=-1) - radius)
            d_h = jnp.ones_like(d_o)  # no human nearby
            n = points.shape[:-1]
            return {
                "df": jnp.stack([d_h, d_o], -1),
                "parts": jnp.zeros(n + (14,)),
                "pca": jnp.broadcast_to(jnp.eye(3), n + (3, 3)),
                "centers": jnp.broadcast_to(
                    jnp.concatenate([jnp.zeros(3), c_o]), n + (6,)),
            }

        def obj_losses(params, decay, key):
            from chore_tpu.ops.rotation import project_so3_jittered

            R = project_so3_jittered(params["obj_R"], key)
            obj = jnp.einsum("nd,bde->bne", template, R) + params["obj_t"][:, None]
            obj = obj * params["obj_s"][:, None, None]
            preds = query_fn(obj)
            ld = {
                "object": L.df_o_loss(preds["df"][..., 1]),
                "scale": L.scale_loss(params["obj_s"]),
                "ocent": L.ocent_loss(obj, jnp.mean(preds["centers"][..., 3:], 1)),
            }
            return L.weighted_sum(ld, L.BEHAVE_WEIGHTS, decay), ld

        params = {
            "obj_R": jnp.eye(3)[None],
            "obj_t": jnp.array([[0.0, 0.3, 2.0]]),  # wrong init
            "obj_s": jnp.ones(1),
        }
        spec = PhaseSpec(lr=0.006, n_iters=40, steps_per_iter=10)
        out, loss, _ = run_phase(obj_losses, params, spec, jax.random.PRNGKey(0))
        # template center must land on the object center
        err = np.linalg.norm(np.asarray(out["obj_t"][0] * out["obj_s"][0] - c_o))
        assert err < 0.03, f"translation error {err}"


class TestFreezing:
    def test_frozen_params_bitwise_unchanged(self):
        """Regression: optax.masked passes masked-out updates through
        unchanged (raw gradients!); frozen subsets must stay identical."""
        params = {"a": jnp.ones((3,)), "b": jnp.full((2,), 2.0)}

        def loss_fn(p, decay, k):
            # gradient w.r.t. BOTH leaves is nonzero
            return jnp.sum(p["a"] ** 2) + 100.0 * jnp.sum(p["b"] ** 2), {}

        spec = PhaseSpec(lr=0.1, n_iters=2, steps_per_iter=3,
                         trainable=freeze_all_except(params, "a"))
        out, _, _ = run_phase(loss_fn, params, spec)
        assert not np.allclose(np.asarray(out["a"]), 1.0)  # trained
        np.testing.assert_array_equal(np.asarray(out["b"]), 2.0)  # frozen
