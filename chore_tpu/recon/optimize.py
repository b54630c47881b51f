"""Generic jitted Adam phase runner for the fitting loops.

The reference drives ~180 outer iterations x 10 inner steps of torch Adam
from Python, rebuilding optimizers at phase switches and early-stopping on
loss plateaus (reference: recon_fit_behave.py:90-163,224-291). Here each
phase is ONE jitted lax.while_loop: the carry holds (params, adam state,
iteration, prev_loss, PRNG key), parameter subsets are frozen via an optax
mask (instead of constructing new torch optimizers), and the early-stop
test runs on-device -- no host sync per iteration.

One run_phase corresponds to one reference OPTIMIZER LIFETIME, not one
description string: the reference rebuilds torch Adam at 'global'->'smpl
all pose' and at each object-phase switch, but NOT at 'smpl all pose' ->
'kpts' (recon_fit_behave.py:260-264 builds no new optimizer there), so the
pose+kpts span is a single phase here whose loss closure switches on the
iteration index -- Adam moments and step count carry across the switch
exactly as in the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class PhaseSpec:
    """One optimization phase (= one reference optimizer lifetime).

    Attributes:
      lr: Adam learning rate.
      n_iters: max outer iterations.
      steps_per_iter: grad steps per iteration (reference steps_per_iter=10).
      trainable: pytree of bools matching params (True = optimized).
      early_stop_after: fraction of n_iters before early stop can trigger
        (reference: it > 0.25 * max_iter); None disables early stopping.
      early_stop_min_iter: absolute local-iteration gate; overrides
        ``early_stop_after`` when set. The reference gates on a GLOBAL
        iteration counter (recon_fit_behave.py:278 ``it > 0.25*max_iter +
        iter_for_betas + iter_for_pose``; :159 ``it > 0.25*max_iter`` with
        ``it`` counting all prior phases), so callers translate that to
        this phase-local threshold. May be negative (gate always open).
      early_stop_rel: plateau threshold factor (reference:
        abs(prev-loss)/prev < prev * early_stop_rel).
    """

    lr: float
    n_iters: int
    steps_per_iter: int = 10
    trainable: object = None
    early_stop_after: Optional[float] = None
    early_stop_min_iter: Optional[float] = None
    early_stop_rel: float = 1e-3


def run_phase(loss_fn, params, spec: PhaseSpec, key=None, prev_loss=300.0,
              record=False):
    """Run one phase.

    Args:
      loss_fn: (params, it, key) -> (total_loss, aux_dict). Must be pure.
        ``it`` is the phase-local outer iteration as a traced int32; the
        closure derives the reference's weight-decay argument (and any
        iteration-dependent loss switching, e.g. pose -> kpts) from it.
      params: parameter pytree.
      spec: PhaseSpec.
      key: PRNG key (threaded; split per step for e.g. SVD jitter).
      prev_loss: plateau-reference loss entering the phase. The reference
        initializes it to 300 ONCE per fitting call and carries it across
        phases, updating after every inner step
        (recon_fit_behave.py:236,280-281 and :108,162) -- thread the
        returned final loss into the next phase to match.
      record: when True, run a fixed-length scan instead of the early-exit
        while_loop and ALSO return the per-step loss trace. Semantically
        identical (post-stop steps are frozen no-ops), but every iteration
        is traced, so use for debugging/verification, not production.

    Returns:
      (params, final_loss, n_iters_run), plus a trace dict
      {"loss": (n_iters, steps), "live": (n_iters, steps) bool} appended
      when ``record`` -- loss[i, j] is the loss evaluated (pre-update) at
      inner step j of iteration i; live marks steps executed before the
      early stop fired.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    mask = spec.trainable
    if mask is None:
        mask = jax.tree_util.tree_map(lambda _: True, params)
    # multi_transform + set_to_zero freezes the untrained subset (NOT
    # optax.masked, which passes masked-out updates through UNCHANGED --
    # i.e. raw gradients would be added to the frozen params).
    # apply_if_finite: a step with non-finite gradients is skipped entirely,
    # so one bad transient (e.g. a degenerate pose under an untrained field)
    # cannot poison the parameters -- the on-device analog of the
    # reference's per-step anomaly detection (trainer.py:78)
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", mask
    )
    tx = optax.apply_if_finite(
        optax.multi_transform(
            {"train": optax.adam(spec.lr), "freeze": optax.set_to_zero()},
            labels,
        ),
        max_consecutive_errors=10000,
    )
    opt_state = tx.init(params)

    stop_enabled = (spec.early_stop_after is not None
                    or spec.early_stop_min_iter is not None)
    if spec.early_stop_min_iter is not None:
        stop_gate = float(spec.early_stop_min_iter)
    elif spec.early_stop_after is not None:
        stop_gate = spec.early_stop_after * spec.n_iters
    else:
        stop_gate = 0.0

    def one_step(carry, _):
        """One grad step, with the reference's PER-STEP plateau test: loss
        -> backward -> step -> test-and-maybe-stop -> prev_loss=loss
        (recon_fit_behave.py:271-281). Once ``done``, the step is a frozen
        no-op (the reference returns mid-iteration; lax.scan cannot break,
        so remaining steps are skipped via cond).

        CRITICAL reference semantics: ``optimizer.zero_grad()`` runs once
        per OUTER iteration, not per step (recon_fit_behave.py:243,266-273
        and :117-136) -- the 10 inner backward() calls ACCUMULATE into
        .grad, so inner step i applies Adam to the SUM of the gradients of
        steps 0..i. ``gsum`` reproduces exactly that (trajectory-parity
        oracle: tests/test_trajectory_parity.py; a fresh-gradient variant
        visibly damps the reference's characteristic smplz oscillation)."""
        params, opt_state, it, prev_loss, done, k, gsum = carry
        k, sub = jax.random.split(k)
        was_live = ~done

        def live(args):
            params, opt_state, prev_loss, done, gsum = args
            (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, it, sub
            )
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            updates, opt_state = tx.update(gsum, opt_state, params)
            params = optax.apply_updates(params, updates)
            if stop_enabled:
                rel = jnp.abs(prev_loss - loss) / jnp.maximum(prev_loss, 1e-9)
                plateau = rel < prev_loss * spec.early_stop_rel
                done = plateau & (it > stop_gate)
            return params, opt_state, loss, done, gsum

        params, opt_state, prev_loss, done, gsum = jax.lax.cond(
            done, lambda a: a, live,
            (params, opt_state, prev_loss, done, gsum)
        )
        # frozen steps emit the stale prev_loss, masked by was_live
        return (params, opt_state, it, prev_loss, done, k, gsum), (
            prev_loss, was_live
        )

    def iteration(carry):
        params, opt_state, it, prev_loss, k, done, n_run = carry
        started = ~done
        # zero_grad() at the top of the outer iteration (reference :243)
        gsum = jax.tree_util.tree_map(jnp.zeros_like, params)
        (params, opt_state, _, prev_loss, done, k, _), ys = jax.lax.scan(
            one_step, (params, opt_state, it, prev_loss, done, k, gsum),
            None, length=spec.steps_per_iter,
        )
        carry = (params, opt_state, it + 1, prev_loss, k, done,
                 n_run + started.astype(jnp.int32))
        return carry, ys

    init = (
        params, opt_state, jnp.asarray(0),
        jnp.asarray(prev_loss, jnp.float32),
        key, jnp.asarray(False), jnp.asarray(0),
    )
    if record:
        carry, (loss_trace, live_trace) = jax.lax.scan(
            lambda c, _: iteration(c), init, None, length=spec.n_iters
        )
        params, _, _, loss, _, _, n_run = carry
        return params, loss, n_run, {"loss": loss_trace, "live": live_trace}
    params, _, _, loss, _, _, n_run = jax.lax.while_loop(
        lambda c: (c[2] < spec.n_iters) & ~c[5],
        lambda c: iteration(c)[0],
        init,
    )
    return params, loss, n_run


def freeze_all_except(params, *names):
    """Bool mask pytree: only top-level keys in ``names`` are trainable."""
    return {
        k: jax.tree_util.tree_map(lambda _: k in names, v)
        for k, v in params.items()
    }
