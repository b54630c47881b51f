"""Generic jitted Adam phase runner for the fitting loops.

The reference drives ~180 outer iterations x 10 inner steps of torch Adam
from Python, rebuilding optimizers at phase switches and early-stopping on
loss plateaus (reference: recon_fit_behave.py:90-163,224-291). Here each
phase is ONE jitted lax.while_loop: the carry holds (params, adam state,
iteration, prev_loss, PRNG key), parameter subsets are frozen via an optax
mask (instead of constructing new torch optimizers), and the early-stop
test runs on-device -- no host sync per iteration.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class PhaseSpec:
    """One optimization phase.

    Attributes:
      lr: Adam learning rate.
      n_iters: max outer iterations.
      steps_per_iter: grad steps per iteration (reference steps_per_iter=10).
      trainable: pytree of bools matching params (True = optimized).
      decay_fn: iteration -> weight-decay argument ``it`` of w*cst/(1+it).
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
    decay_fn: Callable = lambda it: 1.0
    early_stop_after: Optional[float] = None
    early_stop_min_iter: Optional[float] = None
    early_stop_rel: float = 1e-3


def run_phase(loss_fn, params, spec: PhaseSpec, key=None, prev_loss=300.0):
    """Run one phase.

    Args:
      loss_fn: (params, decay, key) -> (total_loss, aux_dict). Must be pure.
      params: parameter pytree.
      spec: PhaseSpec.
      key: PRNG key (threaded; split per step for e.g. SVD jitter).
      prev_loss: plateau-reference loss entering the phase. The reference
        initializes it to 300 ONCE per fitting call and carries it across
        phases, updating after every inner step
        (recon_fit_behave.py:236,280-281 and :108,162) -- thread the
        returned final loss into the next phase to match.

    Returns:
      (params, final_loss, n_iters_run)
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
        so remaining steps are skipped via cond)."""
        params, opt_state, it, prev_loss, done, k = carry
        k, sub = jax.random.split(k)

        def live(args):
            params, opt_state, prev_loss, done = args
            decay = spec.decay_fn(it)
            (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, decay, sub
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if stop_enabled:
                rel = jnp.abs(prev_loss - loss) / jnp.maximum(prev_loss, 1e-9)
                plateau = rel < prev_loss * spec.early_stop_rel
                done = plateau & (it > stop_gate)
            return params, opt_state, loss, done

        params, opt_state, prev_loss, done = jax.lax.cond(
            done, lambda a: a, live, (params, opt_state, prev_loss, done)
        )
        return (params, opt_state, it, prev_loss, done, k), None

    def iteration(carry):
        params, opt_state, it, prev_loss, k, done, n_run = carry
        (params, opt_state, _, prev_loss, done, k), _ = jax.lax.scan(
            one_step, (params, opt_state, it, prev_loss, done, k), None,
            length=spec.steps_per_iter,
        )
        return (params, opt_state, it + 1, prev_loss, k, done, n_run + 1)

    def cond(carry):
        _, _, it, _, _, done, _ = carry
        return (it < spec.n_iters) & ~done

    init = (
        params, opt_state, jnp.asarray(0),
        jnp.asarray(prev_loss, jnp.float32),
        key, jnp.asarray(False), jnp.asarray(0),
    )
    params, _, _, loss, _, _, n_run = jax.lax.while_loop(
        cond, lambda c: iteration(c), init
    )
    return params, loss, n_run


def freeze_all_except(params, *names):
    """Bool mask pytree: only top-level keys in ``names`` are trainable."""
    return {
        k: jax.tree_util.tree_map(lambda _: k in names, v)
        for k, v in params.items()
    }
