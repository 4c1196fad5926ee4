"""Rollout metrics: MSE / MAE / kinetic energy / Sinkhorn divergence.

Matches the reference metric semantics (reference
lagrangebench/evaluate/metrics.py) with a self-contained, pure-JAX Sinkhorn
divergence replacing the ott-jax dependency: log-domain Sinkhorn with the
OTT-style relative epsilon (5% of the mean cost) and the debiased divergence
S(a,b) = OT(a,b) - (OT(a,a) + OT(b,b)) / 2 evaluated from the dual
potentials. Runs entirely on device (TPU-friendly: fixed-shape while_loop).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

MetricsDict = Dict[str, jnp.ndarray]


def _sinkhorn_potentials(
    cost: jnp.ndarray,
    log_a: jnp.ndarray,
    log_b: jnp.ndarray,
    epsilon: jnp.ndarray,
    threshold: float = 1e-4,
    max_iterations: int = 500,
    inner_iterations: int = 10,
):
    """Log-domain Sinkhorn; returns dual potentials (f, g)."""
    n, m = cost.shape

    def softmin_rows(f, g):
        # g_new via column marginal: logsumexp over rows
        return -epsilon * jax.nn.logsumexp(
            (f[:, None] - cost) / epsilon + log_a[:, None], axis=0
        )

    def softmin_cols(f, g):
        return -epsilon * jax.nn.logsumexp(
            (g[None, :] - cost) / epsilon + log_b[None, :], axis=1
        )

    def marginal_error(f, g):
        # row marginal of the implied plan vs a
        log_p_row = jax.nn.logsumexp(
            (f[:, None] + g[None, :] - cost) / epsilon + log_b[None, :], axis=1
        )
        return jnp.max(jnp.abs(jnp.exp(log_p_row + log_a) - jnp.exp(log_a)))

    def cond(carry):
        f, g, it, err = carry
        return (err > threshold) & (it < max_iterations)

    def body(carry):
        f, g, it, _ = carry
        for _ in range(inner_iterations):
            f = softmin_cols(f, g)
            g = softmin_rows(f, g)
        return f, g, it + inner_iterations, marginal_error(f, g)

    f0 = jnp.zeros((n,), cost.dtype)
    g0 = jnp.zeros((m,), cost.dtype)
    it0 = jnp.asarray(0, jnp.int32)
    err0 = jnp.asarray(jnp.inf, cost.dtype)
    f, g, _, _ = jax.lax.while_loop(cond, body, (f0, g0, it0, err0))
    return f, g


def _reg_ot_cost(
    x_cost: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, epsilon,
    threshold: float = 1e-4,
):
    """Entropy-regularized OT cost via the dual objective <f,a> + <g,b>."""
    log_a = jnp.log(a)
    log_b = jnp.log(b)
    f, g = _sinkhorn_potentials(x_cost, log_a, log_b, epsilon, threshold)
    return jnp.sum(f * a) + jnp.sum(g * b)


class MetricsComputer:
    """Compute metrics between a predicted and a target rollout.

    Args:
        active_metrics: subset of ["mse", "mae", "sinkhorn", "e_kin"].
        dist_fn: boundary-aware displacement function.
        metadata: dataset metadata (dt, dx, dim, write_every).
        input_seq_length: model input window length.
        stride: temporal subsampling for e_kin and sinkhorn.
        loss_ranges: horizons for short-range losses.
    """

    METRICS = ["mse", "mae", "sinkhorn", "e_kin"]

    def __init__(
        self,
        active_metrics: List[str],
        dist_fn: Callable,
        metadata: Dict,
        input_seq_length: int = 6,
        stride: int = 10,
        loss_ranges: Optional[List[int]] = None,
        sinkhorn_epsilon: Optional[float] = None,
        sinkhorn_threshold: float = 1e-4,
    ):
        if active_metrics is None:
            active_metrics = []
        assert all(m in self.METRICS for m in active_metrics)
        self._active = list(active_metrics)
        self._dist_fn = dist_fn
        self._dist_vmap = jax.vmap(dist_fn, in_axes=(0, 0))
        self._dist_tvmap = jax.vmap(self._dist_vmap, in_axes=(0, 0))
        self._loss_ranges = loss_ranges or [1, 5, 10, 20, 50, 100]
        self._input_seq_length = input_seq_length
        self._stride = stride
        self._metadata = metadata
        # None -> ott-jax 0.4.x default: 5% of the mean of the XY cost
        # matrix, shared by the debiasing XX/YY problems (share_epsilon);
        # threshold matches the reference's sinkhorn_kwargs
        # (reference lagrangebench/evaluate/metrics.py:162-176)
        self._sinkhorn_epsilon = sinkhorn_epsilon
        self._sinkhorn_threshold = sinkhorn_threshold

    # -- per-frame helpers -------------------------------------------------

    def mse(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Mean squared error of one frame under the PBC-aware distance."""
        return (self._dist_vmap(pred, target) ** 2).mean()

    def mae(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return jnp.abs(self._dist_vmap(pred, target)).mean()

    def sinkhorn(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Debiased Sinkhorn divergence between two particle distributions."""
        cost_xy = self._cost_matrix(pred, target)
        cost_xx = self._cost_matrix(pred, pred)
        cost_yy = self._cost_matrix(target, target)
        if self._sinkhorn_epsilon is None:
            # ott-jax default: 5% of the mean XY cost, shared across the
            # debiasing problems (share_epsilon=True)
            epsilon = 0.05 * jnp.mean(cost_xy)
        else:
            epsilon = jnp.asarray(self._sinkhorn_epsilon, cost_xy.dtype)
        a = jnp.full((pred.shape[0],), 1.0 / pred.shape[0], pred.dtype)
        b = jnp.full((target.shape[0],), 1.0 / target.shape[0], target.dtype)
        thr = self._sinkhorn_threshold
        ot_xy = _reg_ot_cost(cost_xy, a, b, epsilon, thr)
        ot_xx = _reg_ot_cost(cost_xx, a, a, epsilon, thr)
        ot_yy = _reg_ot_cost(cost_yy, b, b, epsilon, thr)
        return ot_xy - 0.5 * (ot_xx + ot_yy)

    def e_kin(self, frame_vel: jnp.ndarray) -> jnp.ndarray:
        """Kinetic energy proxy of one velocity frame (no 1/2 m factor,
        reference convention)."""
        return jnp.sum(frame_vel**2)

    def _cost_matrix(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Pairwise squared distances under the boundary-aware metric."""
        def sq(a, b):
            return jnp.sum(self._dist_fn(a, b) ** 2)

        return jax.vmap(lambda a: jax.vmap(lambda b: sq(a, b))(y))(x)

    # -- main entry -----------------------------------------------------------

    def __call__(
        self, pred_rollout: jnp.ndarray, target_rollout: jnp.ndarray
    ) -> MetricsDict:
        """Both rollouts shaped (T, N, dim). jit/vmap-compatible."""
        target_rollout = jnp.asarray(target_rollout, dtype=pred_rollout.dtype)
        metrics: MetricsDict = {}
        for name in self._active:
            if name in ("mse", "mae"):
                fn = getattr(self, name)
                per_step = jax.vmap(fn)(pred_rollout, target_rollout)
                metrics[name] = per_step
                for h in self._loss_ranges:
                    if h < per_step.shape[0]:
                        metrics[f"{name}{h}"] = per_step[:h]
            elif name == "e_kin":
                dt = self._metadata["dt"] * self._metadata["write_every"]
                dx = self._metadata["dx"]
                dim = self._metadata["dim"]
                e_fn = jax.vmap(jax.vmap(self.e_kin))

                def ekin_of(rollout):
                    vel = self._dist_tvmap(
                        rollout[1 :: self._stride], rollout[0:-1 : self._stride]
                    )
                    return e_fn(vel / dt).sum(1) * dx**dim

                e_pred, e_target = ekin_of(pred_rollout), ekin_of(target_rollout)
                metrics[name] = {
                    "predicted": e_pred,
                    "target": e_target,
                    "mse": ((e_pred - e_target) ** 2).mean(),
                }
            elif name == "sinkhorn":
                # scan, not vmap: the NxN cost matrices are too large to batch
                metrics[name] = jax.lax.scan(
                    lambda _, xy: (None, self.sinkhorn(*xy)),
                    None,
                    (
                        pred_rollout[0 :: self._stride],
                        target_rollout[0 :: self._stride],
                    ),
                )[1]
        return metrics


def averaged_metrics(eval_metrics: Dict[str, MetricsDict]) -> Dict[str, float]:
    """Average metrics across rollouts into val/<metric> and val/std<metric>.

    mse/mae map onto "loss"; e_kin contributes its mse
    (cf. reference lagrangebench/evaluate/metrics.py:233-252).
    """
    per_traj = defaultdict(list)
    for rollout in eval_metrics.values():
        for k, v in rollout.items():
            if k == "e_kin":
                v = v["mse"]
            if k in ("mse", "mae"):
                k = "loss"
            per_traj[k].append(float(jnp.mean(v)))

    small = {}
    for k, v in per_traj.items():
        small[f"val/{k}"] = float(np.mean(v))
    for k, v in per_traj.items():
        small[f"val/std{k}"] = float(np.std(v))
    return small
