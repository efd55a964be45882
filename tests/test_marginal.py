"""graph/marginal.py — the (yaw,x,y) chain-marginal GPS gate.

The recursion must equal the exact marginal of the latest pose in the
linearized chain graph (prior + between factors + unary GPS factors),
which is what the reference reads off iSAM2 (mapOptmization.cpp:1416).
"""

import numpy as np
import pytest

from liorf_tpu.graph import marginal


def _brute_force_marginal(steps, gps_events):
    """Full-graph information-matrix marginal of the last state.

    steps: list of (yaw_prev, delta_local[3], F) per between factor.
    gps_events: dict step_index -> (var_x, var_y) applied AFTER that step.
    """
    n = len(steps) + 1
    dim = 3 * n
    Lam = np.zeros((dim, dim))
    Lam[:3, :3] = np.linalg.inv(np.diag(marginal.PRIOR_VAR))
    Qinv = np.linalg.inv(np.diag(marginal.STEP_VAR))
    for i, (F,) in enumerate(steps):
        # error model: e = s_{i+1} - F s_i, covariance Q
        J = np.zeros((3, dim))
        J[:, 3 * i : 3 * i + 3] = -F
        J[:, 3 * (i + 1) : 3 * (i + 1) + 3] = np.eye(3)
        Lam += J.T @ Qinv @ J
        if i in gps_events:
            vx, vy = gps_events[i]
            H = np.zeros((2, dim))
            H[0, 3 * (i + 1) + 1] = 1.0
            H[1, 3 * (i + 1) + 2] = 1.0
            Lam += H.T @ np.diag([1.0 / vx, 1.0 / vy]) @ H
    cov = np.linalg.inv(Lam)
    return cov[3 * (n - 1) :, 3 * (n - 1) :]


def _jacobian(yaw, delta_local):
    c, s = np.cos(yaw), np.sin(yaw)
    dxw = c * delta_local[1] - s * delta_local[2]
    dyw = s * delta_local[1] + c * delta_local[2]
    F = np.eye(3)
    F[1, 0] = -dyw
    F[2, 0] = dxw
    return F


def test_matches_exact_chain_marginal():
    rng = np.random.default_rng(3)
    P = marginal.initial_cov(np).astype(np.float64)
    yaw = 0.0
    steps = []
    gps_events = {}
    for i in range(40):
        delta = np.array([rng.normal(0, 0.05), 1.0 + rng.normal(0, 0.1),
                          rng.normal(0, 0.1)])
        F = _jacobian(yaw, delta)
        steps.append((F,))
        P = marginal.propagate(P, yaw, delta, np)
        yaw += delta[0]
        if i in (5, 23):
            gps_events[i] = (1.0, 2.0)
            P = marginal.gps_update(P, 1.0, 2.0, np)
    exact = _brute_force_marginal(steps, gps_events)
    np.testing.assert_allclose(P, exact, rtol=1e-5, atol=1e-8)


def test_gate_semantics():
    thr = 25.0
    step = np.array([0.0, 1.0, 0.0])
    P = marginal.initial_cov(np).astype(np.float64)
    # unanchored: gate open (prior position variance >> threshold)
    assert bool(marginal.gate_open(P, thr))
    # one GPS fix collapses x/y, but heading is still unknown (yaw var
    # ~pi^2), so rotation leverage re-opens the gate within a few meters —
    # the early-trajectory GPS burst the reference also exhibits
    P = marginal.gps_update(P, 1.0, 1.0, np)
    assert P[1, 1] < 2.0 and P[2, 2] < 2.0
    assert not bool(marginal.gate_open(P, thr))
    # drive straight at 1 m keyframes with GPS available (5 m spacing rule)
    accepted = 0
    x, last_fix = 0.0, 0.0
    for _ in range(200):
        P = marginal.propagate(P, 0.0, step, np)
        x += 1.0
        if bool(marginal.gate_open(P, thr)) and x - last_fix >= 5.0:
            P = marginal.gps_update(P, 1.0, 1.0, np)
            accepted += 1
            last_fix = x
    assert accepted >= 2, "no early GPS burst"
    # the fixes observe heading through the yaw/position cross-covariance
    assert P[0, 0] < 0.1, P[0, 0]
    assert not bool(marginal.gate_open(P, thr))
    # with GPS gone, accumulated gyro drift eventually re-opens the gate
    # (position var ~ 1e-6 * d^3 / 3 => ~420 m), not immediately
    steps = 0
    while not bool(marginal.gate_open(P, thr)) and steps < 50000:
        P = marginal.propagate(P, 0.0, step, np)
        steps += 1
    assert bool(marginal.gate_open(P, thr)), "gate never re-opened"
    assert 100 < steps < 5000, steps


def test_jnp_matches_numpy():
    import jax.numpy as jnp

    P_np = marginal.initial_cov(np).astype(np.float64)
    P_j = marginal.initial_cov(jnp)
    for i in range(10):
        delta = np.array([0.01, 1.0, 0.2], np.float64)
        P_np = marginal.propagate(P_np, 0.3, delta, np)
        P_j = marginal.propagate(P_j, jnp.asarray(0.3), jnp.asarray(delta, jnp.float32), jnp)
        if i == 4:
            P_np = marginal.gps_update(P_np, 1.0, 1.0, np)
            P_j = marginal.gps_update(
                P_j, jnp.asarray(1.0), jnp.asarray(1.0), jnp
            )
    np.testing.assert_allclose(np.asarray(P_j), P_np, rtol=2e-3, atol=1e-2)
