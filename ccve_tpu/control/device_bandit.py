"""On-DEVICE UCB1-tuned bandit — the TPU-native dynamic-compaction tuner.

The reference's CompactTuner runs on the host between pipeline calls
(negative_feedback.hpp:165-260), timing each level's segment with host
clocks (main.cpp:143-167) — free in its synchronous single-thread world.
Through the axon relay, a host-side bandit costs one ~28 ms readback
sync per segment (measured: config 6 DYNAMIC spent 2.2 s of a 3.5 s run
on sync), and a single-dispatch executor cannot attribute one wall time
across levels at all.

This module keeps the reference's exact bandit math (UCB1-tuned variance
bonus, warm-start round-robin, EW factor capped at 15, heartbeat change
detection — control/bandit.py documents the citations) but vectorizes it
over levels in jnp so the whole select → run segment → update loop lives
INSIDE one device dispatch:

 - reward: the executor counts work-loop steps PER LEVEL (each step is a
   fixed-shape op chain, so steps ∝ device time — the quantity the
   reference's timer measured, minus the noise). Per-level step deltas
   give TRUE per-level credit, which the host timer never had.
 - zero host round trips: thresholds are lax-selected between segments
   from the carried bandit state.

State is a flat pytree of [n_levels, n_arms] arrays; all ops are
branch-free selects, so one compiled program serves every trajectory.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPSILON = 0.1
START_SAMPLING = 4
HEARTBEAT = 256
EW_CAP = 15


class DeviceBanditState(NamedTuple):
    est: jax.Array  # f32[L, A] estimated rewards
    est_sq: jax.Array  # f32[L, A]
    n_upd: jax.Array  # i32[L, A] stage update counts per arm
    t_upd: jax.Array  # i32[L] stage update totals
    n_sel: jax.Array  # i32[L, A] lifetime selects per arm
    sel_times: jax.Array  # i32[L]
    n_start: jax.Array  # i32[L] warm-start progress
    r_means: jax.Array  # f32[L, A] last-heartbeat estimates
    hb_seen: jax.Array  # i32[L] heartbeat snapshot taken yet


def init_state(n_levels: int, n_arms: int) -> DeviceBanditState:
    return DeviceBanditState(
        est=jnp.zeros((n_levels, n_arms), jnp.float32),
        est_sq=jnp.zeros((n_levels, n_arms), jnp.float32),
        n_upd=jnp.zeros((n_levels, n_arms), jnp.int32),
        t_upd=jnp.zeros((n_levels,), jnp.int32),
        n_sel=jnp.zeros((n_levels, n_arms), jnp.int32),
        sel_times=jnp.zeros((n_levels,), jnp.int32),
        n_start=jnp.zeros((n_levels,), jnp.int32),
        r_means=jnp.zeros((n_levels, n_arms), jnp.float32),
        hb_seen=jnp.zeros((n_levels,), jnp.int32),
    )


def select_arms(st: DeviceBanditState) -> tuple[jax.Array, DeviceBanditState]:
    """Per-level arm indices i32[L] (warm-start round-robin, then
    UCB1-tuned argmax — negative_feedback.hpp:34-61)."""
    L, A = st.est.shape
    warm = st.n_start < A * START_SAMPLING
    arm_warm = st.n_start % A

    t = st.t_upd.astype(jnp.float32)[:, None]
    n = st.n_upd.astype(jnp.float32) + EPSILON
    log_t = jnp.where(t > 0, jnp.log(jnp.maximum(t, 1.0)), -jnp.inf)
    var = st.est_sq - st.est * st.est + jnp.sqrt(
        jnp.maximum(2.0 * log_t / n, 0.0)
    )
    inner = log_t / n * jnp.minimum(0.25, var)
    bonus = jnp.where(
        jnp.isfinite(inner) & (inner >= 0), jnp.sqrt(jnp.abs(inner)), 0.0
    )
    arm_ucb = jnp.argmax(st.est + bonus, axis=1).astype(jnp.int32)

    arm = jnp.where(warm, arm_warm, arm_ucb)
    onehot = jax.nn.one_hot(arm, A, dtype=jnp.int32)
    return arm, st._replace(
        n_start=st.n_start + warm.astype(jnp.int32),
        sel_times=st.sel_times + 1,
        n_sel=st.n_sel + onehot,
    )


def update_arms(
    st: DeviceBanditState, arm: jax.Array, reward: jax.Array
) -> DeviceBanditState:
    """EW update + heartbeat change detection for each level's chosen
    arm (negative_feedback.hpp:67-97)."""
    L, A = st.est.shape
    onehot = jax.nn.one_hot(arm, A, dtype=jnp.float32)

    # --- heartbeat (before the update, like the reference) ------------
    at_hb = (st.sel_times % HEARTBEAT == 0) & (
        st.n_start >= A * START_SAMPLING
    )
    cur = jnp.take_along_axis(st.est, arm[:, None], axis=1)[:, 0]
    ref = jnp.take_along_axis(st.r_means, arm[:, None], axis=1)[:, 0]
    detected = at_hb & (st.hb_seen > 0) & ((cur > ref * 2) | (cur < ref / 2))
    r_means = jnp.where(at_hb[:, None], st.est, st.r_means)
    hb_seen = jnp.where(at_hb, 1, st.hb_seen)

    reset = detected[:, None]
    est = jnp.where(reset, 0.0, st.est)
    est_sq = jnp.where(reset, 0.0, st.est_sq)
    n_upd = jnp.where(reset, 0, st.n_upd)
    t_upd = jnp.where(detected, 0, st.t_upd)
    n_start = jnp.where(detected, 0, st.n_start)

    # --- EW update of the chosen arm -----------------------------------
    factor = jnp.minimum(
        jnp.take_along_axis(n_upd, arm[:, None], axis=1)[:, 0], EW_CAP
    ).astype(jnp.float32)
    ratio = factor / (factor + 1.0)
    new_est_arm = (
        jnp.take_along_axis(est, arm[:, None], axis=1)[:, 0] * ratio
        + reward * (1 - ratio)
    )
    new_sq_arm = (
        jnp.take_along_axis(est_sq, arm[:, None], axis=1)[:, 0] * ratio
        + reward * reward * (1 - ratio)
    )
    est = est * (1 - onehot) + onehot * new_est_arm[:, None]
    est_sq = est_sq * (1 - onehot) + onehot * new_sq_arm[:, None]
    onehot_i = onehot.astype(jnp.int32)
    return DeviceBanditState(
        est=est,
        est_sq=est_sq,
        n_upd=n_upd + onehot_i,
        t_upd=t_upd + 1,
        n_sel=st.n_sel,
        sel_times=st.sel_times,
        n_start=n_start,
        r_means=r_means,
        hb_seen=hb_seen,
    )
