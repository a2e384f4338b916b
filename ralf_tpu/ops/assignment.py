"""Exact linear-sum assignment, fully jittable (no host callbacks).

The GAN reconstruction losses need a Hungarian assignment per batch row
(`rec_loss.py:18-103` uses scipy.linear_sum_assignment).  The first
rebuild routed this through `jax.pure_callback` — but the axon TPU
runtime does not implement host send/recv callbacks at all, so GAN
training crashed on real hardware.  This module implements the
Jonker-Volgenant shortest-augmenting-path algorithm (the same algorithm
scipy uses) with `lax` control flow: exact for float costs, O(n^3) with
statically bounded loops, vmapped over the batch.  At the framework's
n = max_seq_length = 10 the whole solve is microseconds of VPU work.

Reference formulation: the classic potentials version (u, v) with one
augmentation per row; every inner data-dependent scan is expressed as a
masked vector min instead of an index loop, so the only sequential
structure is the two bounded while_loops (Dijkstra steps and the
augmenting-path walk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def _lsa_one(cost: jax.Array) -> jax.Array:
    """[n, n] float cost -> col[i] = assigned column per row (exact argmin
    of sum(cost[i, col[i]]) over permutations)."""
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    # 1-based frames like the classic formulation: column 0 is virtual.
    # p[j] = row currently matched to column j (0 = none); u/v potentials.
    a = jnp.pad(cost, ((1, 0), (1, 0)))  # a[i, j], i,j in 1..n

    def augment_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), _INF)
        used = jnp.zeros((n + 1,), bool)
        way = jnp.zeros((n + 1,), jnp.int32)

        def dijkstra_cond(state):
            _, _, p_, j0, *_ = state
            return p_[j0] != 0

        def dijkstra_body(state):
            u_, v_, p_, j0, minv_, used_, way_ = state
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            cols = jnp.arange(n + 1)
            cur = a[i0] - u_[i0] - v_  # [n+1]
            # only unused real columns participate
            live = (~used_) & (cols > 0)
            better = live & (cur < minv_)
            minv_ = jnp.where(better, cur, minv_)
            way_ = jnp.where(better, j0, way_)
            masked = jnp.where(live, minv_, _INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potentials update: every used column j shifts its matched
            # row's u (scatter-add: the p_[j] are distinct rows) and its
            # own v by delta; unused columns shrink minv
            u_ = u_.at[p_].add(jnp.where(used_, delta, 0.0))
            v_ = v_ - jnp.where(used_, delta, 0.0)
            minv_ = jnp.where(used_, minv_, minv_ - delta)
            return (u_, v_, p_, j1, minv_, used_, way_)

        state = (u, v, p, jnp.int32(0), minv, used, way)
        # p[0] was just set to i != 0, so the loop body runs at least once
        u, v, p, j0, minv, used, way = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, state
        )

        def walk_cond(state):
            _, j0 = state
            return j0 != 0

        def walk_body(state):
            p_, j0 = state
            j1 = way[j0]
            p_ = p_.at[j0].set(p_[j1])
            return (p_, j1)

        p, _ = jax.lax.while_loop(walk_cond, walk_body, (p, j0))
        return (u, v, p)

    u = jnp.zeros((n + 1,), jnp.float32)
    v = jnp.zeros((n + 1,), jnp.float32)
    p = jnp.zeros((n + 1,), jnp.int32)
    u, v, p = jax.lax.fori_loop(1, n + 1, augment_row, (u, v, p))
    # p[j] = row matched to column j (1-based); invert to row -> col
    col_of_row = jnp.zeros((n,), jnp.int32)
    col_of_row = col_of_row.at[p[1:] - 1].set(jnp.arange(n, dtype=jnp.int32))
    return col_of_row


def batched_lsa(cost: jax.Array) -> jax.Array:
    """[B, n, n] float costs -> [B, n] assigned column per row, exact."""
    return jax.vmap(_lsa_one)(cost)
