"""Linear sum assignment for Hungarian matching.

The reference calls scipy `linear_sum_assignment` once per image per decoder
layer, each a device->host sync (reference: matcher.py:557-559 — SURVEY.md
hard-part #3). Here the costs for ALL layers and images are computed on
device and shipped through ONE `jax.pure_callback` per step; the host solves
the small (Q x G) problems with the native C++ Jonker-Volgenant solver
(native/lap/lap.cpp, loaded via ctypes) and falls back to scipy if the
shared library has not been built.

An on-device auction-algorithm solver (no host roundtrip) is provided as
`auction_assign` for throughput-critical training; it produces an
epsilon-optimal assignment which is exact for cost gaps > epsilon.
"""

from __future__ import annotations

import ctypes
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LAP_LIB = None
_LAP_CHECKED = False


def _load_native_lap():
    global _LAP_LIB, _LAP_CHECKED
    if _LAP_CHECKED:
        return _LAP_LIB
    _LAP_CHECKED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lap_dir = os.path.join(here, "native", "lap")
    path = os.path.join(lap_dir, "liblap.so")
    if not os.path.exists(path) and os.path.exists(os.path.join(lap_dir, "Makefile")):
        import subprocess

        subprocess.run(
            ["make", "-C", lap_dir], capture_output=True, check=False
        )
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.solve_lap_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # costs (B, Q, G)
            ctypes.c_int,  # B
            ctypes.c_int,  # Q (rows)
            ctypes.c_int,  # G (cols)
            ctypes.POINTER(ctypes.c_int),  # out col->row (B, G)
        ]
        lib.solve_lap_batch.restype = None
        _LAP_LIB = lib
    return _LAP_LIB


def _solve_host(costs: np.ndarray) -> np.ndarray:
    """costs: (..., Q, G) float32, Q >= G. Returns (..., G) int32: for every
    column (target) the assigned row (query)."""
    lead = costs.shape[:-2]
    Q, G = costs.shape[-2:]
    costs = np.ascontiguousarray(costs, dtype=np.float32).reshape(-1, Q, G)
    B = costs.shape[0]
    lib = _load_native_lap()
    if lib is not None:
        out = np.empty((B, G), dtype=np.int32)
        lib.solve_lap_batch(
            costs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            B,
            Q,
            G,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out.reshape(*lead, G)
    from scipy.optimize import linear_sum_assignment

    out = np.empty((B, G), dtype=np.int32)
    for b in range(B):
        rows, cols = linear_sum_assignment(costs[b])
        inv = np.empty(G, dtype=np.int32)
        inv[cols] = rows
        out[b] = inv
    return out.reshape(*lead, G)


def hungarian_assign(costs: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular LSA via a single host callback.

    costs: (B, Q, G) with Q >= G (pad targets; give padding columns a large
    constant cost so they soak up arbitrary leftover queries).
    Returns (B, G) int32 mapping each target column to its query row.
    """
    B, Q, G = costs.shape
    return jax.pure_callback(
        _solve_host,
        jax.ShapeDtypeStruct((B, G), jnp.int32),
        costs.astype(jnp.float32),
        vmap_method="expand_dims",
    )


@partial(jax.jit, static_argnames=("num_iters",))
def auction_assign(costs: jnp.ndarray, num_iters: int = 200) -> jnp.ndarray:
    """On-device epsilon-optimal assignment (forward auction, fixed epsilon
    schedule) — avoids the host sync entirely. costs: (B, Q, G) to MINIMIZE.
    Returns (B, G) int32 column->row assignment.

    Deterministic and jit-able: runs a fixed number of bidding rounds; any
    unassigned columns at the end take their argmin row greedily (rare for
    well-separated costs).
    """
    B, Q, G = costs.shape
    benefits = -costs  # auction maximizes
    eps = 1.0 / (G + 1)

    def body(state, _):
        price, owner = state  # price (B, Q); owner (B, G) int32 (-1 unassigned)

        # each unassigned column bids for its best row
        value = benefits - price[:, :, None]  # (B, Q, G)
        best = jnp.max(value, axis=1)
        best_row = jnp.argmax(value, axis=1).astype(jnp.int32)  # (B, G)
        # second-best value for the bid increment
        row_onehot = jax.nn.one_hot(best_row, Q, axis=1, dtype=bool)  # (B, Q, G)
        masked = jnp.where(row_onehot, -jnp.inf, value)
        second = jnp.max(masked, axis=1)
        second = jnp.where(jnp.isfinite(second), second, best - 1.0)
        bid = best - second + eps  # (B, G)

        unassigned = owner < 0
        # highest bid per row wins; each column bids on exactly ONE row, so
        # a column wins iff it is the argmax bidder of its own best row.
        bid_matrix = jnp.where(
            unassigned[:, None, :] & row_onehot, bid[:, None, :], -jnp.inf
        )  # (B, Q, G)
        win_col = jnp.argmax(bid_matrix, axis=2).astype(jnp.int32)  # (B, Q)
        win_bid = jnp.max(bid_matrix, axis=2)
        row_has_bid = jnp.isfinite(win_bid)

        price = jnp.where(row_has_bid, price + jnp.maximum(win_bid, eps), price)
        # evict any column whose owned row was re-won this round
        evicted = (owner >= 0) & jnp.take_along_axis(
            row_has_bid, jnp.maximum(owner, 0), axis=1
        )
        owner = jnp.where(evicted, -1, owner)
        # assign winning columns (gather-side check; no scatter collisions)
        col_ids = jnp.arange(G, dtype=jnp.int32)[None, :]
        col_won = (
            unassigned
            & jnp.take_along_axis(row_has_bid, best_row, axis=1)
            & (jnp.take_along_axis(win_col, best_row, axis=1) == col_ids)
        )
        owner = jnp.where(col_won, best_row, owner)
        return (price, owner), None

    price0 = jnp.zeros((B, Q), costs.dtype)
    owner0 = jnp.full((B, G), -1, jnp.int32)
    (price, owner), _ = jax.lax.scan(body, (price0, owner0), None, length=num_iters)

    # Collision-free greedy fill for any stragglers: sequential over columns,
    # each unassigned column takes its cheapest row NOT already owned — a
    # shared-argmin fallback could hand one row to several columns, breaking
    # the one-to-one contract the criterion's scatter relies on.
    taken = jnp.any(
        jax.nn.one_hot(jnp.maximum(owner, 0), Q, dtype=bool)
        & (owner >= 0)[..., None],
        axis=1,
    )  # (B, Q)

    def fill(carry, col):
        owner, taken = carry
        cost_col, g = col  # (B, Q), scalar
        need = owner[:, g] < 0  # (B,)
        masked = jnp.where(taken, jnp.inf, cost_col)
        row = jnp.argmin(masked, axis=1).astype(jnp.int32)  # (B,)
        owner = owner.at[:, g].set(jnp.where(need, row, owner[:, g]))
        taken = taken | (need[:, None] & jax.nn.one_hot(row, Q, dtype=bool))
        return (owner, taken), None

    (owner, _), _ = jax.lax.scan(
        fill,
        (owner, taken),
        (costs.transpose(2, 0, 1), jnp.arange(G, dtype=jnp.int32)),
    )
    return owner


def assign_fn_default(costs4: jnp.ndarray) -> jnp.ndarray:
    """(B, L, Q, G) -> (B, L, G) via one host callback (single-device path)."""
    B, L, Q, G = costs4.shape
    out = hungarian_assign(costs4.reshape(B * L, Q, G))
    return out.reshape(B, L, G)


def make_sharded_assign_fn(mesh, axis: str = "data"):
    """shard_map-wrapped LSA: each data shard ships only ITS images' cost
    matrices to its host callback — the SPMD analogue of the reference's
    per-rank scipy matching under DDP. Avoids the cross-device resharding
    deadlock of a global callback inside an 8-way jit."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(costs4):
        B, L, Q, G = costs4.shape
        out = hungarian_assign(costs4.reshape(B * L, Q, G))
        return out.reshape(B, L, G)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    )


def make_auction_assign_fn(num_iters: int = 200):
    """Fully on-device epsilon-optimal assignment (no host callback)."""

    def fn(costs4):
        B, L, Q, G = costs4.shape
        out = auction_assign(costs4.reshape(B * L, Q, G), num_iters=num_iters)
        return out.reshape(B, L, G)

    return fn
