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


def _find_native_lap() -> str | None:
    """Locate (or build) the C++ JV solver shared library.

    Two layouts: a pip install ships it as `bm2f_tpu/matching/liblap*.so`
    (built by setup.py as a plain -shared ctypes library), while a source
    checkout keeps it at `<repo>/native/lap/liblap.so` and `make`s it on
    first use."""
    import glob as _glob

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    hits = _glob.glob(os.path.join(pkg_dir, "liblap*.so"))
    if hits:
        return hits[0]
    root = os.path.dirname(os.path.dirname(pkg_dir))
    lap_dir = os.path.join(root, "native", "lap")
    path = os.path.join(lap_dir, "liblap.so")
    if not os.path.exists(path) and os.path.exists(os.path.join(lap_dir, "Makefile")):
        import subprocess

        subprocess.run(
            ["make", "-C", lap_dir], capture_output=True, check=False
        )
    return path if os.path.exists(path) else None


def _load_native_lap():
    global _LAP_LIB, _LAP_CHECKED
    if _LAP_CHECKED:
        return _LAP_LIB
    _LAP_CHECKED = True
    path = _find_native_lap()
    if path is not None:
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


@partial(jax.jit, static_argnames=("num_iters", "phases", "eps_decay"))
def auction_assign(costs: jnp.ndarray, num_iters: int = 300, phases: int = 7,
                   eps_decay: float = 5.0) -> jnp.ndarray:
    """On-device assignment via epsilon-SCALING forward auction — avoids the
    host sync entirely. costs: (B, Q, G) to MINIMIZE. Returns (B, G) int32
    column->row assignment.

    EXPERIMENTAL / demoted (round 4): on production matcher costs the ~Q-G
    identical padding columns trigger musical-chairs bidding wars that the
    tie-break perturbation and warm-started phases only mitigate, not cure —
    the result is measurably suboptimal in bounded rounds (round-2 STATUS).
    `jv_assign` is exact, on-device, and costs nothing measurable in the
    train step; it is the production path. This solver is retained only as
    a bounded-round approximate alternative (train.matcher="auction" warns).

    Epsilon scaling (Bertsekas): auction phases with geometrically
    decreasing epsilon, carrying BOTH prices and the assignment across
    phases (each phase releases only the columns violating the tighter
    eps-CS condition). The problem is squared-up first so the complete
    assignment's duality bound applies: the result is within
    Q * eps_final of optimal on benefits normalized to max column spread 1,
    i.e. exact for any realistic cost matrix (reference semantics: exact
    scipy LSA per image, matcher.py:557-559; exactness asserted against
    scipy in tests/test_matching.py). Deterministic and jit-able; any
    columns left when a phase hits num_iters take a collision-free greedy
    fill.
    """
    B, Q, G0 = costs.shape
    benefits = -costs  # auction maximizes
    # Per-column shift (assignment-invariant: every column is assigned
    # exactly once, so adding a constant per column changes the total by a
    # constant) — without it, large-constant padding columns in the matcher
    # costs dominate the normalization and the eps schedule is far too
    # coarse for the real columns' spread.
    benefits = benefits - jnp.max(benefits, axis=1, keepdims=True)
    # normalize so the eps schedule is scale-free: scale = max column spread
    scale = jnp.maximum(jnp.max(-benefits, axis=(1, 2), keepdims=True), 1e-12)
    benefits = benefits / scale
    # Square-ify: the n*eps optimality bound of an eps-CS assignment only
    # holds when every row is assigned (prices cancel in the duality
    # argument); with Q > G warm-started phases can even degrade the
    # matching. Dummy columns at uniform below-minimum benefit soak up the
    # leftover rows without stealing contested ones.
    G = Q
    if G0 < Q:
        floor = jnp.min(benefits, axis=(1, 2), keepdims=True) - 0.1
        benefits = jnp.concatenate(
            [benefits, jnp.broadcast_to(floor, (B, Q, Q - G0))], axis=2
        )
    # Deterministic tie-break perturbation: identical columns (the matcher
    # pads unused targets with one constant cost) otherwise all bid for the
    # SAME argmax row every round — one assignment per round, an O(#padding)
    # bidding war. Distinct sub-eps preferences spread them in parallel;
    # the 1e-6 amplitude is far below any real cost gap, so exactness on
    # the real columns is unaffected.
    qg = (
        jax.lax.broadcasted_iota(jnp.int32, (Q, G), 0) * 1103515245
        + jax.lax.broadcasted_iota(jnp.int32, (Q, G), 1) * 12345
    ) % 1024
    benefits = benefits + (qg.astype(benefits.dtype) / 1024.0) * 1e-6
    def body(state, _):
        price, owner, eps = state  # price (B, Q); owner (B, G); eps scalar

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
        return (price, owner, eps), None

    def phase(carry, eps):
        price, owner = carry
        # Phase transition KEEPS the assignment and releases only columns
        # violating the new, tighter eps-CS condition. (Resetting all owners
        # instead lets stale price inflation lock rows away from the real
        # columns AND restarts the padding columns' musical-chairs bidding
        # war every phase — measured thousands of wasted rounds and a
        # badly suboptimal final matching.)
        value = benefits - price[:, :, None]
        best = jnp.max(value, axis=1)  # (B, G)
        cur = jnp.take_along_axis(
            value, jnp.maximum(owner, 0)[:, None, :], axis=1
        )[:, 0]  # (B, G) value of the currently owned row
        keep = (owner >= 0) & (cur >= best - eps * 1.000001)
        owner = jnp.where(keep, owner, -1)

        # early-exit while_loop: warm-started phases typically release and
        # re-place only a few columns — far below the num_iters worst-case
        # bound — and the rounds are latency-bound on TPU (tiny work each)
        def cond(st):
            price_, owner_, _, it = st
            return jnp.any(owner_ < 0) & (it < num_iters)

        def step(st):
            price_, owner_, eps_, it = st
            (price_, owner_, eps_), _ = body((price_, owner_, eps_), None)
            return (price_, owner_, eps_, it + 1)

        price, owner, _, _ = jax.lax.while_loop(
            cond, step, (price, owner, eps, jnp.int32(0))
        )
        return (price, owner), None

    eps_sched = 0.25 / (eps_decay ** jnp.arange(phases, dtype=costs.dtype))
    price0 = jnp.zeros((B, Q), costs.dtype)
    owner0 = jnp.full((B, G), -1, jnp.int32)
    (price, owner), _ = jax.lax.scan(phase, (price0, owner0), eps_sched)
    owner = owner[:, :G0]  # drop dummy columns
    G = G0

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


@jax.jit
def jv_assign(costs: jnp.ndarray) -> jnp.ndarray:
    """EXACT on-device rectangular linear sum assignment: batched
    Jonker-Volgenant shortest augmenting paths under `lax.while_loop`
    (the TPU-native equivalent of the host JV solver in native/lap/lap.cpp
    and the reference's per-image scipy `linear_sum_assignment`,
    matcher.py:557-559).

    costs: (B, Q, G) float, Q >= G (pad targets with large-constant
    columns; they absorb leftover rows). Returns (B, G) int32 column->row.

    One Dijkstra per column (sequential, like every LSA algorithm), all B
    problems advanced in lockstep with per-problem done masks; each inner
    step is O(B*Q) vector work — no (B, Q, G) temporaries per round like
    the auction solver, and no epsilon approximation."""
    B, Q, G = costs.shape
    costs = costs.astype(jnp.float32)
    INF = jnp.float32(3e38)
    rows = jnp.arange(Q, dtype=jnp.int32)

    def assign_col(state, j0):
        v, row_to_col, col_to_row = state
        # cost column j0: (B, Q)
        c0 = costs[:, :, j0]
        d = c0 - v
        pred = jnp.full((B, Q), j0, jnp.int32)
        scanned = jnp.zeros((B, Q), bool)
        done = jnp.zeros((B,), bool)
        r_end = jnp.zeros((B,), jnp.int32)
        mu_end = jnp.zeros((B,), jnp.float32)

        def dij_cond(st):
            return ~jnp.all(st[3])

        def dij_body(st):
            d, pred, scanned, done, r_end, mu_end, v_ = st
            dm = jnp.where(scanned, INF, d)
            r_star = jnp.argmin(dm, axis=1).astype(jnp.int32)  # (B,)
            mu = jnp.take_along_axis(dm, r_star[:, None], axis=1)[:, 0]
            sel = (rows[None, :] == r_star[:, None]) & ~done[:, None]
            scanned = scanned | sel
            j_owner = jnp.take_along_axis(
                row_to_col, r_star[:, None], axis=1
            )[:, 0]  # (B,)
            is_free = j_owner < 0
            newly = ~done & is_free
            r_end = jnp.where(newly, r_star, r_end)
            mu_end = jnp.where(newly, mu, mu_end)
            done_next = done | is_free
            # relax through the owning column j (only for still-active
            # problems): nd[r] = mu + (cost[r, j] - v[r]) - (cost[r*, j] - v[r*])
            jc = jnp.take_along_axis(
                costs, jnp.maximum(j_owner, 0)[:, None, None], axis=2
            )[:, :, 0]  # (B, Q)
            pivot = jnp.take_along_axis(jc - v_, r_star[:, None], axis=1)[:, 0]
            nd = mu[:, None] + (jc - v_) - pivot[:, None]
            improve = (~done_next[:, None]) & (~scanned) & (nd < d)
            d = jnp.where(improve, nd, d)
            pred = jnp.where(improve, j_owner[:, None], pred)
            return (d, pred, scanned, done_next, r_end, mu_end, v_)

        d, pred, scanned, done, r_end, mu_end, v = jax.lax.while_loop(
            dij_cond, dij_body, (d, pred, scanned, done, r_end, mu_end, v)
        )

        # dual update over finalized rows (r_end's d == mu_end: no-op there)
        v = jnp.where(scanned, v + jnp.minimum(d - mu_end[:, None], 0.0), v)

        # augment: walk pred back to j0, flipping assignments
        def aug_cond(st):
            return jnp.any(st[3])

        def aug_body(st):
            row_to_col, col_to_row, r, active = st
            j = jnp.take_along_axis(pred, r[:, None], axis=1)[:, 0]
            old_r = jnp.take_along_axis(
                col_to_row, j[:, None], axis=1
            )[:, 0]
            sel_r = (rows[None, :] == r[:, None]) & active[:, None]
            row_to_col = jnp.where(sel_r, j[:, None], row_to_col)
            cols = jnp.arange(G, dtype=jnp.int32)
            sel_c = (cols[None, :] == j[:, None]) & active[:, None]
            col_to_row = jnp.where(sel_c, r[:, None], col_to_row)
            active = active & (j != j0)
            r = jnp.where(active, old_r, r)
            return (row_to_col, col_to_row, r, active)

        row_to_col, col_to_row, _, _ = jax.lax.while_loop(
            aug_cond, aug_body,
            (row_to_col, col_to_row, r_end, jnp.ones((B,), bool)),
        )
        return (v, row_to_col, col_to_row), None

    v0 = jnp.zeros((B, Q), jnp.float32)
    r2c0 = jnp.full((B, Q), -1, jnp.int32)
    c2r0 = jnp.full((B, G), -1, jnp.int32)
    (v, r2c, c2r), _ = jax.lax.scan(
        assign_col, (v0, r2c0, c2r0), jnp.arange(G, dtype=jnp.int32)
    )
    return c2r


def make_jv_assign_fn():
    """Fully on-device EXACT assignment (no host callback): batched JV."""

    def fn(costs4):
        B, L, Q, G = costs4.shape
        out = jv_assign(costs4.reshape(B * L, Q, G))
        return out.reshape(B, L, G)

    return fn


def make_auction_assign_fn(num_iters: int = 300):
    """Fully on-device assignment (no host callback): epsilon-scaling
    auction, exact on tested matcher-cost distributions (see
    tests/test_matching.py) with the default schedule."""

    def fn(costs4):
        B, L, Q, G = costs4.shape
        out = auction_assign(costs4.reshape(B * L, Q, G), num_iters=num_iters)
        return out.reshape(B, L, G)

    return fn
