"""Rank-ordered prefix damage without a sort.

The attack phase needs, for every attacker i, the damage its target t has
already received from attackers of t earlier in the (random) priority order
(reference semantics: attacks execute in a Fisher-Yates-shuffled order,
src/gridworld/GridWorld.cc:464-468, and an attack on an already-dead target
is a no-op, Map.cc:209-310).

Round 1 computed this with an 8-operand ``lax.sort`` + segmented cumsums
(~2.0 ms/step at battle scale: the bitonic network is stage-latency-bound).
This kernel instead evaluates the O(A^2) pairwise formulation directly on the
VPU::

    P_j = sum_i [tgt_i == tgt_j and rank_i < rank_j] * dmg_i

which is ~5 vector ops per pair — at A=2048, B=16 that is ~67M pairs,
far less wall time than the sort's ~66 bitonic stages, and every downstream
attacker-side quantity (killer identity, acted mask, kill rewards) becomes
elementwise.  Per-target damage then needs only ONE 1-wide scatter-max
(``D_t = max over acted attackers of cumulative damage``), replacing the
sort path's segment-end scatters.

Quadratic cost bounds its use to ``A <= QUAD_MAX_AGENTS``; larger worlds
keep the sort path (see :mod:`magent_tpu.core.engine`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .window_gather import supports_pallas  # noqa: F401  (re-export)

# above this capacity the O(A^2) pair count loses to the O(A log^2 A) sort
QUAD_MAX_AGENTS = 8192

_TI = 256  # i-chunk (sublane axis, multiple of 8)
_TJ = 512  # j-tile (lane axis, multiple of 128)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_rank(bits: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """Pack random bits + slot index into one strictly-ordering int32 key.

    The high bits are random (uniform priority), the low bits the slot index
    (deterministic tie-break), giving a strict total order that matches a
    uniform shuffle up to ~2^-18 tie probability per pair.
    """
    slot_bits = max(1, (n_slots - 1).bit_length())
    assert slot_bits <= 16, n_slots
    rand_bits = 31 - slot_bits
    slot = jnp.arange(n_slots, dtype=jnp.uint32)
    return (((bits >> (32 - rand_bits)) << slot_bits) | slot).astype(jnp.int32)


def rank_prefix_xla(tgt, rank, dmg, hp=None):
    """Reference XLA path (CPU tests / non-TPU): materializes the pair mask
    — O(A^2) memory, fine at test scales."""
    same = tgt[..., :, None] == tgt[..., None, :]
    lower = rank[..., :, None] < rank[..., None, :]
    m = (same & lower).astype(dmg.dtype)
    P = jnp.einsum("...ij,...i->...j", m, dmg)
    if hp is None:
        return P
    A = tgt.shape[-1]
    slots = jnp.arange(A, dtype=tgt.dtype)
    sel = (slots[:, None] == tgt[..., None, :]).astype(hp.dtype)
    hp_t = jnp.einsum("...ij,...i->...j", sel, hp)
    return P, hp_t


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank_prefix_tpu(tgt, rank, dmg, hp=None, *, interpret=False):
    """Pallas pairwise prefix kernel (single env; vmap for batches).

    tgt:  [A] int32 — target slot per attacker (sentinel >= A for
          non-attackers; sentinel rows accumulate garbage that callers mask).
    rank: [A] int32 — strict total priority order (see :func:`pack_rank`).
    dmg:  [A] f32   — damage per attacker (0 where invalid).
    hp:   optional [A] f32 — when given, the same pair sweep also picks up
          each attacker's target hp (``hp[tgt_j]``), replacing a 32k-index
          row gather (~0.3 ms/step at battle scale) with ~3 extra vector
          ops per pair.

    Returns P [A] f32, or (P, hp_t) when ``hp`` is given (hp_t is 0 for
    sentinel targets — callers mask).
    """
    from jax.experimental import pallas as pl

    (A,) = tgt.shape
    Ap = _ceil_to(A, max(_TI, _TJ))
    want_hp = hp is not None
    if Ap != A:
        # sentinel-pad: padded i-rows carry dmg 0 (no contribution); padded
        # j-columns are sliced off
        tgt = jnp.pad(tgt, (0, Ap - A), constant_values=jnp.int32(2**30))
        rank = jnp.pad(rank, (0, Ap - A))
        dmg = jnp.pad(dmg, (0, Ap - A))
        if want_hp:
            hp = jnp.pad(hp, (0, Ap - A))
    n_i = Ap // _TI

    # column (i) operands live with A on sublanes; row (j) operands with A
    # on lanes — two layouts of the same tiny arrays, so the kernel never
    # transposes
    tgt_col = tgt[:, None]
    rank_col = rank[:, None]
    dmg_col = dmg[:, None]
    tgt_row = tgt[None, :]
    rank_row = rank[None, :]

    if want_hp:
        def kernel(tc_ref, rc_ref, dc_ref, hc_ref, tr_ref, rr_ref,
                   p_ref, hpt_ref):
            tr = tr_ref[...]  # [1, TJ]
            rr = rr_ref[...]

            def body(i, carry):
                acc, hpt = carry
                sl = pl.ds(i * _TI, _TI)
                tc = tc_ref[sl, :]  # [TI, 1]
                rc = rc_ref[sl, :]
                dc = dc_ref[sl, :]
                hc = hc_ref[sl, :]
                slot_col = (
                    jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + i * _TI
                )
                m = (tc == tr) & (rc < rr)  # [TI, TJ]
                acc = acc + jnp.sum(jnp.where(m, dc, 0.0), axis=0,
                                    keepdims=True)
                hpt = hpt + jnp.sum(
                    jnp.where(slot_col == tr, hc, 0.0), axis=0, keepdims=True)
                return acc, hpt

            acc, hpt = jax.lax.fori_loop(
                0, n_i, body,
                (jnp.zeros((1, _TJ), jnp.float32),
                 jnp.zeros((1, _TJ), jnp.float32)),
                unroll=n_i,
            )
            p_ref[...] = acc
            hpt_ref[...] = hpt

        P, hp_t = pl.pallas_call(
            kernel,
            grid=(Ap // _TJ,),
            in_specs=[
                pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
                pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
                pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
                pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
                pl.BlockSpec((1, _TJ), lambda j: (0, j)),
                pl.BlockSpec((1, _TJ), lambda j: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, _TJ), lambda j: (0, j)),
                pl.BlockSpec((1, _TJ), lambda j: (0, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, Ap), jnp.float32),
                jax.ShapeDtypeStruct((1, Ap), jnp.float32),
            ],
            interpret=interpret,
        )(tgt_col, rank_col, dmg_col, hp[:, None], tgt_row, rank_row)
        return P[0, :A], hp_t[0, :A]

    def kernel(tc_ref, rc_ref, dc_ref, tr_ref, rr_ref, out_ref):
        tr = tr_ref[...]  # [1, TJ]
        rr = rr_ref[...]

        def body(i, acc):
            sl = pl.ds(i * _TI, _TI)
            tc = tc_ref[sl, :]  # [TI, 1]
            rc = rc_ref[sl, :]
            dc = dc_ref[sl, :]
            m = (tc == tr) & (rc < rr)  # [TI, TJ]
            return acc + jnp.sum(jnp.where(m, dc, 0.0), axis=0, keepdims=True)

        acc = jax.lax.fori_loop(
            0, n_i, body, jnp.zeros((1, _TJ), jnp.float32), unroll=n_i
        )
        out_ref[...] = acc

    out = pl.pallas_call(
        kernel,
        grid=(Ap // _TJ,),
        in_specs=[
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((1, Ap), jnp.float32),
        interpret=interpret,
    )(tgt_col, rank_col, dmg_col, tgt_row, rank_row)
    return out[0, :A]


def rank_prefix(tgt, rank, dmg, hp=None, *, interpret=False):
    """Dispatch: Pallas on TPU, einsum elsewhere.  Single env [A] arrays."""
    if supports_pallas() or interpret:
        return rank_prefix_tpu(tgt, rank, dmg, hp, interpret=interpret)
    return rank_prefix_xla(tgt, rank, dmg, hp)


# --------------------------------------------------------- move-claim kernel
def move_claims_xla(tcell):
    """Pairwise fallback: (count of lower-slot same-cell movers, min slot
    with the same cell).  O(A^2) memory — test scales only."""
    A = tcell.shape[-1]
    slots = jnp.arange(A, dtype=jnp.int32)
    same = tcell[..., :, None] == tcell[..., None, :]
    lower = slots[:, None] < slots[None, :]
    cnt = jnp.sum((same & lower).astype(jnp.int32), axis=-2)
    head = jnp.min(jnp.where(same, slots[:, None], A), axis=-2)
    return cnt, head


@functools.partial(jax.jit, static_argnames=("interpret",))
def move_claims_tpu(tcell, *, interpret=False):
    """Move-contention arbitration without a sort (single env; vmap for
    batches).

    The reference executes moves in buffer order, so the first mover into a
    contested cell wins (reference: GridWorld.cc:573-613); the fast engine's
    deterministic equivalent is lowest-slot-wins.  For every slot j this
    kernel returns:

    - ``cnt[j]``: number of lower-slot movers targeting the same cell
      (0 = j wins its claim);
    - ``head[j]``: the lowest slot targeting the same cell (the winner a
      loser collides with).

    ``tcell`` is the flat target cell per slot with one shared sentinel for
    non-movers (callers mask non-mover outputs).
    """
    from jax.experimental import pallas as pl

    (A,) = tcell.shape
    Ap = _ceil_to(A, max(_TI, _TJ))
    if Ap != A:
        tcell = jnp.pad(tcell, (0, Ap - A), constant_values=jnp.int32(2**30))
    n_i = Ap // _TI

    tc_col = tcell[:, None]
    tc_row = tcell[None, :]

    def kernel(tc_col_ref, tc_row_ref, cnt_ref, head_ref):
        tr = tc_row_ref[...]  # [1, TJ]
        j0 = pl.program_id(0) * _TJ
        slot_row = jax.lax.broadcasted_iota(jnp.int32, (1, _TJ), 1) + j0

        def body(i, carry):
            cnt, head = carry
            sl = pl.ds(i * _TI, _TI)
            tc = tc_col_ref[sl, :]  # [TI, 1]
            slot_col = (
                jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + i * _TI
            )
            same = tc == tr  # [TI, TJ]
            cnt = cnt + jnp.sum(
                (same & (slot_col < slot_row)).astype(jnp.int32),
                axis=0, keepdims=True)
            head = jnp.minimum(
                head,
                jnp.min(jnp.where(same, slot_col, 2**30), axis=0,
                        keepdims=True))
            return cnt, head

        cnt, head = jax.lax.fori_loop(
            0, n_i, body,
            (jnp.zeros((1, _TJ), jnp.int32),
             jnp.full((1, _TJ), 2**30, jnp.int32)),
            unroll=n_i,
        )
        cnt_ref[...] = cnt
        head_ref[...] = head

    cnt, head = pl.pallas_call(
        kernel,
        grid=(Ap // _TJ,),
        in_specs=[
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Ap), jnp.int32),
            jax.ShapeDtypeStruct((1, Ap), jnp.int32),
        ],
        interpret=interpret,
    )(tc_col, tc_row)
    return cnt[0, :A], head[0, :A]


def move_claims(tcell, *, interpret=False):
    """Dispatch: Pallas on TPU, pairwise XLA elsewhere."""
    if supports_pallas() or interpret:
        return move_claims_tpu(tcell, interpret=interpret)
    return move_claims_xla(tcell)


# --------------------------------------------------------- gridless kernels
# Occupancy grids cost one ~0.3ms scatter or gather per touch at battle
# scale; for 1x1 bodies the same questions ("who is on cell c?") are pairwise
# over agents, so the gridless engine path answers them inside the pair
# sweeps and never maintains the grid at all.

def occupant_xla(acell, cell, hp):
    """(slot occupying acell_j or -1, its hp).  Cells are unique per agent
    (1x1 bodies), so sums over the match mask recover the occupant."""
    A = acell.shape[-1]
    slots = jnp.arange(A, dtype=jnp.int32)
    m = cell[..., :, None] == acell[..., None, :]
    cnt = jnp.sum(m, axis=-2)
    slot_sum = jnp.einsum("...ij,...i->...j", m.astype(jnp.int32), slots)
    hp_sum = jnp.einsum("...ij,...i->...j", m.astype(hp.dtype), hp)
    return jnp.where(cnt > 0, slot_sum, -1), hp_sum


@functools.partial(jax.jit, static_argnames=("interpret",))
def occupant_tpu(acell, cell, hp, *, interpret=False):
    """Pairwise occupant lookup (single env; vmap for batches).

    acell: [A] int32 — queried cell per agent (large sentinel when not
           querying); cell: [A] int32 — each agent's own cell (a DIFFERENT
           sentinel when dead); hp: [A] f32.
    Returns (tgt [A] int32 — occupant slot or -1, hp_t [A] f32 — its hp).
    """
    from jax.experimental import pallas as pl

    (A,) = acell.shape
    Ap = _ceil_to(A, max(_TI, _TJ))
    if Ap != A:
        acell = jnp.pad(acell, (0, Ap - A), constant_values=jnp.int32(2**30))
        cell = jnp.pad(cell, (0, Ap - A), constant_values=jnp.int32(2**29))
        hp = jnp.pad(hp, (0, Ap - A))
    n_i = Ap // _TI

    def kernel(cc_ref, hc_ref, ar_ref, tgt_ref, hpt_ref):
        ar = ar_ref[...]  # [1, TJ]

        def body(i, carry):
            cnt, ssum, hsum = carry
            sl = pl.ds(i * _TI, _TI)
            cc = cc_ref[sl, :]
            hc = hc_ref[sl, :]
            slot_col = (
                jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + i * _TI
            )
            m = cc == ar  # [TI, TJ]
            cnt = cnt + jnp.sum(m.astype(jnp.int32), axis=0, keepdims=True)
            ssum = ssum + jnp.sum(jnp.where(m, slot_col, 0), axis=0,
                                  keepdims=True)
            hsum = hsum + jnp.sum(jnp.where(m, hc, 0.0), axis=0,
                                  keepdims=True)
            return cnt, ssum, hsum

        cnt, ssum, hsum = jax.lax.fori_loop(
            0, n_i, body,
            (jnp.zeros((1, _TJ), jnp.int32), jnp.zeros((1, _TJ), jnp.int32),
             jnp.zeros((1, _TJ), jnp.float32)),
            unroll=n_i,
        )
        tgt_ref[...] = jnp.where(cnt > 0, ssum, -1)
        hpt_ref[...] = hsum

    tgt, hp_t = pl.pallas_call(
        kernel,
        grid=(Ap // _TJ,),
        in_specs=[
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Ap), jnp.int32),
            jax.ShapeDtypeStruct((1, Ap), jnp.float32),
        ],
        interpret=interpret,
    )(cell[:, None], hp[:, None], acell[None, :])
    return tgt[0, :A], hp_t[0, :A]


def occupant(acell, cell, hp, *, interpret=False):
    if supports_pallas() or interpret:
        return occupant_tpu(acell, cell, hp, interpret=interpret)
    return occupant_xla(acell, cell, hp)


def move_resolve_xla(tcell, cell):
    """(lower-slot same-target count, head slot, occupant-or--1)."""
    A = tcell.shape[-1]
    slots = jnp.arange(A, dtype=jnp.int32)
    same = tcell[..., :, None] == tcell[..., None, :]
    lower = slots[:, None] < slots[None, :]
    cnt = jnp.sum((same & lower).astype(jnp.int32), axis=-2)
    head = jnp.min(jnp.where(same, slots[:, None], A), axis=-2)
    occ_m = (cell[..., :, None] == tcell[..., None, :]) & (
        slots[:, None] != slots[None, :]
    )
    occ_cnt = jnp.sum(occ_m, axis=-2)
    occ_sum = jnp.einsum("...ij,...i->...j", occ_m.astype(jnp.int32), slots)
    return cnt, head, jnp.where(occ_cnt > 0, occ_sum, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def move_resolve_tpu(tcell, cell, *, interpret=False):
    """Gridless move arbitration: claims + blocking occupant in one pair
    sweep (single env; vmap for batches).

    tcell: [A] int32 — target cell per mover (sentinel A for non-movers);
    cell:  [A] int32 — each live agent's current cell (a different sentinel
           when dead).
    Returns (cnt [A] — lower-slot contenders, head [A] — lowest contender
    slot, occ [A] — blocking agent slot or -1).
    """
    from jax.experimental import pallas as pl

    (A,) = tcell.shape
    Ap = _ceil_to(A, max(_TI, _TJ))
    if Ap != A:
        tcell = jnp.pad(tcell, (0, Ap - A), constant_values=jnp.int32(2**30))
        cell = jnp.pad(cell, (0, Ap - A), constant_values=jnp.int32(2**29))
    n_i = Ap // _TI

    def kernel(tc_col_ref, c_col_ref, tc_row_ref, cnt_ref, head_ref, occ_ref):
        tr = tc_row_ref[...]  # [1, TJ]
        j0 = pl.program_id(0) * _TJ
        slot_row = jax.lax.broadcasted_iota(jnp.int32, (1, _TJ), 1) + j0

        def body(i, carry):
            cnt, head, ocnt, osum = carry
            sl = pl.ds(i * _TI, _TI)
            tc = tc_col_ref[sl, :]
            cc = c_col_ref[sl, :]
            slot_col = (
                jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + i * _TI
            )
            same = tc == tr
            cnt = cnt + jnp.sum(
                (same & (slot_col < slot_row)).astype(jnp.int32),
                axis=0, keepdims=True)
            head = jnp.minimum(
                head,
                jnp.min(jnp.where(same, slot_col, 2**30), axis=0,
                        keepdims=True))
            om = (cc == tr) & (slot_col != slot_row)
            ocnt = ocnt + jnp.sum(om.astype(jnp.int32), axis=0, keepdims=True)
            osum = osum + jnp.sum(jnp.where(om, slot_col, 0), axis=0,
                                  keepdims=True)
            return cnt, head, ocnt, osum

        cnt, head, ocnt, osum = jax.lax.fori_loop(
            0, n_i, body,
            (jnp.zeros((1, _TJ), jnp.int32),
             jnp.full((1, _TJ), 2**30, jnp.int32),
             jnp.zeros((1, _TJ), jnp.int32),
             jnp.zeros((1, _TJ), jnp.int32)),
            unroll=n_i,
        )
        cnt_ref[...] = cnt
        head_ref[...] = head
        occ_ref[...] = jnp.where(ocnt > 0, osum, -1)

    cnt, head, occ = pl.pallas_call(
        kernel,
        grid=(Ap // _TJ,),
        in_specs=[
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((Ap, 1), lambda j: (0, 0)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
            pl.BlockSpec((1, _TJ), lambda j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Ap), jnp.int32),
            jax.ShapeDtypeStruct((1, Ap), jnp.int32),
            jax.ShapeDtypeStruct((1, Ap), jnp.int32),
        ],
        interpret=interpret,
    )(tcell[:, None], cell[:, None], tcell[None, :])
    return cnt[0, :A], head[0, :A], occ[0, :A]


def move_resolve(tcell, cell, *, interpret=False):
    if supports_pallas() or interpret:
        return move_resolve_tpu(tcell, cell, interpret=interpret)
    return move_resolve_xla(tcell, cell)
