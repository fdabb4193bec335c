"""Pairwise O(A^2) conflict-resolution kernels (no sorts, no grids).

The attack phase needs, for every attacker i, the damage its target t has
already received from attackers of t earlier in the (random) priority order
(reference semantics: attacks execute in a Fisher-Yates-shuffled order,
src/gridworld/GridWorld.cc:464-468, and an attack on an already-dead target
is a no-op, Map.cc:209-310).

Round 1 computed this with an 8-operand ``lax.sort`` + segmented cumsums
(~2.0 ms/step at battle scale: the bitonic network is stage-latency-bound).
These kernels instead evaluate pairwise formulations directly on the VPU::

    P_j = sum_i [tgt_i == tgt_j and rank_i < rank_j] * dmg_i

~5 vector ops per pair — at A=2048, B=16 that is ~67M pairs, far less wall
time than the sort's ~66 bitonic stages, and every downstream attacker-side
quantity (killer identity, acted mask, kill rewards) becomes elementwise.
The same pattern answers "who occupies cell c" (attack targets, move
blocking) and "who claims cell c first" (move contention), which lets
battle-class configs skip the occupancy grid entirely (engine.py gridless
path).

Kernel structure: the pair sweep is a 2-D Pallas grid (j-tiles x i-chunks)
with the i axis innermost, accumulating into the j-tile output block across
grid steps — column operands are (TI, 1) blocks so VMEM holds only one
chunk (a whole [A, 1] operand would tile-pad its lane dim 128x and blow the
scoped VMEM limit at large A).

Quadratic cost bounds their use to ``A <= QUAD_MAX_AGENTS``; larger worlds
keep the sort path (see :mod:`magent_tpu.core.engine`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .window_gather import supports_pallas  # noqa: F401  (re-export)

# above this capacity the O(A^2) pair count loses to the O(A log^2 A) sort.
# The crossover is BATCH-DEPENDENT: per agent-step the quad path costs O(A)
# pair work at any batch, while the sort path's fixed per-step costs
# amortize away as B*A grows — so big batches favor the sort earlier.
# Measured round 5 (walled forest): single world A=10000 quad 3.80M vs
# sort 2.71M, tie at A=16384 (results/r05_batch3.log) -> QUAD_MAX_SINGLE;
# but 64 envs x 15625 is catastrophic on quad (the sort path reads 5.67M)
# while 512 x 1953 and 16 x 6250 are quad's best points -> the batched
# bound stays at the round-2 measured 8192.
QUAD_MAX_AGENTS = 8192
QUAD_MAX_SINGLE = 16384

_TI = 512  # i-chunk (sublane axis, multiple of 8)
_TJ = 1024  # j-tile (lane axis, multiple of 128)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_rank(bits: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """Pack random bits + slot index into one strictly-ordering int32 key.

    The high bits are random (uniform priority), the low bits the slot index
    (deterministic tie-break), giving a strict total order that matches a
    uniform shuffle up to the tie probability 2^-(31 - slot_bits) per pair
    (~2^-18 at battle scale; ~2^-14 at the segmented path's 100k scale —
    a tied pair falls back to slot order, a slight bias, never an
    ill-defined order: the slot bits keep the key strict)."""
    slot_bits = max(1, (n_slots - 1).bit_length())
    assert slot_bits <= 24, n_slots
    rand_bits = 31 - slot_bits
    slot = jnp.arange(n_slots, dtype=jnp.uint32)
    return (((bits >> (32 - rand_bits)) << slot_bits) | slot).astype(jnp.int32)


def _pad_operands(A, pads):
    """Sentinel-pad 1-D operands to a (TI, TJ)-aligned length."""
    Ap = _ceil_to(A, max(_TI, _TJ))
    out = []
    for arr, fill in pads:
        if Ap != A:
            arr = jnp.pad(arr, (0, Ap - A), constant_values=fill)
        out.append(arr)
    return Ap, out


def _pair_grid_call(kernel, col_ops, row_ops, n_out, out_dtypes, Ap,
                    interpret):
    """Run a pairwise sweep: grid (j-tiles, i-chunks), i innermost, output
    blocks persistent across the i sweep (accumulation pattern)."""
    from jax.experimental import pallas as pl

    in_specs = (
        [pl.BlockSpec((_TI, 1), lambda j, i: (i, 0)) for _ in col_ops]
        + [pl.BlockSpec((1, _TJ), lambda j, i: (0, j)) for _ in row_ops]
    )
    out = pl.pallas_call(
        kernel,
        grid=(Ap // _TJ, Ap // _TI),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, _TJ), lambda j, i: (0, j))
                   for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((1, Ap), dt) for dt in out_dtypes],
        interpret=interpret,
    )(*[c[:, None] for c in col_ops], *[r[None, :] for r in row_ops])
    return out


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
          row gather (~0.3 ms/step at battle scale).

    Returns P [A] f32, or (P, hp_t) when ``hp`` is given (hp_t is 0 for
    sentinel targets — callers mask).
    """
    from jax.experimental import pallas as pl

    (A,) = tgt.shape
    want_hp = hp is not None
    pads = [(tgt, jnp.int32(2**30)), (rank, jnp.int32(0)),
            (dmg, jnp.float32(0))]
    if want_hp:
        pads.append((hp, jnp.float32(0)))
    Ap, padded = _pad_operands(A, pads)

    if want_hp:
        tgt_p, rank_p, dmg_p, hp_p = padded

        def kernel(tc_ref, rc_ref, dc_ref, hc_ref, tr_ref, rr_ref,
                   p_ref, hpt_ref):
            i = pl.program_id(1)

            @pl.when(i == 0)
            def _init():
                p_ref[...] = jnp.zeros_like(p_ref)
                hpt_ref[...] = jnp.zeros_like(hpt_ref)

            tr = tr_ref[...]
            rr = rr_ref[...]
            tc = tc_ref[...]  # [TI, 1]
            rc = rc_ref[...]
            dc = dc_ref[...]
            hc = hc_ref[...]
            slot_col = (
                jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + i * _TI
            )
            m = (tc == tr) & (rc < rr)
            p_ref[...] += jnp.sum(jnp.where(m, dc, 0.0), axis=0,
                                  keepdims=True)
            hpt_ref[...] += jnp.sum(
                jnp.where(slot_col == tr, hc, 0.0), axis=0, keepdims=True)

        P, hp_t = _pair_grid_call(
            kernel, [tgt_p, rank_p, dmg_p, hp_p], [tgt_p, rank_p],
            2, [jnp.float32, jnp.float32], Ap, interpret)
        return P[0, :A], hp_t[0, :A]

    tgt_p, rank_p, dmg_p = padded

    def kernel(tc_ref, rc_ref, dc_ref, tr_ref, rr_ref, p_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            p_ref[...] = jnp.zeros_like(p_ref)

        m = (tc_ref[...] == tr_ref[...]) & (rc_ref[...] < rr_ref[...])
        p_ref[...] += jnp.sum(jnp.where(m, dc_ref[...], 0.0), axis=0,
                              keepdims=True)

    (P,) = _pair_grid_call(kernel, [tgt_p, rank_p, dmg_p], [tgt_p, rank_p],
                           1, [jnp.float32], Ap, interpret)
    return P[0, :A]


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
    batches): per slot j, the number of lower-slot movers targeting the same
    cell (0 = j wins) and the lowest such slot (the winner a loser collides
    with).  ``tcell`` carries one shared sentinel for non-movers."""
    from jax.experimental import pallas as pl

    (A,) = tcell.shape
    Ap, (tcell_p,) = _pad_operands(A, [(tcell, jnp.int32(2**30))])

    def kernel(tc_col_ref, tc_row_ref, cnt_ref, head_ref):
        i = pl.program_id(1)
        j = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)
            head_ref[...] = jnp.full_like(head_ref, 2**30)

        tr = tc_row_ref[...]
        slot_row = jax.lax.broadcasted_iota(jnp.int32, (1, _TJ), 1) + j * _TJ
        tc = tc_col_ref[...]
        slot_col = jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + i * _TI
        same = tc == tr
        cnt_ref[...] += jnp.sum(
            (same & (slot_col < slot_row)).astype(jnp.int32),
            axis=0, keepdims=True)
        head_ref[...] = jnp.minimum(
            head_ref[...],
            jnp.min(jnp.where(same, slot_col, 2**30), axis=0, keepdims=True))

    cnt, head = _pair_grid_call(kernel, [tcell_p], [tcell_p], 2,
                                [jnp.int32, jnp.int32], Ap, interpret)
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
    Ap, (acell_p, cell_p, hp_p) = _pad_operands(
        A, [(acell, jnp.int32(2**30)), (cell, jnp.int32(2**29)),
            (hp, jnp.float32(0))])

    def kernel(cc_ref, hc_ref, ar_ref, tgt_ref, hpt_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            tgt_ref[...] = jnp.full_like(tgt_ref, -1)
            hpt_ref[...] = jnp.zeros_like(hpt_ref)

        ar = ar_ref[...]
        cc = cc_ref[...]
        hc = hc_ref[...]
        slot_col = jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + \
            pl.program_id(1) * _TI
        m = cc == ar
        hit = jnp.sum(m.astype(jnp.int32), axis=0, keepdims=True) > 0
        ssum = jnp.sum(jnp.where(m, slot_col, 0), axis=0, keepdims=True)
        tgt_ref[...] = jnp.where(hit, ssum, tgt_ref[...])
        hpt_ref[...] += jnp.sum(jnp.where(m, hc, 0.0), axis=0, keepdims=True)

    tgt, hp_t = _pair_grid_call(kernel, [cell_p, hp_p], [acell_p], 2,
                                [jnp.int32, jnp.float32], Ap, interpret)
    return tgt[0, :A], hp_t[0, :A]


def occupant(acell, cell, hp, *, interpret=False):
    if supports_pallas() or interpret:
        return occupant_tpu(acell, cell, hp, interpret=interpret)
    return occupant_xla(acell, cell, hp)


def move_resolve_xla(tcell, cell):
    """(lower-slot same-target count, head slot, occupant-or--1).
    Claim arbitration is :func:`move_claims_xla` — one definition of the
    tie-break semantics for both the grid and gridless move paths."""
    A = tcell.shape[-1]
    slots = jnp.arange(A, dtype=jnp.int32)
    cnt, head = move_claims_xla(tcell)
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

    tcell: [A] int32 — target cell per mover (sentinel for non-movers);
    cell:  [A] int32 — each live agent's current cell (a different sentinel
           when dead).
    Returns (cnt [A] — lower-slot contenders, head [A] — lowest contender
    slot, occ [A] — blocking agent slot or -1).
    """
    from jax.experimental import pallas as pl

    (A,) = tcell.shape
    Ap, (tcell_p, cell_p) = _pad_operands(
        A, [(tcell, jnp.int32(2**30)), (cell, jnp.int32(2**29))])

    def kernel(tc_col_ref, c_col_ref, tc_row_ref, cnt_ref, head_ref, occ_ref):
        i = pl.program_id(1)
        j = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)
            head_ref[...] = jnp.full_like(head_ref, 2**30)
            occ_ref[...] = jnp.full_like(occ_ref, -1)

        tr = tc_row_ref[...]
        slot_row = jax.lax.broadcasted_iota(jnp.int32, (1, _TJ), 1) + j * _TJ
        tc = tc_col_ref[...]
        cc = c_col_ref[...]
        slot_col = jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0) + i * _TI
        same = tc == tr
        cnt_ref[...] += jnp.sum(
            (same & (slot_col < slot_row)).astype(jnp.int32),
            axis=0, keepdims=True)
        head_ref[...] = jnp.minimum(
            head_ref[...],
            jnp.min(jnp.where(same, slot_col, 2**30), axis=0, keepdims=True))
        om = (cc == tr) & (slot_col != slot_row)
        ohit = jnp.sum(om.astype(jnp.int32), axis=0, keepdims=True) > 0
        osum = jnp.sum(jnp.where(om, slot_col, 0), axis=0, keepdims=True)
        occ_ref[...] = jnp.where(ohit, osum, occ_ref[...])

    cnt, head, occ = _pair_grid_call(
        kernel, [tcell_p, cell_p], [tcell_p], 3,
        [jnp.int32, jnp.int32, jnp.int32], Ap, interpret)
    return cnt[0, :A], head[0, :A], occ[0, :A]


def move_resolve(tcell, cell, *, interpret=False):
    if supports_pallas() or interpret:
        return move_resolve_tpu(tcell, cell, interpret=interpret)
    return move_resolve_xla(tcell, cell)


# ------------------------------------------------- multi-cell (rect) kernels
# With turn_mode off every direction is NORTH, so each agent's footprint is a
# STATIC per-slot rectangle [x, x+bw) x [y, y+bh) (reference: multi-cell
# bodies Map.cc:75-97; direction forced NORTH GridWorld.cc:230,253).  The
# same pairwise questions then become interval-intersection tests, which
# lets forest/pursuit-class configs (2x2 predators) run gridless too.
# Sentinel convention: non-participants carry an EMPTY rect (bw = bh = 0) —
# an empty rect contains no cell and intersects nothing, including other
# empty rects at the same coordinates.

def occupant_rect_xla(qx, qy, x, y, bw, bh, hp, *, exclude_self=False):
    """(slot whose rect contains (qx_j, qy_j) or -1, its hp).  Bodies are
    disjoint, so at most one column matches per query."""
    A = qx.shape[-1]
    slots = jnp.arange(A, dtype=jnp.int32)
    m = (
        (qx[..., None, :] >= x[..., :, None])
        & (qx[..., None, :] < (x + bw)[..., :, None])
        & (qy[..., None, :] >= y[..., :, None])
        & (qy[..., None, :] < (y + bh)[..., :, None])
    )
    if exclude_self:
        m = m & (slots[:, None] != slots[None, :])
    tgt = jnp.max(jnp.where(m, slots[:, None], -1), axis=-2)
    hp_t = jnp.sum(jnp.where(m, hp[..., :, None], 0.0), axis=-2)
    return tgt, hp_t


@functools.partial(jax.jit, static_argnames=("exclude_self", "interpret"))
def occupant_rect_tpu(qx, qy, x, y, bw, bh, hp, *, exclude_self=False,
                      interpret=False, bslot=None):
    """Pairwise rect-containment occupant lookup (single env; vmap for
    batches).  qx/qy: [A] int32 query cell per agent (any value when the
    corresponding bw/bh say empty — queries are gated by the CALLER setting
    qx = -2**20 for non-queries); x/y/bw/bh: [A] int32 current rects (EMPTY
    rect bw=0 for dead agents); hp: [A] f32.
    Returns (tgt [A] int32 — occupant slot or -1, hp_t [A] f32).

    ``bslot``: explicit original-slot ids for non-slot-ordered body arrays
    (the segmented sweep's sorted layout; incompatible with exclude_self,
    whose row ids would also need a qslot — no caller needs both).
    """
    from jax.experimental import pallas as pl

    assert not (exclude_self and bslot is not None)
    (A,) = qx.shape
    have_slots = bslot is not None
    pads = [(qx, jnp.int32(-2**20)), (qy, jnp.int32(-2**20)),
            (x, jnp.int32(0)), (y, jnp.int32(0)),
            (bw, jnp.int32(0)), (bh, jnp.int32(0)), (hp, jnp.float32(0))]
    if have_slots:
        pads.append((bslot, jnp.int32(-1)))
    Ap, padded = _pad_operands(A, pads)
    qx_p, qy_p, x_p, y_p, bw_p, bh_p, hp_p = padded[:7]

    def kernel(*refs):
        if have_slots:
            (x_ref, y_ref, bw_ref, bh_ref, h_ref, bs_ref, qx_ref, qy_ref,
             tgt_ref, hpt_ref) = refs
        else:
            (x_ref, y_ref, bw_ref, bh_ref, h_ref, qx_ref, qy_ref,
             tgt_ref, hpt_ref) = refs
        i = pl.program_id(1)
        j = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            tgt_ref[...] = jnp.full_like(tgt_ref, -1)
            hpt_ref[...] = jnp.zeros_like(hpt_ref)

        xc = x_ref[...]
        yc = y_ref[...]
        qxr = qx_ref[...]
        qyr = qy_ref[...]
        m = (
            (qxr >= xc) & (qxr < xc + bw_ref[...])
            & (qyr >= yc) & (qyr < yc + bh_ref[...])
        )
        if have_slots:
            slot_col = bs_ref[...]
        else:
            slot_col = (jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0)
                        + i * _TI)
        if exclude_self:
            slot_row = (
                jax.lax.broadcasted_iota(jnp.int32, (1, _TJ), 1) + j * _TJ
            )
            m = m & (slot_col != slot_row)
        tgt_ref[...] = jnp.maximum(
            tgt_ref[...],
            jnp.max(jnp.where(m, slot_col, -1), axis=0, keepdims=True))
        hpt_ref[...] += jnp.sum(jnp.where(m, h_ref[...], 0.0), axis=0,
                                keepdims=True)

    col_ops = [x_p, y_p, bw_p, bh_p, hp_p]
    if have_slots:
        col_ops.append(padded[7])
    tgt, hp_t = _pair_grid_call(
        kernel, col_ops, [qx_p, qy_p], 2,
        [jnp.int32, jnp.float32], Ap, interpret)
    return tgt[0, :A], hp_t[0, :A]


def occupant_rect(qx, qy, x, y, bw, bh, hp, *, exclude_self=False,
                  interpret=False):
    if supports_pallas() or interpret:
        return occupant_rect_tpu(qx, qy, x, y, bw, bh, hp,
                                 exclude_self=exclude_self,
                                 interpret=interpret)
    return occupant_rect_xla(qx, qy, x, y, bw, bh, hp,
                             exclude_self=exclude_self)


_NONE = 2**30  # "no slot" sentinel for min-slot accumulation


def rect_cell_min_xla(qx, qy, tbw, tbh, x, y, bw, bh, max_body,
                      exclude_self):
    """Semantic ORACLE for the per-cell rect queries (kept for
    tests/test_pairwise_kernels.py; production moved to the one-reduction
    :func:`rect_first_overlap`).

    Per query cell (k = i*max_body + j — the grid path's scan order,
    engine._move_phase): the MINIMUM slot whose rect [x, x+bw) x [y, y+bh)
    covers cell (qx+i, qy+j), or 2**30; cells beyond the querier's own
    (tbw, tbh) footprint return 2**30.  Returns a list of max_body^2 [A]
    int32 arrays.

    Two uses in the gridless multi-cell move phase: blocking occupants
    (rects = current bodies, exclude_self=True; bodies are disjoint so the
    min IS the unique occupant) and claim arbitration (rects = blank movers'
    target rects, exclude_self=False; min slot == the grid path's
    scatter-min claim winner per cell).
    """
    A = qx.shape[-1]
    slots = jnp.arange(A, dtype=jnp.int32)
    outs = []
    for i in range(max_body):
        for j in range(max_body):
            cqx = qx + i
            cqy = qy + j
            m = (
                (i < tbw)[..., None, :]
                & (j < tbh)[..., None, :]
                & (cqx[..., None, :] >= x[..., :, None])
                & (cqx[..., None, :] < (x + bw)[..., :, None])
                & (cqy[..., None, :] >= y[..., :, None])
                & (cqy[..., None, :] < (y + bh)[..., :, None])
            )
            if exclude_self:
                m = m & (slots[:, None] != slots[None, :])
            outs.append(jnp.min(jnp.where(m, slots[:, None], _NONE), axis=-2))
    return outs


def rect_first_overlap_xla(qx, qy, tbw, tbh, x, y, bw, bh, max_body,
                           gate):
    """Single-reduction reformulation of the two rect_cell_min sweeps (see
    :func:`rect_first_overlap`): per pair, the overlap of the query rect
    [qx, qx+tbw) x [qy, qy+tbh) with the body rect [x, x+bw) x [y, y+bh) is
    itself a rect whose FIRST cell in the (i outer, j inner) scan order is
    (max(qx,x)-qx, max(qy,y)-qy); min-reducing the lexicographic key
    (first_cell, slot) over bodies yields exactly the scan-order-first
    blocking occupant / claim winner."""
    A = qx.shape[-1]
    slots = jnp.arange(A, dtype=jnp.int32)
    ox = jnp.maximum(qx[..., None, :], x[..., :, None])
    oy = jnp.maximum(qy[..., None, :], y[..., :, None])
    ex = jnp.minimum((qx + tbw)[..., None, :], (x + bw)[..., :, None])
    ey = jnp.minimum((qy + tbh)[..., None, :], (y + bh)[..., :, None])
    ov = (ox < ex) & (oy < ey)
    if gate == "exclude_self":
        ov = ov & (slots[:, None] != slots[None, :])
    else:  # lower_only
        ov = ov & (slots[:, None] < slots[None, :])
    k = (ox - qx[..., None, :]) * max_body + (oy - qy[..., None, :])
    stride = _NONE // max_body**2  # k < max_body^2, slot < A <= stride
    key = k * stride + slots[:, None]  # lexicographic (first cell, slot)
    best = jnp.min(jnp.where(ov, key, jnp.int32(2**31 - 1)), axis=-2)
    slot = best % jnp.int32(stride)
    return jnp.where(best == 2**31 - 1, _NONE, slot)


@functools.partial(
    jax.jit, static_argnames=("max_body", "gate", "interpret"))
def rect_first_overlap_tpu(qx, qy, tbw, tbh, x, y, bw, bh, *, max_body,
                           gate, interpret=False, qslot=None, bslot=None):
    """Pallas pair sweep for :func:`rect_first_overlap` (single env; vmap
    for batches).  ~15 vector ops per pair vs ~40 for the max_body^2
    per-cell sweep it replaces — the move phase owned the 1e5 FPS cliff
    (profile_sweep ladder: move 24.4ms of the 42.8ms step at 16x6250).

    ``qslot``/``bslot``: explicit original-slot operands for callers whose
    arrays are NOT in slot order (the segmented sweep's sorted layout);
    results are then identical to the slot-ordered sweep.  The
    lower_only triangular block skip only applies in iota (slot-order)
    mode."""
    from jax.experimental import pallas as pl

    MB = max_body
    (A,) = qx.shape
    have_slots = qslot is not None
    pads = [(qx, jnp.int32(-2**20)), (qy, jnp.int32(-2**20)),
            (tbw, jnp.int32(0)), (tbh, jnp.int32(0)),
            (x, jnp.int32(0)), (y, jnp.int32(0)),
            (bw, jnp.int32(0)), (bh, jnp.int32(0))]
    if have_slots:
        pads += [(qslot, jnp.int32(_NONE - 1)), (bslot, jnp.int32(_NONE - 1))]
    Ap, padded = _pad_operands(A, pads)
    qx_p, qy_p, tbw_p, tbh_p, x_p, y_p, bw_p, bh_p = padded[:8]
    stride = _NONE // (MB * MB)  # k < MB^2, slot < Ap <= stride
    assert Ap <= stride, (Ap, MB)
    none_key = 2**31 - 1  # python int: pallas kernels can't capture arrays

    def kernel(*refs):
        if have_slots:
            (x_ref, y_ref, bw_ref, bh_ref, bs_ref,
             qx_ref, qy_ref, tbw_ref, tbh_ref, qs_ref, out_ref) = refs
        else:
            (x_ref, y_ref, bw_ref, bh_ref,
             qx_ref, qy_ref, tbw_ref, tbh_ref, out_ref) = refs
        i = pl.program_id(1)
        j = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_ref[...] = jnp.full_like(out_ref, jnp.int32(none_key))

        def compute():
            xc = x_ref[...]
            yc = y_ref[...]
            qxr = qx_ref[...]
            qyr = qy_ref[...]
            ox = jnp.maximum(qxr, xc)
            oy = jnp.maximum(qyr, yc)
            ex = jnp.minimum(qxr + tbw_ref[...], xc + bw_ref[...])
            ey = jnp.minimum(qyr + tbh_ref[...], yc + bh_ref[...])
            if have_slots:
                slot_col = bs_ref[...]
                slot_row = qs_ref[...]
            else:
                slot_col = (jax.lax.broadcasted_iota(jnp.int32, (_TI, 1), 0)
                            + i * _TI)
                slot_row = (jax.lax.broadcasted_iota(jnp.int32, (1, _TJ), 1)
                            + j * _TJ)
            ov = (ox < ex) & (oy < ey)
            if gate == "exclude_self":
                ov = ov & (slot_col != slot_row)
            else:  # lower_only
                ov = ov & (slot_col < slot_row)
            k = (ox - qxr) * MB + (oy - qyr)
            key = k * stride + slot_col
            out_ref[...] = jnp.minimum(
                out_ref[...],
                jnp.min(jnp.where(ov, key, none_key), axis=0, keepdims=True))

        if gate == "lower_only" and not have_slots:
            # upper-triangle blocks (every slot_col >= every slot_row) can
            # never contribute — skip ~half the pair work
            pl.when(i * _TI < (j + 1) * _TJ)(compute)
        else:
            compute()

    if have_slots:
        qs_p, bs_p = padded[8], padded[9]
        col_ops = [x_p, y_p, bw_p, bh_p, bs_p]
        row_ops = [qx_p, qy_p, tbw_p, tbh_p, qs_p]
    else:
        col_ops = [x_p, y_p, bw_p, bh_p]
        row_ops = [qx_p, qy_p, tbw_p, tbh_p]
    (out,) = _pair_grid_call(
        kernel, col_ops, row_ops, 1, [jnp.int32], Ap, interpret)
    best = out[0, :A]
    slot = best % jnp.int32(stride)
    return jnp.where(best == none_key, _NONE, slot)


def _rect_overlap_core(q_ops, b_ops, *, max_body, gate, interpret):
    """Segment-batched slot-carrying pair sweep: q_ops are [S, R] query
    operands (R multiple of _TJ), b_ops are [S, P] partner-window operands
    (P multiple of _TI); q_ops = (qx, qy, tbw, tbh, qslot), b_ops =
    (x, y, bw, bh, bslot).

    Slots are EXPLICIT operands (original slot ids), so callers may present
    queries/bodies in any order (e.g. sorted by y for the segmented sweep)
    and still get results identical to the slot-ordered sweep — the
    reduction key and the lower_only/exclude_self gates read the operand
    slots, never positional iota.  The segment axis S is a LEADING GRID
    DIMENSION of one pallas_call (vmap-of-pallas_call measured ~5x slower
    per pair block: the batching rule breaks cross-program pipelining).
    Returns [S, R] best keys decoded to slots (or _NONE).
    """
    from jax.experimental import pallas as pl

    MB = max_body
    qx, qy, tbw, tbh, qslot = q_ops
    x, y, bw, bh, bslot = b_ops
    S, R = qx.shape
    P = x.shape[-1]
    assert R % _TJ == 0 and P % _TI == 0, (R, P)
    stride = _NONE // (MB * MB)
    none_key = 2**31 - 1

    def kernel(x_ref, y_ref, bw_ref, bh_ref, bs_ref, qx_ref, qy_ref,
               tbw_ref, tbh_ref, qs_ref, out_ref):
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _init():
            out_ref[...] = jnp.full_like(out_ref, jnp.int32(none_key))

        xc = x_ref[0]
        yc = y_ref[0]
        qxr = qx_ref[0]
        qyr = qy_ref[0]
        ox = jnp.maximum(qxr, xc)
        oy = jnp.maximum(qyr, yc)
        ex = jnp.minimum(qxr + tbw_ref[0], xc + bw_ref[0])
        ey = jnp.minimum(qyr + tbh_ref[0], yc + bh_ref[0])
        slot_col = bs_ref[0]
        slot_row = qs_ref[0]
        ov = (ox < ex) & (oy < ey)
        if gate == "exclude_self":
            ov = ov & (slot_col != slot_row)
        else:  # lower_only
            ov = ov & (slot_col < slot_row)
        k = (ox - qxr) * MB + (oy - qyr)
        key = k * stride + slot_col
        out_ref[0] = jnp.minimum(
            out_ref[0],
            jnp.min(jnp.where(ov, key, none_key), axis=0, keepdims=True))

    col_spec = pl.BlockSpec((1, _TI, 1), lambda s, j, i: (s, i, 0))
    row_spec = pl.BlockSpec((1, 1, _TJ), lambda s, j, i: (s, 0, j))
    (out,) = pl.pallas_call(
        kernel,
        grid=(S, R // _TJ, P // _TI),
        in_specs=[col_spec] * 5 + [row_spec] * 5,
        out_specs=[pl.BlockSpec((1, 1, _TJ), lambda s, j, i: (s, 0, j))],
        out_shape=[jax.ShapeDtypeStruct((S, 1, R), jnp.int32)],
        interpret=interpret,
    )(x[:, :, None], y[:, :, None], bw[:, :, None], bh[:, :, None],
      bslot[:, :, None],
      qx[:, None, :], qy[:, None, :], tbw[:, None, :], tbh[:, None, :],
      qslot[:, None, :])
    best = out[:, 0]
    slot = best % jnp.int32(stride)
    return jnp.where(best == none_key, _NONE, slot)


# segmented sweep geometry: rows per segment / partner window width.
# Multiples of (_TJ, _TI); the window must cover every partner within
# `margin` rows of the segment's y-range or the call falls back to the
# full sweep (lax.cond), so these are pure performance knobs.
SEG_ROWS = 1024
SEG_WIN = 2048


def _pad_operands_to(A, Ap, pads):
    """Sentinel-pad 1-D operands to exactly Ap."""
    out = []
    for arr, fill in pads:
        if Ap != arr.shape[0]:
            arr = jnp.pad(arr, (0, Ap - arr.shape[0]), constant_values=fill)
        out.append(arr)
    return Ap, out


def _seg_plan(sort_y_padded, A, Ap, margin, seg_win=None):
    """Partner-window plan for a y-sorted population: per SEG_ROWS segment,
    the window start covering every row within ``margin`` of the segment's
    y-range, plus the overflow flag (some window wider than the static
    window — the caller then lax.cond-falls back to the full sweep, so
    segmentation is an optimization, never a semantics change).
    ``seg_win``: static window width hint (callers size it from the map's
    expected agents-per-row density; default SEG_WIN)."""
    P = min(_ceil_to(seg_win or SEG_WIN, _TI), Ap)
    S = Ap // SEG_ROWS
    ymin = sort_y_padded.reshape(S, SEG_ROWS)[:, 0]
    ymax = jnp.where(
        jnp.arange(S) * SEG_ROWS < A,  # segments past the real rows: empty
        sort_y_padded.reshape(S, SEG_ROWS)[:, -1], ymin)
    lo = jnp.searchsorted(sort_y_padded, ymin - margin,
                          side="left").astype(jnp.int32)
    hi = jnp.searchsorted(sort_y_padded, ymax + margin,
                          side="right").astype(jnp.int32)
    start = jnp.clip(jnp.minimum(lo, Ap - P), 0)
    overflow = jnp.any(hi - start > P)
    return S, P, start, overflow


def _seg_gather(ops, start, P):
    """[S, P] partner windows of 1-D padded operands.

    All int32 operands ride ONE row gather of a stacked [Ap, k] array
    (random access is index-count dominated on TPU; row width is nearly
    free — CLAUDE.md); other dtypes gather individually."""
    idx = start[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]
    ints = [k for k, op in enumerate(ops) if op.dtype == jnp.int32]
    out = [None] * len(ops)
    if len(ints) > 1:
        stacked = jnp.stack([ops[k] for k in ints], axis=1)  # [Ap, n_int]
        win = stacked[idx]  # [S, P, n_int] — one gather
        for c, k in enumerate(ints):
            out[k] = win[..., c]
    elif ints:
        out[ints[0]] = ops[ints[0]][idx]
    for k, op in enumerate(ops):
        if out[k] is None:
            out[k] = op[idx]
    return out


def rect_first_overlap_seg(qx, qy, tbw, tbh, x, y, bw, bh, sort_y, order,
                           *, max_body, gate, margin, seg_win=None,
                           interpret=False):
    """Spatially-segmented :func:`rect_first_overlap` for big single worlds.

    All operands are PRE-SORTED by agent y (``sort_y`` non-decreasing;
    ``order[i]`` = original slot of sorted row i).  Queries are processed in
    ``SEG_ROWS``-row segments; each segment's candidate bodies are the
    sorted rows whose y lies within ``margin`` of the segment's y-range — a
    contiguous window found by searchsorted and padded to ``SEG_WIN``.
    Pair work drops from A^2 to A*SEG_WIN; results carry ORIGINAL slot ids
    via the slot operands, so they equal the plain sweep's bit-for-bit.

    Returns [A] results in sorted-row order; callers scatter back with
    ``zeros.at[order].set(res)``.
    """
    (A,) = qx.shape
    # the lexicographic key packs (first-overlap cell, ORIGINAL slot id):
    # ids must fit under the cell stride or `best % stride` decodes garbage
    # (the iota kernel asserts the same bound on its padded capacity)
    assert A <= _NONE // (max_body * max_body), (A, max_body)
    Ap = _ceil_to(A, SEG_ROWS)
    pads = [(qx, jnp.int32(-2**20)), (qy, jnp.int32(-2**20)),
            (tbw, jnp.int32(0)), (tbh, jnp.int32(0)),
            (x, jnp.int32(0)), (y, jnp.int32(0)),
            (bw, jnp.int32(0)), (bh, jnp.int32(0)),
            (sort_y, jnp.int32(2**20)), (order, jnp.int32(_NONE - 1))]
    Ap, (qx_p, qy_p, tbw_p, tbh_p, x_p, y_p, bw_p, bh_p, y_s, ord_p) = (
        _pad_operands_to(A, Ap, pads))
    S, P, start, overflow = _seg_plan(y_s, A, Ap, margin, seg_win)

    q_ops_p = (qx_p, qy_p, tbw_p, tbh_p, ord_p)
    b_ops_p = (x_p, y_p, bw_p, bh_p, ord_p)

    def run_seg(_):
        wins = _seg_gather(b_ops_p, start, P)
        segs = [op.reshape(S, SEG_ROWS) for op in q_ops_p]
        out = _rect_overlap_core(tuple(segs), tuple(wins),
                                 max_body=max_body, gate=gate,
                                 interpret=interpret)  # [S, SEG_ROWS]
        return out.reshape(Ap)[:A]

    def run_full(_):
        return rect_first_overlap_tpu(
            qx, qy, tbw, tbh, x, y, bw, bh, max_body=max_body, gate=gate,
            interpret=interpret, qslot=order, bslot=order)

    return jax.lax.cond(overflow, run_full, run_seg, operand=None)


def _occupant_rect_core(q_ops, b_ops, *, interpret):
    """Segment-batched occupant lookup: q_ops [S, R] query cells, b_ops
    [S, P] body rects + hp + ORIGINAL slot ids.  Returns (tgt [S, R],
    hp_t [S, R]).  S rides the grid (see _rect_overlap_core)."""
    from jax.experimental import pallas as pl

    qx, qy = q_ops
    x, y, bw, bh, hp, bslot = b_ops
    S, R = qx.shape
    P = x.shape[-1]
    assert R % _TJ == 0 and P % _TI == 0, (R, P)

    def kernel(x_ref, y_ref, bw_ref, bh_ref, h_ref, bs_ref, qx_ref, qy_ref,
               tgt_ref, hpt_ref):
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _init():
            tgt_ref[...] = jnp.full_like(tgt_ref, -1)
            hpt_ref[...] = jnp.zeros_like(hpt_ref)

        xc = x_ref[0]
        yc = y_ref[0]
        qxr = qx_ref[0]
        qyr = qy_ref[0]
        m = (
            (qxr >= xc) & (qxr < xc + bw_ref[0])
            & (qyr >= yc) & (qyr < yc + bh_ref[0])
        )
        tgt_ref[0] = jnp.maximum(
            tgt_ref[0],
            jnp.max(jnp.where(m, bs_ref[0], -1), axis=0, keepdims=True))
        hpt_ref[0] += jnp.sum(jnp.where(m, h_ref[0], 0.0), axis=0,
                              keepdims=True)

    col_spec = pl.BlockSpec((1, _TI, 1), lambda s, j, i: (s, i, 0))
    row_spec = pl.BlockSpec((1, 1, _TJ), lambda s, j, i: (s, 0, j))
    tgt, hp_t = pl.pallas_call(
        kernel,
        grid=(S, R // _TJ, P // _TI),
        in_specs=[col_spec] * 6 + [row_spec] * 2,
        out_specs=[pl.BlockSpec((1, 1, _TJ), lambda s, j, i: (s, 0, j))
                   for _ in range(2)],
        out_shape=[jax.ShapeDtypeStruct((S, 1, R), jnp.int32),
                   jax.ShapeDtypeStruct((S, 1, R), jnp.float32)],
        interpret=interpret,
    )(x[:, :, None], y[:, :, None], bw[:, :, None], bh[:, :, None],
      hp[:, :, None], bslot[:, :, None], qx[:, None, :], qy[:, None, :])
    return tgt[:, 0], hp_t[:, 0]


def occupant_rect_seg(qx, qy, x, y, bw, bh, hp, sort_y, order, *, margin,
                      seg_win=None, interpret=False):
    """Spatially-segmented :func:`occupant_rect` (no exclude_self — the
    gridless attack path never self-targets).  Same contract as
    :func:`rect_first_overlap_seg`: operands pre-sorted by y, results in
    sorted-row order carrying ORIGINAL slot ids."""
    (A,) = qx.shape
    Ap = _ceil_to(A, SEG_ROWS)
    pads = [(qx, jnp.int32(-2**20)), (qy, jnp.int32(-2**20)),
            (x, jnp.int32(0)), (y, jnp.int32(0)),
            (bw, jnp.int32(0)), (bh, jnp.int32(0)), (hp, jnp.float32(0)),
            (sort_y, jnp.int32(2**20)), (order, jnp.int32(-1))]
    Ap, (qx_p, qy_p, x_p, y_p, bw_p, bh_p, hp_p, y_s, ord_p) = (
        _pad_operands_to(A, Ap, pads))
    S, P, start, overflow = _seg_plan(y_s, A, Ap, margin, seg_win)

    def run_seg(_):
        wins = _seg_gather((x_p, y_p, bw_p, bh_p, hp_p, ord_p), start, P)
        segs = [op.reshape(S, SEG_ROWS) for op in (qx_p, qy_p)]
        tgt, hp_t = _occupant_rect_core(tuple(segs), tuple(wins),
                                        interpret=interpret)
        return tgt.reshape(Ap)[:A], hp_t.reshape(Ap)[:A]

    def run_full(_):
        return occupant_rect_tpu(qx, qy, x, y, bw, bh, hp,
                                 interpret=interpret, bslot=order)

    return jax.lax.cond(overflow, run_full, run_seg, operand=None)


def _rank_prefix_core(q_ops, b_ops, *, interpret):
    """Segment-batched rank-prefix: q_ops [S, R] attacker (tgt, rank),
    b_ops [S, P] partner (tgt, rank, dmg).  Positional — no slot ids
    needed (rank keys already embed the slot tie-break, :func:`pack_rank`).
    Returns P_sum [S, R].  S rides the grid (see _rect_overlap_core)."""
    from jax.experimental import pallas as pl

    tr_q, rr_q = q_ops
    tc, rc, dc = b_ops
    S, R = tr_q.shape
    P = tc.shape[-1]
    assert R % _TJ == 0 and P % _TI == 0, (R, P)

    def kernel(tc_ref, rc_ref, dc_ref, tr_ref, rr_ref, p_ref):
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _init():
            p_ref[...] = jnp.zeros_like(p_ref)

        m = (tc_ref[0] == tr_ref[0]) & (rc_ref[0] < rr_ref[0])
        p_ref[0] += jnp.sum(jnp.where(m, dc_ref[0], 0.0), axis=0,
                            keepdims=True)

    col_spec = pl.BlockSpec((1, _TI, 1), lambda s, j, i: (s, i, 0))
    row_spec = pl.BlockSpec((1, 1, _TJ), lambda s, j, i: (s, 0, j))
    (out,) = pl.pallas_call(
        kernel,
        grid=(S, R // _TJ, P // _TI),
        in_specs=[col_spec] * 3 + [row_spec] * 2,
        out_specs=[pl.BlockSpec((1, 1, _TJ), lambda s, j, i: (s, 0, j))],
        out_shape=[jax.ShapeDtypeStruct((S, 1, R), jnp.float32)],
        interpret=interpret,
    )(tc[:, :, None], rc[:, :, None], dc[:, :, None],
      tr_q[:, None, :], rr_q[:, None, :])
    return out[:, 0]


def rank_prefix_seg(tgt, rank, dmg, sort_y, *, margin, seg_win=None,
                    interpret=False):
    """Spatially-segmented :func:`rank_prefix` (no hp pickup — the gridless
    path gets target hp from the occupant pass).  Two attackers interact
    only when they share a target, and a target lies within the attack
    reach of both — so ``margin`` = 2 * (max attack y-reach + max body).
    Operands pre-sorted by y; result in sorted-row order (positional)."""
    (A,) = tgt.shape
    Ap = _ceil_to(A, SEG_ROWS)
    pads = [(tgt, jnp.int32(2**30)), (rank, jnp.int32(0)),
            (dmg, jnp.float32(0)), (sort_y, jnp.int32(2**20))]
    Ap, (tgt_p, rank_p, dmg_p, y_s) = _pad_operands_to(A, Ap, pads)
    S, P, start, overflow = _seg_plan(y_s, A, Ap, margin, seg_win)

    def run_seg(_):
        wins = _seg_gather((tgt_p, rank_p, dmg_p), start, P)
        segs = [op.reshape(S, SEG_ROWS) for op in (tgt_p, rank_p)]
        out = _rank_prefix_core(tuple(segs), tuple(wins),
                                interpret=interpret)
        return out.reshape(Ap)[:A]

    def run_full(_):
        return rank_prefix_tpu(tgt, rank, dmg, interpret=interpret)

    return jax.lax.cond(overflow, run_full, run_seg, operand=None)


def rect_first_overlap(qx, qy, tbw, tbh, x, y, bw, bh, *, max_body, gate,
                       interpret=False):
    """Per query rect: the slot of the body rect covering the FIRST
    overlapped query cell in (i outer, j inner) scan order (ties at that
    cell -> min slot), or ``_NONE``.  ``gate``: "exclude_self" skips the
    i == j pair (blocking occupants), "lower_only" keeps only slot_i <
    slot_j pairs (claim arbitration: a mover loses iff a lower slot covers
    one of its cells, and collides with the winner of its first lost cell).
    Replaces the two max_body^2-output rect_cell_min sweeps with one
    reduction (same semantics — see engine._move_phase_gridless_rect)."""
    if supports_pallas() or interpret:
        return rect_first_overlap_tpu(qx, qy, tbw, tbh, x, y, bw, bh,
                                      max_body=max_body, gate=gate,
                                      interpret=interpret)
    return rect_first_overlap_xla(qx, qy, tbw, tbh, x, y, bw, bh,
                                  max_body, gate)
