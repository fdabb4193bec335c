"""Functional simulation core: one env step as pure batched array ops.

Replaces the reference's sequential OpenMP-patched step
(reference: src/gridworld/GridWorld.cc:456-631) with deterministic vectorized
phases executed in the same order:

  attack -> starve -> turn -> move -> reward rules -> done check

Sequential mutation order is re-expressed as deterministic priority schemes:

- **attacks** execute in a random priority order (the reference Fisher-Yates
  shuffles its attack buffer, GridWorld.cc:464-468); per-target damage is an
  order-aware segmented cumulative sum, so the kill credit goes to the first
  attacker (in priority order) whose cumulative damage drops the target's hp
  below zero — exactly the sequential outcome whenever no attacker is itself
  killed mid-phase.
- **moves** resolve simultaneously: a mover succeeds iff its target rectangle
  was blank at phase start and it wins (lowest slot index = reference buffer
  order) every contested cell.  The only divergence from the sequential
  reference is "chain moves" into cells vacated in the same phase, which the
  fast path treats as collisions.

All shapes are static; the whole step jits into one XLA program and `vmap`s
over env batches.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec as speclib
from ..ops import attack_prefix as ap
from ..spec import OP_ATTACK, OP_COLLIDE, OP_KILL, OP_NULL
from . import geometry as geo
from .state import State


def _pad_gather(arr, idx, fill):
    """arr[idx] with idx == -1 (or OOB) mapping to `fill`."""
    padded = jnp.concatenate([arr, jnp.asarray([fill], dtype=arr.dtype)])
    safe = jnp.where((idx >= 0) & (idx < arr.shape[0]), idx, arr.shape[0])
    return padded[safe]


def _segment_starts(sorted_keys):
    first = jnp.ones((1,), dtype=bool)
    return jnp.concatenate([first, sorted_keys[1:] != sorted_keys[:-1]])


def _segment_cumsum(values, seg_start):
    """Per-segment inclusive cumulative sum over sorted segments.

    Requires values >= 0 so the running total is non-decreasing (lets us
    forward-fill segment bases with a cummax).
    """
    cum = jnp.cumsum(values)
    base = jnp.where(seg_start, cum - values, -jnp.inf)
    base = jax.lax.cummax(base)
    return cum - base


def _clear_body(cell_slot, mask, x, y, bw, bh, max_body):
    """Clear body rectangles of masked slots from the occupancy grid."""
    H, W = cell_slot.shape
    for i in range(max_body):
        for j in range(max_body):
            ok = mask & (i < bw) & (j < bh)
            cx = jnp.where(ok, x + i, W)  # OOB -> dropped
            cy = jnp.where(ok, y + j, H)
            cell_slot = cell_slot.at[cy, cx].set(-1, mode="drop")
    return cell_slot


def _fill_body(cell_slot, mask, x, y, bw, bh, slots, max_body):
    H, W = cell_slot.shape
    for i in range(max_body):
        for j in range(max_body):
            ok = mask & (i < bw) & (j < bh)
            cx = jnp.where(ok, x + i, W)
            cy = jnp.where(ok, y + j, H)
            cell_slot = cell_slot.at[cy, cx].set(
                jnp.where(ok, slots, -1).astype(cell_slot.dtype), mode="drop"
            )
    return cell_slot



def _row_lookup(table_2d, idx, count):
    """table_2d[slot, idx[slot]] for a small static last axis: unrolled
    compare-select (general gathers are the slow path on TPU)."""
    out = jnp.zeros(idx.shape, dtype=table_2d.dtype)
    for k in range(count):
        out = jnp.where(idx == k, table_2d[:, k], out)
    return out


def _use_quad(A: int, n_envs: int = 1) -> bool:
    """Route conflict resolution to the O(A^2) pairwise kernels?  The XLA
    fallback materializes [A, A], so cap it harder off-TPU.  Batch-aware
    (see ap.QUAD_MAX_AGENTS): single worlds extend to QUAD_MAX_SINGLE,
    batched configs keep the tighter measured bound (64x15625 on quad was
    catastrophic while 1x16384 ties the sort path)."""
    path = os.environ.get("MAGENT_ATTACK_PATH", "auto")
    if path == "auto":
        cap = ap.QUAD_MAX_SINGLE if n_envs == 1 else ap.QUAD_MAX_AGENTS
        return A <= cap and (ap.supports_pallas() or A <= 1024)
    return path == "quad"


def _wall_rect_code(spec: speclib.GameSpec, wall):
    """Pack per-body-size wall-overlap bitmaps into one int32 grid.

    ``wall`` — full [H, W] bool wall map (border + interior), static for the
    life of the step function (lockstep envs share one layout).  Bit ``b`` of
    ``code[y, x]`` says: a body rectangle of the b-th distinct (bw, bh) size
    anchored at (x, y) overlaps at least one wall cell.  The gridless move
    phases then answer "does my target rect hit a wall?" with ONE gather per
    mover (random-access cost on TPU is index-count dominated — a per-cell
    scan or 4 summed-area-table corners would cost 4x the indices).  Sizes
    are static per slot (gridless requires turn_mode off, so every footprint
    is the NORTH (width, length) rect); ``s_bit[slot]`` selects the bit.
    """
    H, W = spec.height, spec.width
    wall = np.asarray(wall, bool)
    assert wall.shape == (H, W)
    sizes = sorted({(int(w), int(l))
                    for w, l in zip(spec.s_width, spec.s_length)})
    assert len(sizes) <= 31
    code = np.zeros((H, W), np.int32)
    for b, (bw, bh) in enumerate(sizes):
        blocked = np.zeros((H, W), bool)
        for i in range(bw):
            for j in range(bh):
                blocked[: H - j, : W - i] |= wall[j:, i:]
        code |= blocked.astype(np.int32) << b
    bit_of = {s: b for b, s in enumerate(sizes)}
    s_bit = np.array(
        [bit_of[(int(w), int(l))] for w, l in zip(spec.s_width, spec.s_length)],
        np.int32)
    return code, s_bit


# measured crossovers for the y-segmented pair sweeps on the forest
# protocol (single world, walled; results/seg_crossover.log):
#   A=10000: quad 3.80M > seg 3.64M      A=16384: seg 3.17M > sort 2.58M
#   A=32768: seg 2.91M > sort 1.27M      A=65536: seg 2.35M > sort 1.99M
#   A=100000: sort 2.30M > seg 2.11M
# -> segmentation is the DEFAULT engine in (QUAD_MAX, SEG_DEFAULT_MAX];
#    beyond that the sort+grid path wins (density widens the partner
#    windows until A*window arithmetic exceeds the sort's O(A log A))
SEG_DEFAULT_MAX = 65536
SEG_MAX_AGENTS = 131072


def _seg_win_hint(spec: speclib.GameSpec, A: int, margin: int) -> int:
    """Static partner-window width for the segmented sweeps: the expected
    agents within ``margin`` rows of a SEG_ROWS segment at uniform density
    (A / map height), with a 3x variance allowance + slack — windows wider
    than this fall back to the full sweep (correct but catastrophic at
    A ~ 1e5, so size generously; the width only costs linear pair work)."""
    per_row = -(-A // max(spec.height, 1))
    return ap.SEG_ROWS + 6 * margin * per_row + 512


def _use_seg(spec: speclib.GameSpec, A: int, n_envs: int = 1) -> bool:
    """Route big-single-world pair sweeps to the y-segmented kernels
    (OPT-IN: ``MAGENT_SEG=1``; bit-exact vs the grid path at A = 6k / 10k /
    20k / 100k on real TPU, scripts/test/diff_seg_chip.py).

    Defaults follow the measured crossovers (table above SEG_DEFAULT_MAX;
    clean numbers — the first measurements ran the O(A^2) overflow
    fallback unconditionally because vmap lowers a batched-predicate
    lax.cond to select_n, so VecGridWorld now steps unbatched at
    n_envs=1): ON in (QUAD_MAX, SEG_DEFAULT_MAX], where segmentation
    beats the sort+grid path by 1.2-2.3x; OFF elsewhere (below QUAD_MAX
    the plain quad sweeps win on bookkeeping; at 1e5+ density widens the
    partner windows until the near-half-VPU-peak sweeps lose to the
    sort's O(A log A)).  MAGENT_SEG=0 disables, =1 extends to
    SEG_MAX_AGENTS, =force engages from A=4096 (crossover experiments)."""
    mode = os.environ.get("MAGENT_SEG", "auto")
    if mode == "0" or n_envs != 1:
        # n_envs == 1 is a HARD requirement, not a tuning choice:
        # VecGridWorld only steps unbatched there, and under vmap the
        # overflow lax.cond lowers to select_n — BOTH branches execute,
        # including the full A^2 fallback
        return False
    if mode == "force":  # crossover experiments: engage below QUAD_MAX too
        return 4096 <= A <= SEG_MAX_AGENTS and ap.supports_pallas()
    hi = SEG_MAX_AGENTS if mode == "1" else SEG_DEFAULT_MAX
    # inclusive at QUAD_MAX_SINGLE: both gates are true there and seg takes
    # precedence in make_step — measured seg 3.17M vs quad 2.59M at 16384
    return ap.QUAD_MAX_SINGLE <= A <= hi and ap.supports_pallas()


def _gridless_capable(spec: speclib.GameSpec) -> bool:
    """Config shapes whose occupancy questions are pairwise-answerable:
    no food cells, no rotation footprints, no absorb demo.  Multi-cell
    bodies are fine — with turn_mode off every direction is NORTH, so each
    footprint is a static per-slot rectangle and the occupancy questions
    become pairwise interval-intersection tests (ops.attack_prefix rect
    kernels)."""
    return (
        not spec.food_mode
        and not spec.turn_mode
        and not bool(spec.g_can_absorb.any())
    )

def _attack_phase(spec: speclib.GameSpec, state: State, rank,
                  gridless: bool = False, seg_ctx=None, n_envs: int = 1):
    """Resolve all attack actions (reference: GridWorld.cc:470-517,
    Map.cc:209-310).

    ``gridless``: resolve target lookup pairwise (1x1 bodies, no food) and
    never touch the occupancy grid — see :mod:`magent_tpu.ops.attack_prefix`.
    """
    A = spec.n_agents_cap
    H, W = spec.height, spec.width
    act = state.last_action
    alive = state.active & ~state.dead

    attack_base = jnp.asarray(spec.s_attack_base)
    n_action = jnp.asarray(spec.s_n_action)
    is_attack = alive & (act >= attack_base) & (act < n_action)

    # target cell (reference: Map::get_attack_obj, Map.cc:209-252)
    att_idx = jnp.clip(act - attack_base, 0, spec.max_attack - 1)
    adx = _row_lookup(jnp.asarray(spec.s_att_dx), att_idx, spec.max_attack)
    ady = _row_lookup(jnp.asarray(spec.s_att_dy), att_idx, spec.max_attack)
    w = jnp.asarray(spec.s_width)
    l = jnp.asarray(spec.s_length)
    rx, ry = geo.save_to_real(state.x, state.y, state.dir, w, l)
    tx, ty = geo.rela_to_abs(
        rx, ry, state.dir,
        jnp.asarray(spec.s_att_x_offset) + adx,
        jnp.asarray(spec.s_att_y_offset) + ady,
    )
    in_board = (tx >= 0) & (tx < W) & (ty >= 0) & (ty < H)
    txc = jnp.clip(tx, 0, W - 1)
    tyc = jnp.clip(ty, 0, H - 1)
    # max |y reach| of any attack (target row offset from the attacker's
    # row, NORTH frames) — bounds the y-distance of interacting pairs for
    # the segmented sweeps
    att_reach_y = int(np.max(np.abs(
        np.asarray(spec.s_att_y_offset)[:, None] + np.asarray(spec.s_att_dy)
    ))) if A else 0
    seg = seg_ctx is not None
    if seg:
        sort_y, order = seg_ctx

    if gridless and spec.max_body_w > 1:
        # rect-containment occupant lookup (multi-cell bodies; dir is
        # always NORTH here so footprints are static per slot)
        bw_a, bh_a = geo.size_for_dir(state.dir, w, l)
        is_q = is_attack & in_board
        if seg:
            # one packed row gather permutes every int operand; hp rides a
            # second; results scatter back in one packed write (float hp
            # bitcast through int32) — index ops, not width, are the cost
            packed = jnp.stack(
                [jnp.where(is_q, txc, -2**20), jnp.where(is_q, tyc, -2**20),
                 state.x, state.y,
                 jnp.where(alive, bw_a, 0), jnp.where(alive, bh_a, 0),
                 jax.lax.bitcast_convert_type(
                     state.hp.astype(jnp.float32), jnp.int32)],
                axis=1)[order]
            hp_s = jax.lax.bitcast_convert_type(packed[:, 6], jnp.float32)
            m_occ = att_reach_y + spec.max_body_w
            t_s, h_s = ap.occupant_rect_seg(
                packed[:, 0], packed[:, 1], packed[:, 2], packed[:, 3],
                packed[:, 4], packed[:, 5], hp_s, sort_y, order,
                margin=m_occ, seg_win=_seg_win_hint(spec, A, m_occ))
            both = jnp.zeros((A, 2), jnp.int32).at[order].set(jnp.stack(
                [t_s, jax.lax.bitcast_convert_type(h_s, jnp.int32)], axis=1))
            tgt = both[:, 0]
            hp_t_occ = jax.lax.bitcast_convert_type(
                both[:, 1], jnp.float32).astype(state.hp.dtype)
        else:
            tgt, hp_t_occ = ap.occupant_rect(
                jnp.where(is_q, txc, -2**20), jnp.where(is_q, tyc, -2**20),
                state.x, state.y,
                jnp.where(alive, bw_a, 0), jnp.where(alive, bh_a, 0),
                state.hp,
            )
    elif gridless:
        # sentinels: queries use 2**30, dead agents' cells 2**29 — distinct
        # so dead cells never satisfy a (sentinel) query
        acell = jnp.where(is_attack & in_board, tyc * W + txc, 2**30)
        own_cell = jnp.where(alive, state.y * W + state.x, 2**29)
        tgt, hp_t_occ = ap.occupant(acell, own_cell, state.hp)
    else:
        tgt = jnp.where(is_attack & in_board, state.cell_slot[tyc, txc], -1)
    if spec.food_mode:
        food_amount = jnp.where(is_attack & in_board, state.cell_food[tyc, txc], -1.0)
        # presence is >= 0: a 0-value corpse is still attackable food
        food_target = is_attack & (tgt < 0) & (food_amount >= 0.0)

    # target group from boundary compares on the contiguous per-group slot
    # ranges (free), never a gather
    g = jnp.asarray(spec.group_of_slot)
    G = spec.n_groups
    tgt_c = jnp.clip(tgt, 0, A - 1)
    tgt_group = jnp.zeros(A, jnp.int32)
    for gg in range(1, G):
        tgt_group = tgt_group + (
            tgt_c >= int(spec.group_offsets[gg])
        ).astype(jnp.int32)
    valid = (
        (tgt >= 0)
        & (jnp.asarray(spec.s_attack_in_group) | (tgt_group != g))
    )

    # attack penalty for every attacker, hit or miss (GridWorld.cc:488,505)
    next_reward = state.next_reward + jnp.where(
        is_attack, jnp.asarray(spec.s_attack_penalty), 0.0
    )

    SENT = A  # sentinel segment for non-attacks
    tgt_key = jnp.where(valid, tgt, SENT).astype(jnp.int32)
    dmg_slot = jnp.where(valid, jnp.asarray(spec.s_damage), 0.0)

    def g_table(table):  # tiny per-group tables -> static select chain
        out = jnp.full(tgt_group.shape, float(table[0]), jnp.float32)
        for gg in range(1, G):
            out = jnp.where(tgt_group == gg, float(table[gg]), out)
        return out

    kr_t = g_table(spec.g_kill_reward)
    ks_t = g_table(spec.g_kill_supply)
    slot_iota = jnp.arange(A, dtype=jnp.int32)

    # seg implies the pairwise formulation stays viable past QUAD_MAX
    # (rank_prefix runs its segmented variant)
    use_quad = _use_quad(A, n_envs) or seg

    if use_quad:
        # ---- order-aware damage via the pairwise prefix kernel: every
        # attacker-side quantity becomes elementwise (no sort, no
        # permutation scatter-back); per-target damage is ONE scatter-max.
        # The kernel's pair sweep also picks up each target's hp, replacing
        # the hp row-gather (gridless already got it from the occupant pass).
        rank_key = ap.pack_rank(rank, A)
        if gridless:
            if seg:
                # attackers interact iff they share a target, which lies
                # within the attack reach of both
                pk = jnp.stack(
                    [tgt_key, rank_key,
                     jax.lax.bitcast_convert_type(
                         dmg_slot.astype(jnp.float32), jnp.int32)],
                    axis=1)[order]
                m_rank = 2 * (att_reach_y + spec.max_body_w)
                P_s = ap.rank_prefix_seg(
                    pk[:, 0], pk[:, 1],
                    jax.lax.bitcast_convert_type(pk[:, 2], jnp.float32),
                    sort_y, margin=m_rank,
                    seg_win=_seg_win_hint(spec, A, m_rank))
                P = jnp.zeros(A, jnp.float32).at[order].set(P_s).astype(
                    dmg_slot.dtype)
            else:
                P = ap.rank_prefix(tgt_key, rank_key, dmg_slot)
            hp_t = jnp.where(valid, hp_t_occ, jnp.inf)
        else:
            P, hp_t_raw = ap.rank_prefix(tgt_key, rank_key, dmg_slot, state.hp)
            hp_t = jnp.where(valid, hp_t_raw, jnp.inf)
        cum = P + dmg_slot
        not_yet_dead = hp_t - P >= 0.0  # target still alive when I strike
        acted = valid & not_yet_dead
        is_killer = acted & (hp_t - cum < 0.0)  # be_attack: hp < 0 (GridWorld.h:203-208)

        # applied damage per target = max cumulative among acted attackers
        # (the killer's overshoot counts, attacks after the kill do not)
        dmg_t = jnp.zeros(A + 1, state.hp.dtype).at[
            jnp.where(acted, tgt_key, A)
        ].max(jnp.where(acted, cum, 0.0))[:A]
        hp = state.hp - dmg_t
        died = (dmg_t > 0.0) & (hp < 0.0) & state.active & ~state.dead

        op_new = jnp.where(
            is_killer, OP_KILL, jnp.where(acted, OP_ATTACK, OP_NULL)
        )
        obj_new = jnp.where(acted, tgt_key, -1)
        kr_gain = jnp.where(is_killer, kr_t, 0.0)
        supply_per_slot = jnp.where(is_killer, ks_t, 0.0)
        killer_slot = is_killer  # for the food corpse drop below
    else:
        # ---- order-aware damage: ONE multi-operand sort by (target,
        # priority) carries every per-attacker value along, replacing a
        # lexsort plus a fan of post-sort gathers
        hp_t = jnp.where(valid, _pad_gather(state.hp, tgt_c, jnp.inf), jnp.inf)
        s_tgt, _, s_slot, s_dmg, s_kill_reward, s_kill_supply, s_tgt_hp, s_valid = (
            jax.lax.sort(
                (tgt_key, rank, slot_iota, dmg_slot, kr_t, ks_t, hp_t,
                 valid.astype(jnp.int32)),
                num_keys=2,
            )
        )
        s_valid = s_valid.astype(bool)
        seg_start = _segment_starts(s_tgt)
        s_cum = _segment_cumsum(s_dmg, seg_start)

        kill_here = s_valid & (s_tgt_hp - s_cum < 0.0)  # be_attack: hp < 0 (GridWorld.h:203-208)
        prev_kill = jnp.concatenate([jnp.zeros((1,), bool), kill_here[:-1]]) & ~seg_start
        is_killer = kill_here & ~prev_kill
        acted = s_valid & ~(kill_here & ~is_killer)  # attackers after the kill are no-ops

        # per-target effects: the segment-end row knows the full
        # (damage, died) totals from the cumsums, so ONE masked scatter-SET
        # replaces a scatter-ADD
        applied = jnp.where(acted, s_dmg, 0.0)
        cum_applied = _segment_cumsum(applied, seg_start)
        cum_kill = _segment_cumsum(is_killer.astype(state.hp.dtype), seg_start)
        seg_end = jnp.concatenate([seg_start[1:], jnp.ones((1,), bool)])
        tgt_fx = jnp.zeros((A + 1, 2), dtype=state.hp.dtype).at[
            jnp.where(seg_end, s_tgt, A)
        ].set(jnp.stack([cum_applied, cum_kill], axis=1))[:A]
        hp = state.hp - tgt_fx[:, 0]
        died = (tgt_fx[:, 1] > 0) & state.active & ~state.dead

        # attacker effects: ONE packed 4-wide scatter back through the
        # permutation (op, obj, kill_reward, kill_supply); op/obj are small
        # ints, exact in f32
        atk_pack = jnp.zeros((A, 4), jnp.float32).at[s_slot].set(
            jnp.stack(
                [
                    jnp.where(is_killer, OP_KILL, jnp.where(acted, OP_ATTACK, OP_NULL)
                              ).astype(jnp.float32),
                    jnp.where(acted, s_tgt, -1).astype(jnp.float32),
                    jnp.where(is_killer, s_kill_reward, 0.0),
                    jnp.where(is_killer, s_kill_supply, 0.0),
                ],
                axis=1,
            )
        )
        op_new = atk_pack[:, 0].astype(jnp.int32)
        obj_new = atk_pack[:, 1].astype(jnp.int32)
        kr_gain = atk_pack[:, 2]
        supply_per_slot = atk_pack[:, 3]
        if spec.food_mode:
            kill_pack = jnp.zeros((A, 1), jnp.int32).at[s_slot].set(
                is_killer.astype(jnp.int32)[:, None]
            )
            killer_slot = kill_pack[:, 0] > 0  # per-slot: this agent killed
        else:
            killer_slot = None

    last_op = jnp.where(op_new != OP_NULL, op_new, state.last_op)
    op_obj = jnp.where(op_new != OP_NULL, obj_new, state.op_obj)

    next_reward = next_reward + kr_gain
    hp_max = jnp.asarray(spec.s_hp_max)
    # every kill calls add_hp(kill_supply), which clamps to hp_max even for
    # zero/negative supply (GridWorld.h:185) — gate on the kill, not the sign
    is_kill_slot = op_new == OP_KILL
    hp = jnp.where(is_kill_slot, jnp.minimum(hp_max, hp + supply_per_slot), hp)

    # dying targets: replace reward with dead_penalty (GridWorld.h:203-208)
    next_reward = jnp.where(died, jnp.asarray(spec.s_dead_penalty), next_reward)
    dead = state.dead | died

    # remove dead bodies from the grid (scatter at the dead agents' rects;
    # per-cell gathers are the slow path on TPU); the gridless path keeps no
    # grid — later phases resolve occupancy pairwise against `dead`
    if gridless:
        cell_slot = state.cell_slot
    else:
        bw, bh = geo.size_for_dir(state.dir, w, l)
        cell_slot = _clear_body(
            state.cell_slot, died, state.x, state.y, bw, bh, spec.max_body_w
        )

    # corpse food drop at the attacked cell (food_mode, Map.cc:277-284):
    # scatter food_supply at each killer's target cell (kill cells are
    # unique per target, so slot order suffices — no sorted order needed)
    cell_food = state.cell_food
    if spec.food_mode:
        fs_t = jnp.asarray(spec.g_food_supply)[tgt_group]
        fx = jnp.where(killer_slot, txc, W)
        fy = jnp.where(killer_slot, tyc, H)
        cell_food = cell_food.at[fy, fx].set(jnp.where(killer_slot, fs_t, 0.0),
                                             mode="drop")

        # ---- eating existing food via attack (Map.cc:292-303) ----
        fcell = jnp.where(food_target, tyc * W + txc, H * W)
        forder = jnp.lexsort((rank, fcell))
        f_cell = fcell[forder]
        f_ok = food_target[forder]
        f_eat = jnp.where(f_ok, _pad_gather(jnp.asarray(spec.s_eat_ability), forder, 0.0), 0.0)
        f_start = _segment_starts(f_cell)
        f_cum = _segment_cumsum(f_eat, f_start)
        flat_food = cell_food.reshape(-1)
        f_avail = _pad_gather(flat_food, jnp.where(f_ok, f_cell, -1), 0.0)
        # remainder before this eater; the reference destroys food the moment
        # any eat leaves it below 0.1 (Map.cc:299-303), so a non-first eater
        # facing a sub-0.1 remainder gets nothing (a first eater may still
        # consume freshly-dropped food below 0.1)
        remain = f_avail - (f_cum - f_eat)
        amount = jnp.where((remain < 0.1) & ~f_start, 0.0,
                           jnp.clip(remain, 0.0, f_eat))
        gained = jnp.zeros(A).at[forder].add(amount)
        # add_hp clamps unconditionally (GridWorld.h:185), even for a 0 eat
        ate = jnp.zeros(A, bool).at[
            jnp.where(f_ok, forder, A)].set(True, mode="drop")
        hp = jnp.where(ate, jnp.minimum(hp_max, hp + gained), hp)
        eaten_tot = jnp.zeros(H * W + 1).at[f_cell].add(amount)[: H * W]
        n_eaters = jnp.zeros(H * W + 1, jnp.int32).at[f_cell].add(
            f_ok.astype(jnp.int32))[: H * W]
        flat_food = flat_food - eaten_tot
        # an eat leaving <0.1 DELETES the food (cell becomes blank,
        # Map.cc:299-303); uneaten sub-0.1 food persists and still blocks
        flat_food = jnp.where((flat_food < 0.1) & (n_eaters > 0), -1.0,
                              flat_food)
        cell_food = flat_food.reshape(H, W)

    return state.replace(
        hp=hp,
        dead=dead,
        next_reward=next_reward,
        last_op=last_op,
        op_obj=op_obj,
        cell_slot=cell_slot,
        cell_food=cell_food,
    )


def _starve_phase(spec: speclib.GameSpec, state: State, gridless: bool = False):
    """hp recovery / decay (reference: GridWorld.cc:519-542, Agent::starve
    GridWorld.h:194-201)."""
    alive = state.active & ~state.dead
    rec = jnp.asarray(spec.s_step_recover)
    hp_max = jnp.asarray(spec.s_hp_max)

    hp_pos = jnp.minimum(hp_max, state.hp + rec)  # add_hp clips at max
    if bool((spec.g_step_recover > 0).all()):
        # no type can starve: pure recovery, no death bookkeeping
        return state.replace(hp=jnp.where(alive, hp_pos, state.hp))
    hp_neg = state.hp + rec  # be_attack(-rec): no clip, death below 0
    hp = jnp.where(alive, jnp.where(rec > 0, hp_pos, hp_neg), state.hp)
    starved = alive & (rec <= 0) & (hp < 0.0)

    next_reward = jnp.where(starved, jnp.asarray(spec.s_dead_penalty), state.next_reward)
    dead = state.dead | starved

    if gridless:
        cell_slot = state.cell_slot
    else:
        w = jnp.asarray(spec.s_width)
        l = jnp.asarray(spec.s_length)
        bw, bh = geo.size_for_dir(state.dir, w, l)
        cell_slot = _clear_body(
            state.cell_slot, starved, state.x, state.y, bw, bh, spec.max_body_w
        )

    return state.replace(hp=hp, dead=dead, next_reward=next_reward, cell_slot=cell_slot)


def _wall_blocked_gridless(spec, wall_ctx, nx, ny):
    """Does the target rect anchored at (nx, ny) overlap a wall?

    ``wall_ctx=None`` — border-only walls (the device reset's default):
    answered by formula, zero gathers.  Otherwise one gather from the
    packed :func:`_wall_rect_code` grid (bit = the slot's static body
    size).  Only valid where in_bounds holds; callers mask accordingly.
    """
    if wall_ctx is None:
        return (nx == 0) | (ny == 0)
    code, s_bit = wall_ctx
    W, H = spec.width, spec.height
    cx = jnp.clip(nx, 0, W - 1)
    cy = jnp.clip(ny, 0, H - 1)
    return ((code[cy, cx] >> s_bit) & 1) != 0


def _move_phase_gridless_rect(spec, state, is_move, in_bounds, nx, ny,
                              bw, bh, alive, wall_ctx=None, seg_ctx=None):
    """Gridless move resolution for multi-cell bodies (static NORTH
    footprints): two pairwise rect sweeps reproduce the grid path's
    semantics cell-for-cell —

    1. blocking: the CURRENT occupant (excluding self) of the first
       occupied target-rect cell in the grid path's (i outer, j inner)
       scan order (the ``enc`` gather loop in :func:`_move_phase`);
    2. claims: a blank mover wins iff no lower slot's target rect covers
       any of its cells (the grid path's ``claim.at[...].min``
       arbitration); a loser collides with the winner of its FIRST lost
       cell — which equals the min-(first overlap cell, slot) lower-slot
       claimant (any claimant covering an earlier cell would make THAT
       cell the first lost one).

    Each sweep is ONE lexicographic min-reduction per pair
    (ops.attack_prefix.rect_first_overlap) — this phase owned the 1e5 FPS
    cliff when it ran max_body^2 per-cell sweeps.

    Unlike the 1x1 gridless path, blocking must resolve BEFORE claims: a
    blocked mover never claims in the grid path, but with rect overlap a
    blocked mover's claim could otherwise outrank a blank one's.
    """
    A = spec.n_agents_cap
    W, H = spec.width, spec.height
    MB = spec.max_body_w

    # border walls live at x==0 / y==0 (in_bounds excludes the far edges:
    # nx + bw < W keeps every body cell off the border columns); interior
    # walls, when present, come from the packed rect-overlap code grid
    wall_blocked = _wall_blocked_gridless(spec, wall_ctx, nx, ny)
    ok = is_move & in_bounds
    stay = ok & (nx == state.x) & (ny == state.y)

    # ---- sweep 1: blocking occupant at the first occupied cell ----
    # wall-blocked movers still query: the grid path's cell scan skips wall
    # cells (they block but never set collide_obj) and records the occupant
    # of the first AGENT cell, so a rect overlapping both a border wall and
    # a body must still collide with that body (Map.cc:486-501 semantics
    # through the enc loop in _move_phase)
    q_ok = ok & ~stay

    if seg_ctx is not None:
        # segmented sweeps for big single worlds (shared y-sort from the
        # step): permute every per-slot operand in ONE packed row gather,
        # run both sweeps in the sorted domain over per-segment partner
        # windows (A*SEG_WIN pairs instead of A^2), and scatter only the
        # two result arrays back — random access is index-count dominated,
        # so the bookkeeping must stay at ~3 index ops total.  The y-margin
        # bounds |y_i - y_j| for any interacting pair: bodies overlap
        # within MB rows and every target sits within max|move dy| of its
        # mover.
        max_dy = int(np.max(np.abs(spec.s_move_dy))) if A else 0
        margin = MB + 2 * max_dy
        sort_y, order = seg_ctx
        packed = jnp.stack(
            [nx, ny, bw, bh, state.x, state.y,
             q_ok.astype(jnp.int32), alive.astype(jnp.int32),
             wall_blocked.astype(jnp.int32)], axis=1)
        (nx_s, ny_s, bw_s, bh_s, x_s, y_s, qok_s, alive_s,
         wallb_s) = [c for c in jnp.moveaxis(packed[order], 1, 0)]
        qok_s = qok_s.astype(bool)

        seg_win = _seg_win_hint(spec, A, margin)
        res1 = ap.rect_first_overlap_seg(
            jnp.where(qok_s, nx_s, -2**20), jnp.where(qok_s, ny_s, -2**20),
            jnp.where(qok_s, bw_s, 0), jnp.where(qok_s, bh_s, 0),
            x_s, y_s,
            jnp.where(alive_s.astype(bool), bw_s, 0),
            jnp.where(alive_s.astype(bool), bh_s, 0),
            sort_y, order, max_body=MB, gate="exclude_self", margin=margin,
            seg_win=seg_win)
        blank_s = qok_s & ~(res1 < ap._NONE) & ~wallb_s.astype(bool)
        s2q_s = (
            jnp.where(blank_s, nx_s, -2**20),
            jnp.where(blank_s, ny_s, -2**20),
            jnp.where(blank_s, bw_s, 0), jnp.where(blank_s, bh_s, 0),
        )
        res2 = ap.rect_first_overlap_seg(
            *s2q_s, *s2q_s, sort_y, order,
            max_body=MB, gate="lower_only", margin=margin, seg_win=seg_win)
        both = jnp.zeros((A, 2), jnp.int32).at[order].set(
            jnp.stack([res1, res2], axis=1))  # one packed scatter
        occ_slot, head_slot = both[:, 0], both[:, 1]
    else:
        occ_slot = ap.rect_first_overlap(
            jnp.where(q_ok, nx, -2**20), jnp.where(q_ok, ny, -2**20),
            jnp.where(q_ok, bw, 0), jnp.where(q_ok, bh, 0),
            state.x, state.y,
            jnp.where(alive, bw, 0), jnp.where(alive, bh, 0),
            max_body=MB, gate="exclude_self",
        )
        blank_pre = q_ok & ~(occ_slot < ap._NONE) & ~wall_blocked
        s2q = (
            jnp.where(blank_pre, nx, -2**20),
            jnp.where(blank_pre, ny, -2**20),
            jnp.where(blank_pre, bw, 0), jnp.where(blank_pre, bh, 0),
        )
        head_slot = ap.rect_first_overlap(
            *s2q, *s2q, max_body=MB, gate="lower_only",
        )
    occupied = occ_slot < ap._NONE
    coll_occ = jnp.where(occupied, occ_slot, -1)
    blank = q_ok & ~occupied & ~wall_blocked
    lost = blank & (head_slot < ap._NONE)
    lose_to = jnp.where(lost, head_slot, -1)
    wins = blank & ~lost

    success = wins | stay
    coll_obj = jnp.where(blank & ~wins, lose_to,
                         jnp.where(occupied, coll_occ, -1))
    collide = is_move & ~success & in_bounds & (coll_obj >= 0)
    last_op = jnp.where(collide, OP_COLLIDE, state.last_op)
    op_obj = jnp.where(collide, coll_obj, state.op_obj)
    return state.replace(
        x=jnp.where(success, nx, state.x),
        y=jnp.where(success, ny, state.y),
        last_op=last_op, op_obj=op_obj,
    )


def _move_phase(spec: speclib.GameSpec, state: State, gridless: bool = False,
                wall_ctx=None, seg_ctx=None, n_envs: int = 1):
    """Resolve all move actions (reference: GridWorld.cc:573-613,
    Map::do_move Map.cc:313-358).

    ``gridless``: blocking occupants and cell claims resolve in one pairwise
    kernel sweep (1x1 bodies, border-only walls) and the occupancy grid is
    neither read nor rebuilt.  A blank mover's same-cell contenders are
    necessarily blank too (occupancy/wall status is per-cell), so blocked
    movers corrupting the claim counts cannot affect any winner.
    """
    A = spec.n_agents_cap
    H, W = spec.height, spec.width
    MB = spec.max_body_w
    act = state.last_action
    alive = state.active & ~state.dead
    slots = jnp.arange(A, dtype=jnp.int32)

    is_move = alive & ~state.absorbed & (act >= 0) & (act < jnp.asarray(spec.s_turn_base))
    midx = jnp.clip(act, 0, spec.max_move - 1)
    dx = _row_lookup(jnp.asarray(spec.s_move_dx), midx, spec.max_move)
    dy = _row_lookup(jnp.asarray(spec.s_move_dy), midx, spec.max_move)
    ddx, ddy = geo.rotate_move_delta(state.dir, dx, dy)
    nx = state.x + ddx
    ny = state.y + ddy

    w = jnp.asarray(spec.s_width)
    l = jnp.asarray(spec.s_length)
    bw, bh = geo.size_for_dir(state.dir, w, l)
    in_bounds = (nx >= 0) & (ny >= 0) & (nx + bw < W) & (ny + bh < H)  # Map.cc:454-455

    if gridless and MB > 1:
        return _move_phase_gridless_rect(
            spec, state, is_move, in_bounds, nx, ny, bw, bh, alive,
            wall_ctx, seg_ctx)

    if gridless:
        # border walls live at x==0 / y==0 (in_bounds already excludes the
        # far edges for 1x1 bodies); interior walls via the code-grid gather
        wall_blocked = _wall_blocked_gridless(spec, wall_ctx, nx, ny)
        ok = is_move & in_bounds & ~wall_blocked
        tcell = jnp.where(ok, ny * W + nx, 2**30)
        cell = jnp.where(alive, state.y * W + state.x, 2**29)
        cnt, head, occ = ap.move_resolve(tcell, cell)
        # an in-place move (the (0,0) delta is in every move range) always
        # succeeds: the only occupant of the target is the mover itself, and
        # any other agent targeting that cell is occupancy-blocked by the
        # stayer — its claim must not show up as contention here (the grid
        # path gets this via the blank gate, Map.cc:313-358 via self-skip)
        stay = ok & (nx == state.x) & (ny == state.y)
        occupied = ok & ~stay & (occ >= 0)
        blank = ok & ~stay & ~occupied
        wins = blank & (cnt == 0)
        success = wins | stay
        coll_obj = jnp.where(
            blank & ~wins, head, jnp.where(occupied, occ, -1))
        collide = is_move & ~success & in_bounds & (coll_obj >= 0)
        last_op = jnp.where(collide, OP_COLLIDE, state.last_op)
        op_obj = jnp.where(collide, coll_obj, state.op_obj)
        return state.replace(
            x=jnp.where(success, nx, state.x),
            y=jnp.where(success, ny, state.y),
            last_op=last_op, op_obj=op_obj,
        )

    # scan target rect: blank check + first colliding agent (x-major order,
    # Map::get_collide Map.cc:486-501)
    blank = is_move & in_bounds
    collide_obj = jnp.full(A, -1, jnp.int32)
    # encode wall/food into the occupancy grid so ONE gather answers
    # "blocked?" and "by whom?" (gathers are index-cost-dominated on TPU)
    enc = jnp.where(state.cell_wall, -2, state.cell_slot)
    if spec.food_mode:
        enc = jnp.where(state.cell_food >= 0.0, -3, enc)
    for i in range(MB):
        for j in range(MB):
            cell_ok = is_move & (i < bw) & (j < bh)
            cx = jnp.clip(nx + i, 0, W - 1)
            cy = jnp.clip(ny + j, 0, H - 1)
            e = enc[cy, cx]
            blocked = (e != -1) & (e != slots)
            blank = blank & (~cell_ok | ~blocked)
            hit = cell_ok & in_bounds & (e >= 0) & (e != slots) & (collide_obj < 0)
            collide_obj = jnp.where(hit, e, collide_obj)

    # cell claims: winner = lowest slot (reference buffer order = slot order)
    if MB == 1 and _use_quad(A, n_envs):
        # pairwise claims kernel: count-of-lower-slot-contenders + head slot
        # per mover, replacing the (cell, slot) sort + segment-head scan +
        # packed scatter-back
        tcell = jnp.where(blank, ny * W + nx, H * W)
        cnt, head = ap.move_claims(tcell)
        wins = blank & (cnt == 0)
        lose_to = jnp.where(blank & ~wins, head, -1)
    elif MB == 1:
        # sort contenders by (target cell, slot): the segment head wins the
        # cell, losers record the head's slot — replaces a claims grid
        # scatter-min + 32k-index gather (~0.6ms/step) with one small sort,
        # a log-depth segment-head scan and a single packed scatter-back
        tcell = jnp.where(blank, ny * W + nx, H * W)
        s_cell, s_slot2 = jax.lax.sort((tcell, slots), num_keys=2)
        seg_start = jnp.concatenate(
            [jnp.ones((1,), bool), s_cell[1:] != s_cell[:-1]])

        def _carry_head(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, av)

        _, head_slot = jax.lax.associative_scan(
            _carry_head, (seg_start, s_slot2))
        back = jnp.zeros((A, 2), jnp.int32).at[s_slot2].set(
            jnp.stack([seg_start.astype(jnp.int32), head_slot], axis=1))
        wins = blank & (back[:, 0] > 0)
        lose_to = jnp.where(blank & ~wins, back[:, 1], -1)
    else:
        claim = jnp.full((H + 1, W + 1), A, jnp.int32)
        for i in range(MB):
            for j in range(MB):
                ok = blank & (i < bw) & (j < bh)
                cx = jnp.where(ok, nx + i, W)
                cy = jnp.where(ok, ny + j, H)
                claim = claim.at[cy, cx].min(slots)
        wins = blank
        lose_to = jnp.full(A, -1, jnp.int32)
        for i in range(MB):
            for j in range(MB):
                ok = blank & (i < bw) & (j < bh)
                cx = jnp.clip(nx + i, 0, W)
                cy = jnp.clip(ny + j, 0, H)
                winner = claim[cy, cx]
                lost = ok & (winner != slots)
                wins = wins & ~lost
                lose_to = jnp.where(lost & (lose_to < 0), winner, lose_to)

    success = blank & wins

    # collisions: blocked-by-agent, or lost a contested cell to another mover
    coll_obj = jnp.where(blank & ~wins, lose_to, collide_obj)
    collide = is_move & ~success & in_bounds & (coll_obj >= 0)

    # can_absorb special rule (Map.cc:340-353): first collider is absorbed
    # into the absorber, which doubles hp; the collider dies silently.
    last_op, op_obj = state.last_op, state.op_obj
    dead = state.dead
    hp = state.hp
    absorbed = state.absorbed
    cell_slot = state.cell_slot
    if bool(spec.g_can_absorb.any()):
        obj_can = collide & _pad_gather(jnp.asarray(spec.s_can_absorb), coll_obj, False)
        obj_absorbed = _pad_gather(absorbed, coll_obj, True)
        cand = collide & obj_can & ~obj_absorbed
        winner_per_obj = jnp.full(A + 1, A, jnp.int32).at[
            jnp.where(cand, coll_obj, A)
        ].min(slots)[:A]
        absorb_win = cand & (winner_per_obj[jnp.clip(coll_obj, 0, A - 1)] == slots)
        newly_absorbed = jnp.zeros(A, bool).at[jnp.where(absorb_win, coll_obj, A)].set(
            True, mode="drop"
        )
        absorbed = absorbed | newly_absorbed
        hp = jnp.where(newly_absorbed, hp * 2.0, hp)
        dead = dead | absorb_win
        cell_slot = _clear_body(cell_slot, absorb_win, state.x, state.y, bw, bh, MB)
        # the absorb winner records OP_COLLIDE like any collider
        # (Map.cc:344-351); later colliders see absorbed=true and are silent
        set_op = collide & (~obj_can | absorb_win)
    else:
        set_op = collide

    last_op = jnp.where(set_op, OP_COLLIDE, last_op)
    op_obj = jnp.where(set_op, coll_obj, op_obj)

    # commit moves
    x = jnp.where(success, nx, state.x)
    y = jnp.where(success, ny, state.y)
    if MB == 1:
        # rebuild the grid from final positions: one scatter + a cheap
        # memset replaces the clear-old + fill-new scatter pair (the next
        # reader is the following step's attack phase)
        alive_now = state.active & ~dead
        cell = jnp.where(alive_now, y * W + x, H * W)
        cell_slot = (
            jnp.full(H * W, -1, jnp.int32)
            .at[cell]
            .set(slots, mode="drop")
            .reshape(H, W)
        )
    else:
        cell_slot = _clear_body(cell_slot, success, state.x, state.y, bw, bh, MB)
        cell_slot = _fill_body(cell_slot, success, nx, ny, bw, bh, slots, MB)

    return state.replace(
        x=x, y=y, dead=dead, hp=hp, absorbed=absorbed,
        last_op=last_op, op_obj=op_obj, cell_slot=cell_slot,
    )


def _turn_phase(spec: speclib.GameSpec, state: State):
    """Turn actions (turn_mode): rotate body about its turn anchor
    (reference: GridWorld.cc:544-571, Map::do_turn Map.cc:361-406).

    Conflict policy mirrors the move phase: rotations whose destination rect is
    blank (w.r.t. phase start) and uncontested commit simultaneously.
    """
    A = spec.n_agents_cap
    H, W = spec.height, spec.width
    MB = spec.max_body_w
    act = state.last_action
    alive = state.active & ~state.dead
    slots = jnp.arange(A, dtype=jnp.int32)

    turn_base = jnp.asarray(spec.s_turn_base)
    is_turn = alive & (act >= turn_base) & (act < jnp.asarray(spec.s_attack_base))
    # reference quirk: turn actions are buffered as the ABSOLUTE action index
    # (act - move_base with move_base = 0, GridWorld.cc:431/449); the body
    # rotation always takes do_turn's clockwise branch (`wise == -1` never
    # fires, Map.cc:380-386) while the facing advances by the raw value:
    # new_dir = (dir + 2*act - 1) % 4 (Map.cc:366)
    wise_raw = 2 * act - 1

    w = jnp.asarray(spec.s_width)
    l = jnp.asarray(spec.s_length)
    bw, bh = geo.size_for_dir(state.dir, w, l)
    new_dir = (state.dir + wise_raw) % 4

    ax_, ay_ = geo.save_to_real(state.x, state.y, state.dir, w, l)
    anchor_x, anchor_y = geo.rela_to_abs(ax_, ay_, state.dir, 0, 0)  # turn offsets are 0
    dx = ax_ - anchor_x
    dy = ay_ - anchor_y
    new_rx = anchor_x + dy  # clockwise branch always (see quirk above)
    new_ry = anchor_y - dx
    sx, sy = geo.real_to_save(new_rx, new_ry, new_dir, w, l)
    nbw, nbh = geo.size_for_dir(new_dir, w, l)

    in_bounds = (sx >= 0) & (sy >= 0) & (sx + nbw < W) & (sy + nbh < H)
    blank = is_turn & in_bounds
    enc = jnp.where(state.cell_wall, -2, state.cell_slot)
    if spec.food_mode:
        enc = jnp.where(state.cell_food >= 0.0, -3, enc)
    for i in range(MB):
        for j in range(MB):
            cell_ok = is_turn & (i < nbw) & (j < nbh)
            cx = jnp.clip(sx + i, 0, W - 1)
            cy = jnp.clip(sy + j, 0, H - 1)
            e = enc[cy, cx]
            blocked = (e != -1) & (e != slots)
            blank = blank & (~cell_ok | ~blocked)

    claim = jnp.full((H + 1, W + 1), A, jnp.int32)
    for i in range(MB):
        for j in range(MB):
            ok = blank & (i < nbw) & (j < nbh)
            cx = jnp.where(ok, sx + i, W)
            cy = jnp.where(ok, sy + j, H)
            claim = claim.at[cy, cx].min(slots)
    wins = blank
    for i in range(MB):
        for j in range(MB):
            ok = blank & (i < nbw) & (j < nbh)
            cx = jnp.clip(sx + i, 0, W)
            cy = jnp.clip(sy + j, 0, H)
            wins = wins & (~ok | (claim[cy, cx] == slots))
    success = blank & wins

    cell_slot = _clear_body(state.cell_slot, success, state.x, state.y, bw, bh, MB)
    cell_slot = _fill_body(cell_slot, success, sx, sy, nbw, nbh, slots, MB)
    return state.replace(
        x=jnp.where(success, sx, state.x),
        y=jnp.where(success, sy, state.y),
        dir=jnp.where(success, new_dir, state.dir),
        cell_slot=cell_slot,
    )


def make_step(spec: speclib.GameSpec, *, maintain_grid: bool = True,
              walls=None, n_envs: int = 1):
    """Build the jittable full-step function for a spec.

    ``maintain_grid=False`` (vectorized lockstep path): when the config is
    :func:`_gridless_capable` — 1x1 bodies, no food, no turn mode, no
    absorb — the step resolves every occupancy question pairwise in the VPU
    kernels and never reads or rebuilds ``state.cell_slot`` (which then goes
    stale; observations render from positions, so nothing in the lockstep
    loop reads it).  Eliminates four ~0.3 ms grid scatters/gathers per step
    at battle scale.  ``MAGENT_GRIDLESS=0`` forces the grid path for
    differential testing.

    ``walls`` — static full [H, W] bool wall map when the layout has
    INTERIOR walls (reference protocol: test_1m.py adds n/10 random wall
    cells).  ``None`` (the default) means border-only walls — the device
    reset's default — and the gridless move answers wall questions by
    formula instead of a gather.  The grid path ignores this (it reads the
    traced ``state.cell_wall``, which covers any layout).
    """
    rules = spec.compiled_rules()
    G = spec.n_groups
    A_cap = spec.n_agents_cap
    # rect configs may stay gridless past QUAD_MAX: every pairwise sweep of
    # the rect path (move blocking/claims, attack occupant, rank prefix)
    # has a y-segmented variant whose pair work is A*SEG_WIN, not A^2
    # (ops.attack_prefix.*_seg).  1x1 configs keep the QUAD_MAX bound —
    # their cell-equality kernels are not segmented.
    # the routing decisions are captured ONCE here: step() must not re-read
    # env vars at trace time (a retrace after an env change would silently
    # flip paths — e.g. gridless past QUAD_MAX with the seg branches off)
    seg_ok = spec.max_body_w > 1 and _use_seg(spec, A_cap, n_envs)
    gridless = (
        not maintain_grid
        and _gridless_capable(spec)
        and (_use_quad(A_cap, n_envs) or seg_ok)
        and os.environ.get("MAGENT_GRIDLESS", "auto") != "0"
    )
    use_seg_flag = gridless and _use_seg(spec, A_cap, n_envs)
    wall_ctx = None
    if gridless and walls is not None:
        walls = np.asarray(walls, bool)
        interior = walls.copy()
        interior[0, :] = interior[-1, :] = False
        interior[:, 0] = interior[:, -1] = False
        if interior.any():
            code, s_bit = _wall_rect_code(spec, walls)
            wall_ctx = (jnp.asarray(code), jnp.asarray(s_bit))

    def step(state: State, actions=None) -> State:
        if actions is not None:
            state = state.replace(last_action=jnp.asarray(actions, jnp.int32))

        # attack priority = random keys (the reference shuffles its attack
        # buffer with the engine rng, GridWorld.cc:464-468; random keys give
        # an equivalent uniform order).  The keys come from a SplitMix-style
        # integer mix of (fresh subkey scalar, slot): counter-quality
        # randomness is all a shuffle priority needs, and threefry bits for
        # [A] lanes cost ~0.16ms/step at battle scale.
        key, sub = jax.random.split(state.key)
        slot_u = jnp.arange(spec.n_agents_cap, dtype=jnp.uint32)
        z = sub[0].astype(jnp.uint32) + slot_u * jnp.uint32(0x9E3779B9)
        z = (z ^ (z >> 16)) * jnp.uint32(0x85EBCA6B)
        z = (z ^ (z >> 13)) * jnp.uint32(0xC2B2AE35)
        rank = z ^ (z >> 16)
        state = state.replace(key=key)

        # named scopes label the phases in jax.profiler / xprof traces
        # (the reference's compile-gated LOG(TRACE) equivalents,
        # reference: GridWorld.cc:460-618)
        # one y-sort serves every segmented pair sweep this step (positions
        # only change in the move phase, which runs last)
        seg_ctx = None
        if use_seg_flag:
            sort_y, order = jax.lax.sort(
                (state.y.astype(jnp.int32),
                 jnp.arange(spec.n_agents_cap, dtype=jnp.int32)),
                num_keys=1)
            seg_ctx = (sort_y, order)
        with jax.named_scope("attack"):
            state = _attack_phase(spec, state, rank, gridless=gridless,
                                  seg_ctx=seg_ctx, n_envs=n_envs)
        with jax.named_scope("starve"):
            state = _starve_phase(spec, state, gridless=gridless)
        if spec.turn_mode:
            with jax.named_scope("turn"):
                state = _turn_phase(spec, state)
        with jax.named_scope("move"):
            state = _move_phase(spec, state, gridless=gridless,
                                wall_ctx=wall_ctx, seg_ctx=seg_ctx,
                                n_envs=n_envs)

        # reward rules (reference: GridWorld::calc_reward, GridWorld.cc:681-692)
        next_reward, group_reward, terminal = state.next_reward, state.group_reward, False
        for rule in rules:
            next_reward, group_reward, trig = rule.apply(spec, state, next_reward, group_reward)
            if rule.is_terminal:
                terminal = jnp.logical_or(terminal, trig)
        state = state.replace(next_reward=next_reward, group_reward=group_reward)

        # done: any group extinct (GridWorld.cc:618-630).  The reference's
        # alive count is size - dead_ct, and absorb-collide deaths never bump
        # dead_ct (Map.cc:340-353) — with per-step op rotation (clear_dead /
        # VecGridWorld.transition) a dead agent with a COLLIDE op can only
        # have died that way this step; requiring the collide object to be an
        # absorber keeps the check exact even over raw step() chains where
        # ops go stale (an attack victim's stale op_obj is a non-absorber).
        counted_dead = state.dead
        if bool(spec.g_can_absorb.any()):
            obj_absorbed = _pad_gather(state.absorbed, state.op_obj, False)
            counted_dead = counted_dead & ~(
                (state.last_op == OP_COLLIDE) & obj_absorbed)
        alive = (state.active & ~counted_dead).astype(jnp.int32)
        # per-group counts over static slot ranges (a gidx-indexed
        # scatter-add costs ~0.3ms/step at battle scale; slice sums are free)
        alive_per_group = jnp.stack([
            jnp.sum(alive[g.offset : g.offset + g.cap]) for g in spec.groups
        ])
        done = jnp.any(alive_per_group == 0)
        done = jnp.logical_or(done, terminal)

        return state.replace(done=done, step_ct=state.step_ct + 1)

    return step


def make_clear_dead(spec: speclib.GameSpec):
    """Build the jittable clear_dead: per-group stable compaction + per-step
    reward/op reset (reference: GridWorld::clear_dead GridWorld.cc:633-665,
    Agent::init_reward GridWorld.h:168-174)."""
    A = spec.n_agents_cap
    G = spec.n_groups
    offsets = jnp.asarray(spec.group_offsets)
    gidx = jnp.asarray(spec.group_of_slot)

    def clear_dead(state: State) -> State:
        keep = state.active & ~state.dead
        keep_i = keep.astype(jnp.int32)
        cum = jnp.cumsum(keep_i)
        # exclusive cumsum at each group's first slot
        base = (cum - keep_i)[offsets]  # [G]
        new_in_group = cum - 1 - base[gidx]
        new_slot = offsets[gidx] + new_in_group  # valid where keep

        # inverse permutation: which old slot fills each new slot
        inv = jnp.full(A, -1, jnp.int32).at[jnp.where(keep, new_slot, A)].set(
            jnp.arange(A, dtype=jnp.int32), mode="drop"
        )
        filled = inv >= 0
        invc = jnp.clip(inv, 0, A - 1)

        def permute(arr, default):
            return jnp.where(filled, arr[invc], default)

        step_reward = jnp.asarray(spec.s_step_reward)
        new_state = state.replace(
            x=permute(state.x, 0),
            y=permute(state.y, 0),
            dir=permute(state.dir, speclib.NORTH),
            hp=permute(state.hp, 0.0),
            active=filled,
            dead=jnp.zeros(A, bool),
            absorbed=permute(state.absorbed, False),
            id=permute(state.id, 0),
            last_action=permute(state.last_action, 0),
            # init_reward: last <- next, next <- step_reward
            last_reward=permute(state.next_reward, 0.0),
            next_reward=jnp.where(filled, step_reward, 0.0),
            last_op=jnp.full(A, OP_NULL, jnp.int32),
            op_obj=jnp.full(A, -1, jnp.int32),
            group_reward=jnp.zeros(G, jnp.float32),
            n_in_group=jnp.zeros(G, jnp.int32).at[gidx].add(filled.astype(jnp.int32)),
        )

        # remap grid occupancy to compacted slots
        remap = jnp.full(A + 1, -1, jnp.int32).at[jnp.where(keep, jnp.arange(A), A)].set(
            new_slot.astype(jnp.int32), mode="drop"
        )[:A]
        occ = state.cell_slot
        occ_new = jnp.where(occ >= 0, _pad_gather(remap, occ, -1), occ)
        return new_state.replace(cell_slot=occ_new)

    return clear_dead


