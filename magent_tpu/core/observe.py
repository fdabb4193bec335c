"""Vectorized observation rendering.

Replaces the reference's per-agent window scan (reference: Map::extract_view,
src/gridworld/Map.cc:129-207 driven by GridWorld::get_observation,
GridWorld.cc:292-401) with a render-then-slice pipeline built for the TPU:

1. **scatter** agent channels and normalized hp into dense per-cell grids
   (never gather per cell — random-index gathers are the slow path on TPU);
2. render the grids into a per-observer-group padded channel image
   ``gfull [B, Hp, Wp*C]`` with pure elementwise compares against constant
   channel tables (the observer's channel permutation, GridWorld.cc:897-913,
   is folded into those constants);
3. slice each agent's (vh, vw*C) window out of the image with the Pallas
   window-gather kernel (:mod:`magent_tpu.ops.window_gather`), masked by the
   view range; an XLA gather fallback covers CPU/tests;
4. add minimap channels + the feature vector (id embedding, last-action
   one-hot, last reward, absolute coords) per GridWorld.cc:327-400.

A rotation-capable legacy path handles ``turn_mode`` (per-direction window
rotation), using plain XLA gathers.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec as speclib
from ..ops import window_gather as wg
from . import geometry as geo
from .state import State

# the kernel's image + output blocks double-buffer inside the ~16MB scoped
# VMEM limit; images above this take the banded path (module-level so tests
# can shrink it to force the banded branch on small maps)
VMEM_IMAGE_BUDGET = 6 * 1024 * 1024


# --------------------------------------------------------------------- helpers
def _batched(state: State) -> bool:
    return state.x.ndim == 2


_OBS_KERNEL_VALUES = ("auto", "xla", "roll")


def _obs_kernel_env() -> str:
    """Validated MAGENT_OBS_KERNEL knob — a typo ('XLA', 'gather') silently
    measuring the default path would corrupt forced-path comparisons."""
    v = os.environ.get("MAGENT_OBS_KERNEL", "auto").lower()
    if v not in _OBS_KERNEL_VALUES:
        raise ValueError(
            f"MAGENT_OBS_KERNEL={v!r}: expected one of {_OBS_KERNEL_VALUES}"
        )
    return v


def _channel_tables(spec: speclib.GameSpec, group: int):
    """Constant per-observed-channel source tables.

    ``inv_has[c]``: canonical channel whose presence lights observed channel
    c (wall/food/group-has), or -1.  ``inv_hp[c]``: canonical group channel
    whose hp fills observed channel c, or -1.
    """
    C = spec.n_channel
    perm = spec.channel_perm(group)
    inv_has = np.full(C, -1, np.int32)
    inv_hp = np.full(C, -1, np.int32)
    inv_has[0] = 0  # wall
    if spec.food_mode:
        inv_has[1] = 1
    for gg in range(spec.n_groups):
        orig = spec.group2channel(gg)
        inv_has[perm[orig]] = orig
        inv_hp[perm[orig] + 1] = orig
    return inv_has, inv_hp


# packed cell encoding: channel code in the high bits, normalized hp as a
# 24-bit fixed-point fraction in the low bits — ONE scatter renders both
# (scatter cost is index-count dominated; the decode fuses into the
# compare-table expansion for free)
_HP_SHIFT = 24
_HP_MASK = (1 << _HP_SHIFT) - 1
# fixed-point "one" is 2**23 so a full-hp agent decodes to exactly 1.0,
# with headroom to 2.0 (can_absorb doubles hp past hp_max)
_HP_SCALE = float(1 << (_HP_SHIFT - 1))


def make_grids(spec: speclib.GameSpec):
    """state -> packed grid [B, Hp, Wp] int32.

    Shared across observer groups; geometry is padded for the largest view.
    Each cell holds ``code << 24 | round(hp / hp_max * 2**23)`` where code is
    the canonical channel (C = empty sentinel, 0 = wall, 1 = food); the
    quantization error (< 6e-8, clipped at hp/hp_max < 2 for can_absorb's
    doubled hp) is far below the reference's f32 observation noise floor.
    """
    H, W, C = spec.height, spec.width, spec.n_channel
    max_vh = max(g.type.view_range.height for g in spec.groups)
    max_vw = max(g.type.view_range.width for g in spec.groups)
    Hp, Wp, lanes, pad_y, pad_x = wg.padded_geometry(H, W, C, max_vh, max_vw)
    A = spec.n_agents_cap
    MB = spec.max_body_w
    agent_ch = (spec.channel_base + spec.group_of_slot * spec.channel_scale).astype(
        np.int32
    )
    assert int(agent_ch.max()) < 64 and C < 64, "channel codes must fit 6 bits"
    hp_max = np.asarray(spec.s_hp_max, np.float32)  # precomputed per-slot

    def grids_one(state: State):
        base = jnp.full((Hp, Wp), C << _HP_SHIFT, jnp.int32)
        base = base.at[pad_y : pad_y + H, pad_x : pad_x + W].set(
            jnp.where(state.cell_wall, 0, C << _HP_SHIFT)
        )
        if spec.food_mode:
            base = base.at[pad_y : pad_y + H, pad_x : pad_x + W].min(
                jnp.where(state.cell_food >= 0.0, 1 << _HP_SHIFT, C << _HP_SHIFT)
            )

        ok_agent = state.active & ~state.dead
        w = jnp.asarray(spec.s_width)
        l = jnp.asarray(spec.s_length)
        bw, bh = geo.size_for_dir(state.dir, w, l)
        q = jnp.clip(
            jnp.round(state.hp / jnp.asarray(hp_max) * _HP_SCALE).astype(jnp.int32),
            0, _HP_MASK,
        )
        vals = (jnp.asarray(agent_ch) << _HP_SHIFT) | q
        flat = base.reshape(-1)
        for i in range(MB):
            for j in range(MB):
                ok = ok_agent & (i < bw) & (j < bh)
                # positive OOB sentinel: JAX wraps negative indices BEFORE
                # the mode="drop" check, so -1 would hit the last cell
                cell = jnp.where(ok, (state.y + j + pad_y) * Wp
                                 + (state.x + i + pad_x), Hp * Wp)
                flat = flat.at[cell].set(vals, mode="drop")
        return flat.reshape(Hp, Wp)

    def grids(state: State):
        if _batched(state):
            return jax.vmap(grids_one)(state)
        return grids_one(state)

    grids.geometry = (Hp, Wp, lanes, pad_y, pad_x)
    return grids


def _render_image(spec, group, packed, lanes):
    """packed grid -> observer-group padded channel image [B, Hp, lanes]."""
    C = spec.n_channel
    inv_has, inv_hp = _channel_tables(spec, group)
    B, Hp, Wp = packed.shape
    code = packed >> _HP_SHIFT
    hpv = (packed & _HP_MASK).astype(jnp.float32) * (1.0 / _HP_SCALE)
    has = (code[..., None] == jnp.asarray(inv_has)).astype(jnp.float32)
    hp = (code[..., None] == jnp.asarray(inv_hp)).astype(jnp.float32) * hpv[
        ..., None
    ]
    img = (has + hp).reshape(B, Hp, Wp * C)
    return jnp.pad(img, ((0, 0), (0, 0), (0, lanes - Wp * C)))


def window_layout(spec: speclib.GameSpec, group: int, geometry):
    """Static window math for one observer group, shared with the profiling
    scripts so they measure exactly the production path (ADVICE r2).

    ``geometry`` is ``grids_fn.geometry``.  Returns a dict with ``vh``,
    ``vw``, ``mask`` ([vh, vw*C] f32), ``chunk`` (production chunk size),
    ``replica_ok`` (whether :func:`window_gather4`'s size constraints hold)
    and ``pos_fn(state) -> [B, cap]`` packed top-left cell indices
    (NORTH-only fast path; matches observe_batched).
    """
    t = spec.groups[group].type
    gs = spec.groups[group]
    vr = t.view_range
    C = spec.n_channel
    Hp, Wp, lanes, pad_y, pad_x = geometry
    mask = jnp.asarray(np.repeat(vr.mask.astype(np.float32), C, axis=1))
    sl = slice(gs.offset, gs.offset + gs.cap)

    def pos_fn(state: State):
        tlx = state.x[:, sl] + t.view_x_offset + vr.x1 + pad_x
        tly = state.y[:, sl] + t.view_y_offset + vr.y1 + pad_y
        return tly * Wp + tlx

    return dict(
        vh=vr.height, vw=vr.width, mask=mask, pos_fn=pos_fn,
        chunk=min(200, wg._ceil_to(gs.cap, 4)),
        replica_ok=(vr.height <= 13 and vr.width * C <= 65),
    )


def make_observe(spec: speclib.GameSpec, group: int, *, force_xla: bool = False,
                 interpret: bool = False, obs_dtype=jnp.float32):
    """Build the observe function for one group.

    The returned function accepts either a single-env state (arrays [A, ...])
    or a batched state (arrays [B, A, ...]); output shapes follow.  Optional
    ``grids=(ch_grid, hp_grid)`` lets callers share the scatter pass across
    groups.

    ``obs_dtype``: dtype of the returned views.  All window math runs in f32;
    ``bfloat16`` casts inside the kernel store, halving the ~260MB/pass of
    window HBM writes at battle scale (~19% faster per kernel call on v5e).
    Defaults to f32 — the bit-exact reference-parity dtype
    (Map.cc:129-207 fills float buffers).
    """
    if spec.turn_mode:
        return _make_observe_rotating(spec, group, obs_dtype=obs_dtype,
                                      force_xla=force_xla,
                                      interpret=interpret)

    t = spec.groups[group].type
    gs = spec.groups[group]
    vr = t.view_range
    vh, vw = vr.height, vr.width
    C = spec.n_channel
    H, W, G = spec.height, spec.width, spec.n_groups
    emb = spec.embedding_size
    n_action = t.n_action
    perm = spec.channel_perm(group)

    grids_fn = make_grids(spec)
    Hp, Wp, lanes, pad_y, pad_x = grids_fn.geometry

    # window mask + position math shared with the profiling scripts
    layout = window_layout(spec, group, grids_fn.geometry)
    mask = layout["mask"]  # [vh, vw*C]
    kchunk = layout["chunk"]

    # minimap pooling factors (GridWorld.cc:328-329)
    scale_h = (H + vh - 1) // vh
    scale_w = (W + vw - 1) // vw
    gof = spec.group_of_slot

    # the kernel keeps one env's padded channel image in VMEM (~16MB/core);
    # very large maps (the 1M-agent single-map scale) instead process the
    # image in horizontal bands with agents sorted by band
    image_bytes = Hp * lanes * 4
    # the kernel's image + output blocks double-buffer inside the ~16MB
    # scoped VMEM limit, so cap the image at ~6MB (2*(img + chunk_out) must
    # fit); larger images take the banded path
    fits_vmem = image_bytes <= VMEM_IMAGE_BUDGET
    band_rows = 32
    rows_margin = wg._ceil_to(vh + 7, 8)
    band_fits = (band_rows + rows_margin) * lanes * 4 <= 8 * 1024 * 1024
    backend_ok = wg.supports_pallas() or interpret
    # MAGENT_OBS_KERNEL=xla forces the plain-gather path (small-population
    # measurements; cf. MAGENT_ATTACK_PATH / MAGENT_GRIDLESS)
    obs_kernel = _obs_kernel_env()
    force_xla = force_xla or obs_kernel == "xla"
    use_pallas = (not force_xla) and fits_vmem and backend_ok
    use_banded = (not force_xla) and not fits_vmem and band_fits and backend_ok
    # replica variant: minimum-size loads, 4x image VMEM (see window_gather4)
    # the 4 replicas double-buffer like the single image does, so they get
    # the same ~6MB budget (12MB was observed to OOM scoped VMEM at
    # map=279/C=5 geometry: 4x2.35MB image + output blocks > 16MB)
    use_replica = (
        use_pallas and vh <= 13 and vw * C <= 65
        and 4 * image_bytes <= VMEM_IMAGE_BUDGET
        and obs_kernel != "roll"
    )

    def observe_batched(state: State, grids=None):
        B = state.x.shape[0]
        if grids is None:
            grids = grids_fn(state)
        packed = grids
        img = _render_image(spec, group, packed, lanes)

        sl = slice(gs.offset, gs.offset + gs.cap)
        x = state.x[:, sl]
        y = state.y[:, sl]
        # window top-left in padded map cells (NORTH-only fast path)
        pos = layout["pos_fn"](state)

        # --- minimap content (GridWorld.cc:327-384): the pooled global maps
        # are identical for every agent of the group; the kernel adds them
        # (plus the per-agent self mark) while writing each window ---
        mm_img = mm_mask2d = self_cell = None
        if spec.minimap_mode:
            px = jnp.clip(state.x // scale_w, 0, vw - 1)
            py = jnp.clip(state.y // scale_h, 0, vh - 1)
            # deliberate divergence: the reference counts dead-but-uncleared
            # agents until clear_dead (GridWorld.cc:341-352); the lockstep
            # vectorized path never compacts, so dead agents are excluded
            # here to keep minimaps meaningful (equal whenever observations
            # follow clear_dead, as in every reference loop)
            counted = state.active & ~state.dead
            if t.can_absorb:  # observer type gates this (GridWorld.cc:341-347)
                counted = counted & ~state.absorbed
            gof_j = jnp.asarray(gof)

            if spec.max_body_w == 1 and not t.can_absorb:
                # pool the already-rendered channel grid with 0/1 binning
                # matmuls (MXU work) instead of a per-agent scatter: every
                # alive agent occupies exactly one cell marked with its
                # group's channel code, so bin counts are Py @ ind @ Px^T
                Py = np.zeros((vh, packed.shape[1]), np.float32)
                Px = np.zeros((packed.shape[2], vw), np.float32)
                for yy in range(H):
                    Py[min(yy // scale_h, vh - 1), pad_y + yy] = 1.0
                for xx in range(W):
                    Px[pad_x + xx, min(xx // scale_w, vw - 1)] = 1.0
                code = spec.channel_base + np.arange(G) * spec.channel_scale
                ind = ((packed >> _HP_SHIFT)[..., None] == jnp.asarray(code)
                       ).astype(jnp.float32)  # [B, Hp, Wp, G]
                pooled = jnp.einsum(
                    "rh,bhwg,wc->bgrc", jnp.asarray(Py), ind, jnp.asarray(Px)
                )
                totals = jnp.maximum(jnp.sum(pooled, axis=(2, 3)), 1.0)
                pooled = pooled / totals[:, :, None, None]  # [B, G, vh, vw]
            else:
                def pool_one(pxe, pye, counte):
                    flat = jnp.zeros((G, vh * vw), jnp.float32).at[
                        gof_j, pye * vw + pxe
                    ].add(counte.astype(jnp.float32))
                    totals = jnp.maximum(jnp.sum(flat, axis=1), 1.0)
                    return (flat / totals[:, None]).reshape(G, vh, vw)

                pooled = jax.vmap(pool_one)(px, py, counted)  # [B, G, vh, vw]

            # pooled maps -> their observed channels, one static stack
            chan_src = np.full(C, -1, np.int32)
            for gg in range(G):
                chan_src[perm[spec.group2channel(gg)] + 2] = gg
            pooled_ext = jnp.concatenate(
                [pooled, jnp.zeros((B, 1, vh, vw), jnp.float32)], axis=1
            )
            mm = pooled_ext[:, jnp.asarray(np.where(chan_src < 0, G, chan_src))]
            mm = jnp.moveaxis(mm, 1, -1)  # [B, vh, vw, C]
            mm_img = mm.reshape(B, vh, vw * C)
            mm_ch = (chan_src >= 0).astype(np.float32)
            mm_mask2d = jnp.asarray(np.tile(mm_ch, (vh, vw)))  # [vh, vw*C]
            self_cell = py[:, sl] * vw + px[:, sl]

        act = state.active[:, sl]
        # fused epilogue: minimap adds + self mark + liveness scaling happen
        # inside the replica kernel (saves a separate XLA pass over the
        # ~100MB of windows)
        epilogue_fused = use_replica and spec.minimap_mode
        if epilogue_fused:
            view = wg.window_gather4(
                img, pos * 1024 + self_cell, mask, mm_img, mm_mask2d,
                act.astype(jnp.int32),
                vh=vh, vw=vw, C=C, Wp=Wp,
                chunk=kchunk, interpret=interpret,
                out_dtype=obs_dtype,
            )
        elif use_replica:
            view = wg.window_gather4(
                img, pos * 1024, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                chunk=kchunk, interpret=interpret,
                out_dtype=obs_dtype,
            )
        elif use_pallas:
            # measured: XLA fuses the minimap epilogue into one cheap pass
            # over the views, while doing the adds inside the kernel costs
            # ~16 extra vector ops per agent — so the kernel only gathers
            view = wg.window_gather(
                img, pos * 1024, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                chunk=kchunk, interpret=interpret,
                out_dtype=obs_dtype,
            )
        elif use_banded:
            # banded order out + one flat unsort at the END: the per-agent
            # epilogue (minimap adds, self mark, liveness scaling) runs over
            # the BANDED array first — its operands permute as cheap int
            # scatters — so the epilogue fuses into the kernel's output pass
            # and the permutation stays one 2-D row gather (materializing
            # slot-order windows before the epilogue cost test_mega
            # 2.21 -> 1.66M at 1x1M)
            out_b, inv = wg.window_gather_banded(
                img, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                chunk=min(40, wg._ceil_to(gs.cap, 8)), band_rows=band_rows,
                interpret=interpret, out_dtype=obs_dtype, unsort=False,
            )
            n_pad_b = out_b.shape[1]
            bidx = jnp.arange(B)[:, None]
            act_b = jnp.zeros((B, n_pad_b), jnp.float32).at[
                bidx, inv].set(act.astype(jnp.float32))
            out_b = out_b.reshape(B, n_pad_b, vh, vw, C)
            if spec.minimap_mode:
                sc_b = jnp.zeros((B, n_pad_b), jnp.int32).at[
                    bidx, inv].set(self_cell)
                self_mark_b = jax.nn.one_hot(sc_b, vh * vw,
                                             dtype=jnp.float32)
                mm_maskc = jnp.asarray((chan_src >= 0).astype(np.float32))
                out_b = (
                    out_b
                    + mm[:, None]
                    + self_mark_b.reshape(B, n_pad_b, vh, vw)[..., None]
                    * mm_maskc[None, None, None, None, :]
                )
            out_b = out_b * act_b[:, :, None, None, None]
            out_b = out_b.astype(obs_dtype).reshape(B, n_pad_b, vh * vw * C)
            view = jnp.take_along_axis(out_b, inv[:, :, None], axis=1)
            view = view.reshape(B, gs.cap, vh, vw, C)
            epilogue_fused = True  # nothing left for the XLA epilogue below
        else:
            view = wg.window_gather_xla(img, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp)
        view = view.reshape(B, gs.cap, vh, vw, C)
        if spec.minimap_mode and not epilogue_fused:
            self_mark = jax.nn.one_hot(self_cell, vh * vw, dtype=jnp.float32)
            self_mark = self_mark.reshape(B, gs.cap, vh, vw)
            mm_maskc = jnp.asarray((chan_src >= 0).astype(np.float32))
            view = (
                view
                + mm[:, None]
                + self_mark[..., None] * mm_maskc[None, None, None, None, :]
            )

        # --- feature vector (GridWorld.cc:386-396) ---
        ids = state.id[:, sl]
        feats = []
        if emb > 0:
            bits = (ids[..., None] >> jnp.arange(emb)[None, None, :]) & 1
            feats.append(bits.astype(jnp.float32))
        feats.append(
            jax.nn.one_hot(state.last_action[:, sl], n_action, dtype=jnp.float32)
        )
        feats.append(state.last_reward[:, sl][..., None])
        if spec.minimap_mode:
            feats.append((x / W)[..., None].astype(jnp.float32))
            feats.append((y / H)[..., None].astype(jnp.float32))
        if spec.goal_mode:
            feats.append(jnp.zeros((B, gs.cap, 2), jnp.float32))
        feature = jnp.concatenate(feats, axis=-1)

        if not epilogue_fused:
            view = view * act[:, :, None, None, None]
        if view.dtype != obs_dtype:
            view = view.astype(obs_dtype)
        feature = feature * act[:, :, None]
        return view, feature

    def observe(state: State, grids=None):
        if _batched(state):
            return observe_batched(state, grids)
        state_b = jax.tree.map(lambda a: a[None], state)
        if grids is not None:
            grids = jax.tree.map(lambda a: a[None], grids)
        view, feat = observe_batched(state_b, grids)
        return view[0], feat[0]

    observe.grids_fn = grids_fn
    observe.uses_banded = use_banded  # introspection for tests/profilers
    return observe


# ------------------------------------------------------------- turn-mode path
def _dir_offset_tables(t: "speclib.AgentTypeSpec"):
    """offs[d, vy, vx] = absolute offset of view cell (vy, vx) from the eye
    for direction d (rotation per Map.cc:515-532)."""
    vr = t.view_range
    vh, vw = vr.height, vr.width
    rx = np.arange(vw)[None, :] + vr.x1
    ry = np.arange(vh)[:, None] + vr.y1
    rx = np.broadcast_to(rx, (vh, vw))
    ry = np.broadcast_to(ry, (vh, vw))
    offs_x = np.zeros((4, vh, vw), np.int32)
    offs_y = np.zeros((4, vh, vw), np.int32)
    offs_x[speclib.NORTH], offs_y[speclib.NORTH] = rx, ry
    offs_x[speclib.SOUTH], offs_y[speclib.SOUTH] = -rx, -ry
    offs_x[speclib.WEST], offs_y[speclib.WEST] = ry, -rx
    offs_x[speclib.EAST], offs_y[speclib.EAST] = -ry, rx
    return offs_x, offs_y


def _make_observe_rotating(spec: speclib.GameSpec, group: int, *,
                           obs_dtype=jnp.float32, force_xla: bool = False,
                           interpret: bool = False):
    """Rotation-capable observations (turn_mode).

    Kernel path: render the packed cell grid once into a square frame,
    derive all four view-frame rotations by transpose/flip (int32 array
    ops), stack them row-wise into ONE padded channel image
    ``[B, 4*Hp, lanes]``, and slice each agent's axis-aligned (vh, vw*C)
    window from its direction's band with the same Pallas window kernel the
    NORTH-only path uses — rotation costs four cheap image rotations
    instead of per-agent rotated gathers (reference rotates inside the
    per-agent scan, Map.cc:129-207 via the offset tables of
    Map.cc:515-532).  Oversized frames and non-TPU backends fall back to
    the legacy per-direction XLA gather below."""
    t_ = spec.groups[group].type
    vr_ = t_.view_range
    S = max(spec.height, spec.width)
    geom = wg.padded_geometry(S, S, spec.n_channel, vr_.height, vr_.width)
    stacked_bytes = 4 * geom[0] * geom[2] * 4
    fits_vmem = stacked_bytes <= VMEM_IMAGE_BUDGET
    # big maps: the stacked image lives in HBM and the banded kernel walks
    # it in row bands (same budget rule as the NORTH-only path)
    rows_margin = wg._ceil_to(vr_.height + 7, 8)
    band_fits = (32 + rows_margin) * geom[2] * 4 <= 8 * 1024 * 1024
    backend_ok = wg.supports_pallas() or interpret
    kernel_ok = (
        backend_ok and not force_xla
        and _obs_kernel_env() != "xla"
        and (fits_vmem or band_fits)
    )
    if kernel_ok:
        return _make_observe_rotating_kernel(
            spec, group, geom, obs_dtype=obs_dtype, interpret=interpret,
            banded=not fits_vmem)
    return _make_observe_rotating_xla(spec, group, obs_dtype=obs_dtype)


def _make_observe_rotating_kernel(spec: speclib.GameSpec, group: int, geom, *,
                                  obs_dtype=jnp.float32, interpret=False,
                                  banded=False):
    """Stacked-rotations kernel path (see :func:`_make_observe_rotating`).

    Band order follows the direction enum (EAST, SOUTH, WEST, NORTH = 0..3);
    with eye (ex, ey) from ``save_to_real``/``rela_to_abs`` and view bounds
    (x1, y1), the window top-left inside band d is::

        EAST  frame(x', S-1-y'):  ty = S-1-ex + y1   tx = ey + x1
        SOUTH frame(S-1-y',S-1-x'): ty = S-1-ey + y1 tx = S-1-ex + x1
        WEST  frame(S-1-x', y'):  ty = ex + y1       tx = S-1-ey + x1
        NORTH frame(y', x'):      ty = ey + y1       tx = ex + x1

    (derived from the rotation tables, Map.cc:515-532: view cell (vy, vx)
    of an agent facing d reads map cell eye + R_d(vx + x1, vy + y1)).
    """
    t = spec.groups[group].type
    gs = spec.groups[group]
    vr = t.view_range
    vh, vw = vr.height, vr.width
    C = spec.n_channel
    H, W, G = spec.height, spec.width, spec.n_groups
    S = max(H, W)
    emb = spec.embedding_size
    n_action = t.n_action
    perm = spec.channel_perm(group)
    Hp, Wp, lanes, pad_y, pad_x = geom
    A = spec.n_agents_cap
    MB = spec.max_body_w

    mask = jnp.asarray(np.repeat(vr.mask.astype(np.float32), C, axis=1))
    kchunk = min(200, wg._ceil_to(gs.cap, 4))
    scale_h = (H + vh - 1) // vh
    scale_w = (W + vw - 1) // vw
    gof = spec.group_of_slot
    agent_ch = (spec.channel_base
                + spec.group_of_slot * spec.channel_scale).astype(np.int32)
    hp_max = np.asarray(spec.s_hp_max, np.float32)
    w_all = jnp.asarray(spec.s_width)
    l_all = jnp.asarray(spec.s_length)

    def frame_one(state: State):
        """Unpadded square packed grid [S, S] (same cell encoding as
        :func:`make_grids`, body footprints via the direction rects)."""
        base = jnp.full((S, S), C << _HP_SHIFT, jnp.int32)
        base = base.at[:H, :W].set(
            jnp.where(state.cell_wall, 0, C << _HP_SHIFT))
        if spec.food_mode:
            base = base.at[:H, :W].min(
                jnp.where(state.cell_food >= 0.0, 1 << _HP_SHIFT,
                          C << _HP_SHIFT))
        ok_agent = state.active & ~state.dead
        bw, bh = geo.size_for_dir(state.dir, w_all, l_all)
        q = jnp.clip(
            jnp.round(state.hp / jnp.asarray(hp_max) * _HP_SCALE
                      ).astype(jnp.int32), 0, _HP_MASK)
        vals = (jnp.asarray(agent_ch) << _HP_SHIFT) | q
        flat = base.reshape(-1)
        for i in range(MB):
            for j in range(MB):
                ok = ok_agent & (i < bw) & (j < bh)
                cell = jnp.where(ok, (state.y + j) * S + (state.x + i), S * S)
                flat = flat.at[cell].set(vals, mode="drop")
        return flat.reshape(S, S)

    def stacked_image(state: State):
        """[B, 4*Hp, lanes] channel image: one padded band per direction."""
        F = jax.vmap(frame_one)(state)  # [B, S, S]
        rots = [
            F.transpose(0, 2, 1)[:, ::-1, :],   # EAST:  frame(x', S-1-y')
            F[:, ::-1, ::-1],                   # SOUTH: frame(S-1-y', S-1-x')
            jnp.flip(F, 1).transpose(0, 2, 1),  # WEST:  frame(S-1-x', y')
            F,                                  # NORTH: identity
        ]
        B = F.shape[0]
        bands = jnp.full((B, 4 * Hp, Wp), C << _HP_SHIFT, jnp.int32)
        for d, r in enumerate(rots):
            bands = bands.at[:, d * Hp + pad_y : d * Hp + pad_y + S,
                             pad_x : pad_x + S].set(r)
        return _render_image(spec, group, bands, lanes)

    def observe_batched(state: State, grids=None):
        B = state.x.shape[0]
        img = stacked_image(state)

        sl = slice(gs.offset, gs.offset + gs.cap)
        d = state.dir[:, sl]
        ax_, ay_ = geo.save_to_real(
            state.x[:, sl], state.y[:, sl], d, t.width, t.length)
        ex, ey = geo.rela_to_abs(ax_, ay_, d, t.view_x_offset, t.view_y_offset)
        is_e = d == speclib.EAST
        is_s = d == speclib.SOUTH
        is_w = d == speclib.WEST
        ty = jnp.where(is_e, S - 1 - ex,
                       jnp.where(is_s, S - 1 - ey,
                                 jnp.where(is_w, ex, ey))) + vr.y1
        tx = jnp.where(is_e, ey,
                       jnp.where(is_s, S - 1 - ex,
                                 jnp.where(is_w, S - 1 - ey, ex))) + vr.x1
        pos = (d * Hp + pad_y + ty) * Wp + (pad_x + tx)

        if banded:
            view = wg.window_gather_banded(
                img, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                chunk=min(40, wg._ceil_to(gs.cap, 8)), band_rows=32,
                interpret=interpret, out_dtype=obs_dtype)
        else:
            view = wg.window_gather(
                img, pos * 1024, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                chunk=kchunk, interpret=interpret, out_dtype=obs_dtype)
        view = view.reshape(B, gs.cap, vh, vw, C)

        if spec.minimap_mode:
            px = jnp.clip(state.x // scale_w, 0, vw - 1)
            py = jnp.clip(state.y // scale_h, 0, vh - 1)
            counted = state.active & ~state.dead
            if t.can_absorb:  # observer type gates this (GridWorld.cc:341-347)
                counted = counted & ~state.absorbed
            gof_j = jnp.asarray(gof)

            def pool_one(pxe, pye, counte):
                flat = jnp.zeros((G, vh * vw), jnp.float32).at[
                    gof_j, pye * vw + pxe
                ].add(counte.astype(jnp.float32))
                totals = jnp.maximum(jnp.sum(flat, axis=1), 1.0)
                return (flat / totals[:, None]).reshape(G, vh, vw)

            pooled = jax.vmap(pool_one)(px, py, counted)  # [B, G, vh, vw]
            chan_src = np.full(C, -1, np.int32)
            for gg in range(G):
                chan_src[perm[spec.group2channel(gg)] + 2] = gg
            pooled_ext = jnp.concatenate(
                [pooled, jnp.zeros((B, 1, vh, vw), jnp.float32)], axis=1)
            mm = pooled_ext[:, jnp.asarray(np.where(chan_src < 0, G, chan_src))]
            mm = jnp.moveaxis(mm, 1, -1)  # [B, vh, vw, C]
            self_cell = (py[:, sl] * vw + px[:, sl])
            self_mark = jax.nn.one_hot(self_cell, vh * vw, dtype=jnp.float32)
            self_mark = self_mark.reshape(B, gs.cap, vh, vw)
            mm_maskc = jnp.asarray((chan_src >= 0).astype(np.float32))
            view = (
                view.astype(jnp.float32)
                + mm[:, None]
                + self_mark[..., None] * mm_maskc[None, None, None, None, :]
            )

        ids = state.id[:, sl]
        feats = []
        if emb > 0:
            bits = (ids[..., None] >> jnp.arange(emb)[None, None, :]) & 1
            feats.append(bits.astype(jnp.float32))
        feats.append(jax.nn.one_hot(
            state.last_action[:, sl], n_action, dtype=jnp.float32))
        feats.append(state.last_reward[:, sl][..., None])
        if spec.minimap_mode:
            feats.append((state.x[:, sl] / W)[..., None].astype(jnp.float32))
            feats.append((state.y[:, sl] / H)[..., None].astype(jnp.float32))
        if spec.goal_mode:
            feats.append(jnp.zeros((B, gs.cap, 2), jnp.float32))
        feature = jnp.concatenate(feats, axis=-1)

        act = state.active[:, sl]
        view = view * act[:, :, None, None, None]
        if view.dtype != obs_dtype:
            view = view.astype(obs_dtype)
        feature = feature * act[:, :, None]
        return view, feature

    def observe(state: State, grids=None):
        if _batched(state):
            return observe_batched(state)
        state_b = jax.tree.map(lambda a: a[None], state)
        view, feat = observe_batched(state_b)
        return view[0], feat[0]

    return observe


def _make_observe_rotating_xla(spec: speclib.GameSpec, group: int, *,
                               obs_dtype=jnp.float32):
    """Legacy rotation-capable path (turn_mode): per-direction window gather
    (XLA); correct for all directions, slower than the kernel path."""
    t = spec.groups[group].type
    gs = spec.groups[group]
    vr = t.view_range
    vh, vw = vr.height, vr.width
    C = spec.n_channel
    A = spec.n_agents_cap
    H, W, G = spec.height, spec.width, spec.n_groups
    emb = spec.embedding_size
    n_action = t.n_action

    perm = spec.channel_perm(group)
    offs_x, offs_y = _dir_offset_tables(t)
    range_mask = vr.mask
    scale_h = (H + vh - 1) // vh
    scale_w = (W + vw - 1) // vw
    group_of_slot = spec.group_of_slot
    base, scale = spec.channel_base, spec.channel_scale

    def observe_one(state: State):
        occ = state.cell_slot
        is_agent_cell = occ >= 0
        occ_c = jnp.clip(occ, 0, A - 1)
        agent_ch = base + jnp.asarray(group_of_slot)[occ_c] * scale
        ch = jnp.where(
            state.cell_wall, 0,
            jnp.where(state.cell_food >= 0.0, 1 if spec.food_mode else -1,
                      jnp.where(is_agent_cell, agent_ch, -1)),
        )
        perm_ext = jnp.concatenate([jnp.asarray(perm), jnp.asarray([C], jnp.int32)])
        pch = perm_ext[jnp.where(ch >= 0, ch, C)]
        hp_max_cell = jnp.asarray(spec.g_hp_max)[jnp.asarray(group_of_slot)[occ_c]]
        hp_grid = jnp.where(is_agent_cell, state.hp[occ_c] / hp_max_cell, 0.0)

        sl = slice(gs.offset, gs.offset + gs.cap)
        ax_, ay_ = geo.save_to_real(
            state.x[sl], state.y[sl], state.dir[sl], t.width, t.length
        )
        eye_x, eye_y = geo.rela_to_abs(
            ax_, ay_, state.dir[sl], t.view_x_offset, t.view_y_offset
        )
        ox = jnp.asarray(offs_x)[state.dir[sl]]
        oy = jnp.asarray(offs_y)[state.dir[sl]]
        gx = eye_x[:, None, None] + ox
        gy = eye_y[:, None, None] + oy
        inb = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H)
        gxc = jnp.clip(gx, 0, W - 1)
        gyc = jnp.clip(gy, 0, H - 1)

        cell_ch = pch[gyc, gxc]
        cell_hp = hp_grid[gyc, gxc]
        cell_is_agent = is_agent_cell[gyc, gxc]
        valid = inb & jnp.asarray(range_mask)[None, :, :] & (cell_ch < C)

        onehot = jax.nn.one_hot(jnp.where(valid, cell_ch, C), C, dtype=jnp.float32)
        view = onehot
        hp_onehot = jax.nn.one_hot(
            jnp.where(valid & cell_is_agent, cell_ch + 1, C), C, dtype=jnp.float32
        )
        view = view + hp_onehot * cell_hp[..., None]

        if spec.minimap_mode:
            px = jnp.clip(state.x // scale_w, 0, vw - 1)
            py = jnp.clip(state.y // scale_h, 0, vh - 1)
            counted = state.active & ~state.dead
            if t.can_absorb:  # observer type gates this (GridWorld.cc:341-347)
                counted = counted & ~state.absorbed
            gof = jnp.asarray(group_of_slot)
            flat = jnp.zeros((G, vh * vw), jnp.float32).at[
                gof, py * vw + px
            ].add(counted.astype(jnp.float32))
            totals = jnp.maximum(jnp.sum(flat, axis=1), 1.0)
            pooled = (flat / totals[:, None]).reshape(G, vh, vw)

            self_px = px[sl]
            self_py = py[sl]
            self_mark = jax.nn.one_hot(self_py * vw + self_px, vh * vw).reshape(
                -1, vh, vw
            )
            for gg in range(G):
                mm_ch = int(perm[spec.group2channel(gg)]) + 2
                view = view.at[:, :, :, mm_ch].set(pooled[gg][None, :, :] + self_mark)

        ids = state.id[sl]
        feats = []
        if emb > 0:
            bits = (ids[:, None] >> jnp.arange(emb)[None, :]) & 1
            feats.append(bits.astype(jnp.float32))
        feats.append(jax.nn.one_hot(state.last_action[sl], n_action, dtype=jnp.float32))
        feats.append(state.last_reward[sl][:, None])
        if spec.minimap_mode:
            feats.append((state.x[sl] / W)[:, None].astype(jnp.float32))
            feats.append((state.y[sl] / H)[:, None].astype(jnp.float32))
        if spec.goal_mode:
            feats.append(jnp.zeros((gs.cap, 2), jnp.float32))
        feature = jnp.concatenate(feats, axis=1)

        act = state.active[sl]
        view = view * act[:, None, None, None]
        if view.dtype != obs_dtype:
            view = view.astype(obs_dtype)
        feature = feature * act[:, None]
        return view, feature

    def observe(state: State, grids=None):
        if _batched(state):
            return jax.vmap(observe_one)(state)
        return observe_one(state)

    return observe
