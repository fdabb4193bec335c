"""Vectorized observation rendering.

Replaces the reference's per-agent window scan (reference: Map::extract_view,
src/gridworld/Map.cc:129-207 driven by GridWorld::get_observation,
GridWorld.cc:292-401) with a batched gather:

1. build one global "channel grid" (cell -> channel id) and "hp grid" per env,
2. for every agent gather its (possibly rotated) view window with a
   precomputed per-direction index table,
3. one-hot scatter into the observation tensor through the observer group's
   channel permutation (GridWorld.cc:897-913), masked by the range mask.

The minimap channels and the feature vector (id embedding, last-action
one-hot, last reward, absolute coords) follow GridWorld.cc:327-400.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec as speclib
from . import geometry as geo
from .state import State


def _dir_offset_tables(t: "speclib.AgentTypeSpec"):
    """offs[d, vy, vx] = absolute offset of view cell (vy, vx) from the eye
    for direction d (rotation per Map.cc:515-532)."""
    vr = t.view_range
    vh, vw = vr.height, vr.width
    rx = np.arange(vw)[None, :] + vr.x1  # relative x per column
    ry = np.arange(vh)[:, None] + vr.y1  # relative y per row
    rx = np.broadcast_to(rx, (vh, vw))
    ry = np.broadcast_to(ry, (vh, vw))
    offs_x = np.zeros((4, vh, vw), np.int32)
    offs_y = np.zeros((4, vh, vw), np.int32)
    offs_x[speclib.NORTH], offs_y[speclib.NORTH] = rx, ry
    offs_x[speclib.SOUTH], offs_y[speclib.SOUTH] = -rx, -ry
    offs_x[speclib.WEST], offs_y[speclib.WEST] = ry, -rx
    offs_x[speclib.EAST], offs_y[speclib.EAST] = -ry, rx
    return offs_x, offs_y


def make_observe(spec: speclib.GameSpec, group: int):
    """Build the jittable observe function for one group.

    Returns views [cap, vh, vw, n_channel] and features [cap, feature_size];
    the caller slices to the live prefix.
    """
    t = spec.groups[group].type
    gs = spec.groups[group]
    vr = t.view_range
    vh, vw = vr.height, vr.width
    C = spec.n_channel
    A = spec.n_agents_cap
    H, W = spec.height, spec.width
    G = spec.n_groups
    emb = spec.embedding_size
    n_action = t.n_action

    perm = spec.channel_perm(group)  # orig channel -> observed channel
    offs_x, offs_y = _dir_offset_tables(t)
    range_mask = vr.mask

    # minimap pooling factors (GridWorld.cc:328-329)
    scale_h = (H + vh - 1) // vh
    scale_w = (W + vw - 1) // vw

    group_of_slot = spec.group_of_slot
    base, scale = spec.channel_base, spec.channel_scale

    def observe(state: State):
        # --- global grids ---
        occ = state.cell_slot
        is_agent_cell = occ >= 0
        occ_c = jnp.clip(occ, 0, A - 1)
        agent_ch = base + jnp.asarray(group_of_slot)[occ_c] * scale
        ch = jnp.where(
            state.cell_wall, 0,
            jnp.where(state.cell_food > 0.0, 1 if spec.food_mode else -1,
                      jnp.where(is_agent_cell, agent_ch, -1)),
        )
        # apply observer's channel permutation globally (identity on wall/food)
        perm_ext = jnp.concatenate([jnp.asarray(perm), jnp.asarray([C], jnp.int32)])
        pch = perm_ext[jnp.where(ch >= 0, ch, C)]  # C = "empty" sentinel
        hp_max_cell = jnp.asarray(spec.g_hp_max)[jnp.asarray(group_of_slot)[occ_c]]
        hp_grid = jnp.where(is_agent_cell, state.hp[occ_c] / hp_max_cell, 0.0)

        # --- per-agent window gather ---
        sl = slice(gs.offset, gs.offset + gs.cap)
        ax_, ay_ = geo.save_to_real(
            state.x[sl], state.y[sl], state.dir[sl], t.width, t.length
        )
        eye_x, eye_y = geo.rela_to_abs(
            ax_, ay_, state.dir[sl], t.view_x_offset, t.view_y_offset
        )
        ox = jnp.asarray(offs_x)[state.dir[sl]]  # [cap, vh, vw]
        oy = jnp.asarray(offs_y)[state.dir[sl]]
        gx = eye_x[:, None, None] + ox
        gy = eye_y[:, None, None] + oy
        inb = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H)
        gxc = jnp.clip(gx, 0, W - 1)
        gyc = jnp.clip(gy, 0, H - 1)

        cell_ch = pch[gyc, gxc]  # [cap, vh, vw] observed channel (C = none)
        cell_hp = hp_grid[gyc, gxc]
        cell_is_agent = is_agent_cell[gyc, gxc]
        valid = inb & jnp.asarray(range_mask)[None, :, :] & (cell_ch < C)

        onehot = jax.nn.one_hot(jnp.where(valid, cell_ch, C), C, dtype=jnp.float32)
        view = onehot
        hp_onehot = jax.nn.one_hot(
            jnp.where(valid & cell_is_agent, cell_ch + 1, C), C, dtype=jnp.float32
        )
        view = view + hp_onehot * cell_hp[..., None]

        # --- minimap channels (GridWorld.cc:327-384) ---
        if spec.minimap_mode:
            px = jnp.clip(state.x // scale_w, 0, vw - 1)
            py = jnp.clip(state.y // scale_h, 0, vh - 1)
            counted = state.active
            if t.can_absorb:
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

        # --- feature vector (GridWorld.cc:386-396, embedding GridWorld.h:157-166) ---
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

        # inactive slots -> zeros
        act = state.active[sl]
        view = view * act[:, None, None, None]
        feature = feature * act[:, None]
        return view, feature

    return observe
