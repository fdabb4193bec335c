"""Functional vectorized GridWorld: lockstep env batches in one XLA program.

The stateful :class:`magent_tpu.env.GridWorld` mirrors the reference's
imperative API (host-side placement, per-call ctypes-style getters).  This
module is the TPU-native path the north star describes: a pure
``(state, actions, key) -> state`` core with device-side reset, vmapped over
an env batch and sharded over a device mesh — no host round-trips inside the
rollout.

Differences from the stateful path (all deliberate, lockstep-friendly):

- every group runs at full capacity (``caps`` = exact initial populations);
- dead agents stay in their slot as masked entries instead of being
  compacted by ``clear_dead`` (reference: GridWorld.cc:633-665) — the reward
  rotation that ``clear_dead`` performs (``last <- next``,
  ``next <- step_reward``, reference GridWorld.h:168-174) is applied in-place
  by :meth:`VecGridWorld.transition`;
- ``done`` envs auto-reset inside the step so batches never stall.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec as speclib
from ..config import Config
from ..core import engine, observe
from ..core.state import State
from ..spec import NORTH, OP_NULL


def _wall_map(spec: speclib.GameSpec, walls=None):
    """Full [H, W] bool wall map: border + optional interior (x, y) cells.
    The ONE construction site shared by the reset's cell_wall and the
    step's packed wall-overlap grid (engine._wall_rect_code) so the two
    can never desynchronize."""
    H, W = spec.height, spec.width
    wall = np.zeros((H, W), bool)
    wall[0, :] = wall[-1, :] = wall[:, 0] = wall[:, -1] = True
    if walls is not None and len(walls):
        wxy = np.asarray(walls, np.int32)
        wall[wxy[:, 1], wxy[:, 0]] = True
    return wall


def _make_device_reset(spec: speclib.GameSpec, placements=None, walls=None):
    """Build a pure ``reset(key) -> State`` for one env.

    ``placements`` — optional list (len n_groups) of [n_g, 3] (x, y, dir)
    arrays for deterministic layouts (e.g. the battle two-square formation).
    When omitted, agents are placed uniformly at random on blank interior
    cells, device-side: random scores per cell + argsort gives a random
    permutation of free cells without rejection sampling
    (replaces reference: Map::get_random_blank, Map.cc:49-63).

    ``walls`` — optional [n_w, 2] (x, y) interior wall cells added on top of
    the border (reference: GridWorld::add_agents with group -1,
    GridWorld.cc:180-205; the FPS protocol places n/10 of them,
    reference scripts/test/test_1m.py:70).  Static across resets — lockstep
    envs share one wall layout, so the step function can treat it as a
    compile-time constant (engine._wall_rect_code).
    """
    H, W, A, G = spec.height, spec.width, spec.n_agents_cap, spec.n_groups
    gof = spec.group_of_slot

    wall = _wall_map(spec, walls)

    hp0 = spec.g_hp_max[gof].astype(np.float32)
    step_reward0 = spec.g_step_reward[gof].astype(np.float32)

    if placements is not None:
        xs = np.concatenate([np.asarray(p)[:, 0] for p in placements]).astype(np.int32)
        ys = np.concatenate([np.asarray(p)[:, 1] for p in placements]).astype(np.int32)
        ds = (
            np.concatenate([np.asarray(p)[:, 2] for p in placements]).astype(np.int32)
            if np.asarray(placements[0]).shape[1] > 2
            else np.full(A, NORTH, np.int32)
        )
        if not spec.turn_mode:
            ds = np.full(A, NORTH, np.int32)
        sizes = [len(p) for p in placements]
        assert sizes == [g.cap for g in spec.groups], (
            "placements must exactly fill group capacities %s, got %s"
            % ([g.cap for g in spec.groups], sizes)
        )
        cell0 = np.full((H, W), -1, np.int32)
        cell0[ys, xs] = np.arange(A)
        if spec.max_body_w > 1:
            # fill multi-cell body rectangles host-side
            for s in range(A):
                t = spec.groups[gof[s]].type
                bw, bh = (
                    (t.width, t.length) if ds[s] in (NORTH, speclib.SOUTH) else (t.length, t.width)
                )
                cell0[ys[s] : ys[s] + bh, xs[s] : xs[s] + bw] = s

        def place(key):
            return (
                jnp.asarray(xs),
                jnp.asarray(ys),
                jnp.asarray(ds),
                jnp.asarray(cell0),
            )

    else:
        assert spec.max_body_w == 1, (
            "device-side random placement supports 1x1 bodies; pass "
            "explicit `placements` for multi-cell agent types"
        )
        n_free = int((~wall).sum())
        if A > n_free:
            raise ValueError(
                "cannot place %d agents on a %dx%d map (%d free interior "
                "cells): the argsort tail would silently land on walls"
                % (A, H, W, n_free))
        free = ~wall.reshape(-1)

        def place(key):
            scores = jax.random.uniform(key, (H * W,))
            scores = jnp.where(jnp.asarray(free), scores, jnp.inf)
            cells = jnp.argsort(scores)[:A].astype(jnp.int32)
            x = cells % W
            y = cells // W
            d = jnp.full((A,), NORTH, jnp.int32)
            if spec.turn_mode:
                d = jax.random.randint(jax.random.fold_in(key, 1), (A,), 0, 4, jnp.int32)
            cell = (
                jnp.full(H * W, -1, jnp.int32)
                .at[cells]
                .set(jnp.arange(A, dtype=jnp.int32))
                .reshape(H, W)
            )
            return x, y, d, cell

    def reset(key):
        pkey, skey = jax.random.split(key)
        x, y, d, cell = place(pkey)
        return State(
            cell_slot=cell,
            cell_wall=jnp.asarray(wall),
            cell_food=jnp.full((H, W), -1.0, jnp.float32),
            x=x,
            y=y,
            dir=d,
            hp=jnp.asarray(hp0),
            active=jnp.ones(A, bool),
            dead=jnp.zeros(A, bool),
            absorbed=jnp.zeros(A, bool),
            id=jnp.arange(A, dtype=jnp.int32),
            last_action=jnp.asarray(spec.g_n_action)[jnp.asarray(gof)],
            next_reward=jnp.asarray(step_reward0),
            last_reward=jnp.zeros(A, jnp.float32),
            last_op=jnp.full(A, OP_NULL, jnp.int32),
            op_obj=jnp.full(A, -1, jnp.int32),
            group_reward=jnp.zeros(G, jnp.float32),
            n_in_group=jnp.asarray([g.cap for g in spec.groups], jnp.int32),
            lcg=jnp.asarray(1, jnp.uint32),
            key=skey.astype(jnp.uint32),
            done=jnp.asarray(False),
            id_counter=jnp.asarray(A, jnp.int32),
            step_ct=jnp.asarray(0, jnp.int32),
        )

    return reset


class VecGridWorld:
    """A batch of ``n_envs`` lockstep environments as pure functions.

    All methods are jittable and operate on a batched :class:`State`
    (leading axis ``n_envs``); shard that axis over a mesh's ``dp`` dimension
    to scale across chips/hosts.
    """

    def __init__(self, config: Config, caps, n_envs: int, placements=None,
                 obs_dtype=None, walls=None):
        self.spec = speclib.compile_spec(config, caps)
        self.n_envs = n_envs
        self._reset1 = _make_device_reset(self.spec, placements, walls)
        # walls are static per lockstep layout: border-only by default
        # (answered by formula in the gridless step), or border + the given
        # interior cells (one packed-bitmap gather — see engine.make_step)
        wall_map = (_wall_map(self.spec, walls)
                    if walls is not None and len(walls) else None)
        self._step1 = engine.make_step(self.spec, maintain_grid=False,
                                       walls=wall_map, n_envs=n_envs)
        # obs_dtype=jnp.bfloat16 halves window HBM traffic (see
        # observe.make_observe); None keeps the f32 parity default
        obs_kw = {} if obs_dtype is None else {"obs_dtype": obs_dtype}
        self._observe1 = [
            observe.make_observe(self.spec, g, **obs_kw)
            for g in range(self.spec.n_groups)
        ]

    # ------------------------------------------------------------- functional
    def reset(self, key):
        """key -> batched State."""
        keys = jax.random.split(key, self.n_envs)
        return jax.vmap(self._reset1)(keys)

    def observe(self, state, group: int, grids=None):
        """batched State -> (views [B, cap, vh, vw, C], feats [B, cap, F])."""
        return self._observe1[group](state, grids)

    def observe_all(self, state):
        """Observations for every group, sharing one grid-render pass."""
        grids_fn = getattr(self._observe1[0], "grids_fn", None)
        grids = grids_fn(state) if grids_fn is not None else None
        return [self._observe1[g](state, grids) for g in range(self.spec.n_groups)]

    def step(self, state, actions):
        """Advance every env one step.  ``actions`` is [B, A] over the full
        slot axis (per-group action ids at each group's slot range).

        n_envs == 1 steps UNBATCHED (squeeze -> step1 -> expand): under
        vmap, JAX lowers a batched-predicate ``lax.cond`` to select_n that
        executes BOTH branches — which would run the segmented sweeps'
        full-A^2 overflow fallback unconditionally in the big-single-world
        regime the segmentation targets."""
        if self.n_envs == 1:
            st = jax.tree.map(lambda a: a[0], state)
            out = self._step1(st, actions[0])
            return jax.tree.map(lambda a: a[None], out)
        return jax.vmap(self._step1)(state, actions)

    def transition(self, state, actions):
        """step + reward extraction + per-step reward rotation + auto-reset.

        Returns (next_state, rewards [B, A], alive [B, A], done [B]).
        ``rewards``/``alive`` are reported *before* auto-reset, per slot
        (group reward already broadcast in, reference: GridWorld.cc:694-704).
        """
        spec = self.spec
        gof = jnp.asarray(spec.group_of_slot)
        stepped = self.step(state, actions)

        # broadcast group reward per slot via a static select chain — a
        # gof-indexed gather costs ~0.2ms/step on TPU, selects are free
        gr_slot = jnp.broadcast_to(
            stepped.group_reward[:, :1], stepped.next_reward.shape)
        for g in range(1, self.spec.n_groups):
            gr_slot = jnp.where(
                jnp.asarray(gof == g), stepped.group_reward[:, g : g + 1], gr_slot)
        rewards = stepped.next_reward + gr_slot
        alive = stepped.active & ~stepped.dead
        done = stepped.done

        # reward rotation normally done by clear_dead (GridWorld.h:168-174);
        # last_reward (the obs feature) is the INDIVIDUAL reward only —
        # group reward goes into the reported ``rewards``, never the feature
        # (Agent::init_reward vs GridWorld::get_reward, GridWorld.cc:694-704)
        step_reward = jnp.asarray(spec.s_step_reward)
        A = spec.n_agents_cap
        rotated = stepped.replace(
            last_reward=stepped.next_reward,
            next_reward=jnp.where(alive, step_reward, 0.0),
            group_reward=jnp.zeros_like(stepped.group_reward),
            last_op=jnp.full((self.n_envs, A), OP_NULL, jnp.int32),
            op_obj=jnp.full((self.n_envs, A), -1, jnp.int32),
        )

        # auto-reset finished envs (fresh layout from the env's carried key);
        # episodes end rarely, so the reset computation is gated behind a
        # real lax.cond on the whole batch — most steps skip it entirely
        def do_reset(rot):
            reset_keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(stepped.key)
            fresh = jax.vmap(self._reset1)(reset_keys)
            return jax.tree.map(
                lambda f, r: jnp.where(
                    done.reshape((-1,) + (1,) * (r.ndim - 1)), f, r
                ),
                fresh,
                rot,
            )

        next_state = jax.lax.cond(
            jnp.any(done), do_reset, lambda rot: rot, rotated
        )
        return next_state, rewards, alive, done

    def random_actions(self, key, fast: bool = False):
        """Uniform random action per slot, valid for each slot's group.

        ``fast=True`` replaces the threefry draw with a SplitMix-style
        integer mix of (key word, env, slot) — the same counter-based
        randomness the engine's attack shuffle uses (engine.make_step).
        Distribution stays uniform; at small scales (A <= ~1e3/env) the
        threefry bits are a measurable fixed cost that small programs
        cannot overlap."""
        n_act = jnp.asarray(self.spec.s_n_action)
        A = self.spec.n_agents_cap
        if fast:
            lane = (jnp.arange(self.n_envs, dtype=jnp.uint32)[:, None]
                    * jnp.uint32(0x632BE59B)
                    + jnp.arange(A, dtype=jnp.uint32)[None, :])
            kd = (key if jnp.issubdtype(key.dtype, jnp.integer)
                  else jax.random.key_data(key)).reshape(-1)
            # mix ALL key words (keys differing only in the high word must
            # not collide)
            seed = kd[-1].astype(jnp.uint32)
            for w in range(kd.shape[0] - 1):
                seed = seed * jnp.uint32(0x9E3779B9) + kd[w].astype(jnp.uint32)
            z = seed + lane * jnp.uint32(0x9E3779B9)
            z = (z ^ (z >> 16)) * jnp.uint32(0x85EBCA6B)
            z = (z ^ (z >> 13)) * jnp.uint32(0xC2B2AE35)
            z = z ^ (z >> 16)
            u = (z >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
            return (u * n_act).astype(jnp.int32)
        u = jax.random.uniform(key, (self.n_envs, A))
        return (u * n_act).astype(jnp.int32)

    # ------------------------------------------------------------------ info
    def action_spaces(self):
        return [self.spec.action_space(g) for g in range(self.spec.n_groups)]

    def view_spaces(self):
        return [self.spec.view_space(g) for g in range(self.spec.n_groups)]

    def feature_spaces(self):
        return [(self.spec.feature_size(g),) for g in range(self.spec.n_groups)]
