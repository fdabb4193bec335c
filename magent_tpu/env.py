"""Stateful GridWorld wrapper with the reference Python API.

Drop-in surface of the reference's ctypes wrapper
(reference: python/magent/gridworld.py:14-490): construction from a builtin
config name or a :class:`Config`, group handles, ``get_observation`` /
``set_action`` / ``step`` / ``get_reward`` / ``clear_dead`` and the info
getters.  Underneath, the state is a JAX pytree and the hot functions are
jitted per spec; agent placement runs host-side with the reference's LCG so
random layouts match.

Fixed capacities grow on demand (powers of two) — growth recompiles the
jitted functions for the new shapes.
"""

from __future__ import annotations

import importlib
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import spec as speclib
from .config import Config
from .core import engine, lcg, observe
from .core.state import State, init_state
from .spec import NORTH, OP_NULL


class Handle:
    """Group handle with a ``.value`` attribute like ``ctypes.c_int32``."""

    def __init__(self, value: int):
        self.value = value

    def __index__(self):
        return self.value

    def __int__(self):
        return self.value

    def __repr__(self):
        return "Handle(%d)" % self.value


class GridWorld:
    OBS_INDEX_VIEW = 0
    OBS_INDEX_HP = 1

    def __init__(self, config, caps: int | list | None = None, engine_mode="fast",
                 **kwargs):
        if isinstance(config, str):
            try:
                mod = importlib.import_module("magent_tpu.builtin.config." + config)
                config = getattr(mod, "get_config")(**kwargs)
            except ImportError:
                raise BaseException('unknown built-in game "%s"' % config)
        assert isinstance(config, Config)
        assert engine_mode in ("fast", "sequential")

        self._config = config
        self._engine_mode = engine_mode
        self._seq = None
        self._dead_ct = None
        self._caps = self._initial_caps(config, caps)
        self._lcg = lcg.HostLCG(int(config.config_dict.get("seed", 0)))
        self._render_dir = None
        self._render_gen = None
        self._render_reset_ct = 0  # resets before the generator exists
        self._first_render = True
        # the reference records per-step attack events only after rendering
        # was activated by the first render()/render_window_info call
        # (GridWorld.cc:18,484,798,944) — never reset by reset()
        self._render_ever = False
        self._attack_events = np.zeros((0, 3), np.int32)
        self._pre_step_dead = None
        self._goals = {}

        self._build(self._caps)
        self.state = init_state(self.spec)

        self.group_handles = [Handle(i) for i in range(self.spec.n_groups)]
        self.view_space = {
            h.value: self.spec.view_space(h.value) for h in self.group_handles
        }
        self.feature_space = {
            h.value: (self.spec.feature_size(h.value),) for h in self.group_handles
        }
        self.action_space = {
            h.value: self.spec.action_space(h.value) for h in self.group_handles
        }

    # ------------------------------------------------------------------ build
    @staticmethod
    def _initial_caps(config, caps):
        n_groups = len(config.groups)
        if caps is None:
            return [256] * n_groups
        if isinstance(caps, int):
            return [caps] * n_groups
        return list(caps)

    def _build(self, caps):
        self.spec = speclib.compile_spec(self._config, caps)
        sp = self.spec
        self._step_fn = jax.jit(engine.make_step(sp))
        self._clear_fn = jax.jit(engine.make_clear_dead(sp))
        self._observe_fns = [
            jax.jit(observe.make_observe(sp, g)) for g in range(sp.n_groups)
        ]
        # share one grid-render pass across same-step get_observation calls
        self._grids_fn = (
            jax.jit(observe.make_grids(sp)) if not sp.turn_mode else None
        )
        self._grids_cache = None  # (state object, grids)
        self._actions = np.zeros(sp.n_agents_cap, np.int32)

    def _grow(self, group: int, needed: int):
        """Grow a group's capacity and migrate state (slot indices shift)."""
        caps = list(self._caps)
        while caps[group] < needed:
            caps[group] = max(2 * caps[group], 256)
        self._migrate(caps)

    def _migrate(self, caps):
        """Recompile the spec with new ``caps`` (possibly with a newly
        appended group) and migrate the live state into it."""
        old_spec, old_state = self.spec, self.state
        self._caps = caps
        old_actions = self._actions
        self._build(caps)
        new_state = init_state(self.spec)

        def seg_copy(new_arr, old_arr):
            for g in range(old_spec.n_groups):
                o_off = old_spec.groups[g].offset
                n_off = self.spec.groups[g].offset
                cap = old_spec.groups[g].cap
                new_arr = new_arr.at[n_off : n_off + cap].set(
                    old_arr[o_off : o_off + cap]
                )
            return new_arr

        fields = [
            "x", "y", "dir", "hp", "active", "dead", "absorbed", "id",
            "last_action", "next_reward", "last_reward", "last_op", "op_obj",
        ]
        updates = {f: seg_copy(getattr(new_state, f), getattr(old_state, f)) for f in fields}
        ng_old = old_spec.n_groups  # new_group appends, so pad per-group arrays
        updates.update(
            cell_wall=old_state.cell_wall,
            cell_food=old_state.cell_food,
            group_reward=new_state.group_reward.at[:ng_old].set(
                old_state.group_reward),
            n_in_group=new_state.n_in_group.at[:ng_old].set(
                old_state.n_in_group),
            lcg=old_state.lcg,
            key=old_state.key,
            done=old_state.done,
            id_counter=old_state.id_counter,
            step_ct=old_state.step_ct,
        )
        new_state = new_state.replace(**updates)

        # rebuild occupancy grid from migrated agent positions
        cell = self._rebuild_grid(new_state)
        self.state = new_state.replace(cell_slot=cell)

        for g in range(old_spec.n_groups):
            o_off = old_spec.groups[g].offset
            n_off = self.spec.groups[g].offset
            cap = old_spec.groups[g].cap
            self._actions[n_off : n_off + cap] = old_actions[o_off : o_off + cap]

        # group count or channel layout may have changed: refresh the spaces
        self.view_space = {
            h.value: self.spec.view_space(h.value)
            for h in self.group_handles
        }
        self.feature_space = {
            h.value: (self.spec.feature_size(h.value),)
            for h in self.group_handles
        }
        self.action_space = {
            h.value: self.spec.action_space(h.value)
            for h in self.group_handles
        }

    def _rebuild_grid(self, state: State):
        sp = self.spec
        cell = jnp.full((sp.height, sp.width), -1, jnp.int32)
        g = jnp.asarray(sp.group_of_slot)
        w = jnp.asarray(sp.g_width)[g]
        l = jnp.asarray(sp.g_length)[g]
        import magent_tpu.core.geometry as geo

        bw, bh = geo.size_for_dir(state.dir, w, l)
        mask = state.active & ~state.dead
        slots = jnp.arange(sp.n_agents_cap, dtype=jnp.int32)
        for i in range(sp.max_body_w):
            for j in range(sp.max_body_w):
                ok = mask & (i < bw) & (j < bh)
                cx = jnp.where(ok, state.x + i, sp.width)
                cy = jnp.where(ok, state.y + j, sp.height)
                cell = cell.at[cy, cx].set(jnp.where(ok, slots, -1), mode="drop")
        return cell

    # ------------------------------------------------------------------ game
    def reset(self):
        """Reset map and agents; the engine RNG persists across resets
        (reference: GridWorld::reset never reseeds, GridWorld.cc:72-118)."""
        carry_key = self.state.key
        self.state = init_state(self.spec).replace(
            key=carry_key, lcg=jnp.asarray(self._lcg.state, jnp.uint32)
        )
        self._actions[:] = 0
        if self._dead_ct is not None:
            self._dead_ct[:] = 0
        self._first_render = True
        # the reference bumps the video file number on EVERY reset
        # (GridWorld.cc:97 render_generator.next_file()), so the first
        # episode dumps video_1.txt, the second video_2.txt, ...
        if self._render_gen is not None:
            self._render_gen.next_file()
        else:
            self._render_reset_ct += 1

    def set_seed(self, seed):
        self._lcg.seed(seed)
        self.state = self.state.replace(
            lcg=jnp.asarray(self._lcg.state, jnp.uint32),
            key=jax.random.PRNGKey(int(seed)).astype(jnp.uint32),
        )

    # ----------------------------------------------------------------- agents
    def new_group(self, name):
        """Create a new (empty) group of the registered agent type ``name``
        after construction and return its handle (reference:
        gridworld.py:144-147 / runtime_api.cc gridworld_new_group).

        The observation channel layout depends on the group count, so every
        group's view space grows by ``channel_scale`` channels — exactly as
        if the game had been constructed with the extra group declared."""
        if name not in self._config.agent_type_dict:
            raise KeyError("unknown agent type %r" % (name,))
        self._config.add_group(name)
        handle = Handle(len(self._config.groups) - 1)
        self.group_handles.append(handle)
        self._migrate(list(self._caps) + [256])
        if self._dead_ct is not None:
            self._dead_ct = np.append(self._dead_ct, 0)
        return handle

    def add_walls(self, method, **kwargs):
        kwargs["dir"] = 0
        self.add_agents(-1, method, **kwargs)

    def _host_blocked(self):
        occ = np.asarray(self.state.cell_slot)
        wall = np.asarray(self.state.cell_wall)
        food = np.asarray(self.state.cell_food)
        return wall | (occ >= 0) | (food >= 0), wall

    def add_agents(self, handle, method, **kwargs):
        group = handle.value if isinstance(handle, Handle) else int(handle)
        sp = self.spec
        H, W = sp.height, sp.width
        blocked, wall = self._host_blocked()

        if group == -1:  # walls (reference: GridWorld.cc:184-217)
            new_wall = wall.copy()
            if method == "random":
                n = int(kwargs["n"])
                for _ in range(n):
                    x, y = self._random_blank(blocked, 1, 1)
                    new_wall[y, x] = True
                    blocked[y, x] = True
            elif method == "custom":
                for p in kwargs["pos"]:
                    x, y = int(p[0]), int(p[1])
                    if not (0 <= x < W and 0 <= y < H):
                        continue
                    if blocked[y, x] and not new_wall[y, x]:
                        continue  # occupied by agent/food: ignored with warning
                    new_wall[y, x] = True
                    blocked[y, x] = True
            elif method == "fill":
                x0, y0 = int(kwargs["pos"][0]), int(kwargs["pos"][1])
                fw, fh = int(kwargs["size"][0]), int(kwargs["size"][1])
                for x in range(x0, x0 + fw):
                    for y in range(y0, y0 + fh):
                        if 0 <= x < W and 0 <= y < H and not (
                            blocked[y, x] and not new_wall[y, x]
                        ):
                            new_wall[y, x] = True
                            blocked[y, x] = True
            else:
                raise ValueError("unsupported add_walls method " + str(method))
            self.state = self.state.replace(cell_wall=jnp.asarray(new_wall))
            return

        gspec = sp.groups[group]
        t = gspec.type
        placements = []  # (x, y, dir)

        def body_wh(d):
            from .core import geometry as geo
            return geo.size_for_dir_np(d, t.width, t.length)

        def rect_blank(x, y, bw, bh):
            if x < 0 or y < 0 or x + bw >= W or y + bh >= H:
                return False
            return not blocked[y : y + bh, x : x + bw].any()

        if method == "random":
            n = int(kwargs["n"])
            for _ in range(n):
                d = (self._lcg() % 4) if sp.turn_mode else NORTH
                bw, bh = body_wh(d)
                x, y = self._random_blank(blocked, bw, bh)
                blocked[y : y + bh, x : x + bw] = True
                placements.append((x, y, d))
        elif method == "custom":
            pos = kwargs["pos"]
            for p in pos:
                x, y = int(p[0]), int(p[1])
                if len(p) > 2 and not 0 <= int(p[2]) < 4:
                    # validated even with turn_mode off, like the reference
                    # (LOG(FATAL), GridWorld.cc:249-251)
                    raise ValueError(
                        "invalid direction in add_agents: %r" % (p[2],))
                d = int(p[2]) if len(p) > 2 and sp.turn_mode else NORTH
                bw, bh = body_wh(d)
                if not rect_blank(x, y, bw, bh):
                    continue  # reference warns and ignores
                blocked[y : y + bh, x : x + bw] = True
                placements.append((x, y, d))
        elif method == "fill":
            x0, y0 = int(kwargs["pos"][0]), int(kwargs["pos"][1])
            fw, fh = int(kwargs["size"][0]), int(kwargs["size"][1])
            d = int(kwargs.get("dir", 0)) if sp.turn_mode else NORTH
            bw, bh = body_wh(d)
            for x in range(x0, x0 + fw, bw):
                for y in range(y0, y0 + fh, bh):
                    if not rect_blank(x, y, bw, bh):
                        continue
                    blocked[y : y + bh, x : x + bw] = True
                    placements.append((x, y, d))
        else:
            raise ValueError("unknown method " + str(method))

        self._commit_agents(group, placements)

    def _random_blank(self, blocked, bw, bh):
        """Rejection sampling with the engine LCG (reference: Map.cc:49-63)."""
        H, W = blocked.shape
        tries = 0
        while True:
            x = self._lcg() % (W - bw)
            y = self._lcg() % (H - bh)
            if x + bw < W and y + bh < H and not blocked[y : y + bh, x : x + bw].any():
                return x, y
            tries += 1
            if tries > W * H:
                raise RuntimeError("cannot find a blank position in a filled map")

    def _commit_agents(self, group, placements):
        sp = self.spec
        n_new = len(placements)
        if n_new == 0:
            return
        n_cur = int(self.state.n_in_group[group])
        if n_cur + n_new > sp.groups[group].cap:
            self._grow(group, n_cur + n_new)
            sp = self.spec

        gspec = sp.groups[group]
        t = gspec.type
        slots = np.arange(n_cur, n_cur + n_new, dtype=np.int32) + gspec.offset
        xs = np.asarray([p[0] for p in placements], np.int32)
        ys = np.asarray([p[1] for p in placements], np.int32)
        ds = np.asarray([p[2] for p in placements], np.int32)
        id0 = int(self.state.id_counter)
        ids = np.arange(id0, id0 + n_new, dtype=np.int32)

        st = self.state
        st = st.replace(
            x=st.x.at[slots].set(xs),
            y=st.y.at[slots].set(ys),
            dir=st.dir.at[slots].set(ds),
            hp=st.hp.at[slots].set(t.hp),
            active=st.active.at[slots].set(True),
            dead=st.dead.at[slots].set(False),
            absorbed=st.absorbed.at[slots].set(False),
            id=st.id.at[slots].set(ids),
            # "dangerous here": fresh agents' last_action = n_action
            # (reference: GridWorld.h:140) -> one-hot encodes to zeros
            last_action=st.last_action.at[slots].set(t.n_action),
            next_reward=st.next_reward.at[slots].set(t.step_reward),
            last_reward=st.last_reward.at[slots].set(0.0),
            last_op=st.last_op.at[slots].set(OP_NULL),
            op_obj=st.op_obj.at[slots].set(-1),
            n_in_group=st.n_in_group.at[group].add(n_new),
            id_counter=jnp.asarray(id0 + n_new, jnp.int32),
        )

        # fill occupancy grid (body rects) in one scatter
        from .core import geometry as geo

        cys, cxs, vals = [], [], []
        for k, (x, y, d) in enumerate(placements):
            bw, bh = geo.size_for_dir_np(d, t.width, t.length)
            for i in range(bw):
                for j in range(bh):
                    cxs.append(x + i)
                    cys.append(y + j)
                    vals.append(slots[k])
        cell = st.cell_slot.at[np.asarray(cys), np.asarray(cxs)].set(
            np.asarray(vals, np.int32)
        )
        self.state = st.replace(cell_slot=cell)

    # ------------------------------------------------------------------- run
    def get_observation(self, handle):
        g = handle.value
        grids = None
        if self._grids_fn is not None:
            if self._grids_cache is None or self._grids_cache[0] is not self.state:
                self._grids_cache = (self.state, self._grids_fn(self.state))
            grids = self._grids_cache[1]
        view, feat = self._observe_fns[g](self.state, grids)
        n = self.get_num(handle)
        return (
            np.asarray(view[:n], dtype=np.float32),
            np.asarray(feat[:n], dtype=np.float32),
        )

    def set_action(self, handle, actions):
        assert isinstance(actions, np.ndarray)
        assert actions.dtype == np.int32
        g = handle.value
        off = self.spec.groups[g].offset
        n = self.get_num(handle)
        self._actions[off : off + n] = actions[:n]

    def step(self):
        # pre-step liveness snapshot: attack_events must not emit for agents
        # that were already dead BEFORE this step (render/generator.py)
        self._pre_step_dead = np.asarray(self.state.dead).copy()
        if self._engine_mode == "sequential":
            return self._step_sequential()
        self.state = self._step_fn(self.state, jnp.asarray(self._actions))
        return bool(self.state.done)

    def _step_sequential(self):
        """Reference-order parity step (host NumPy; see core.seq_engine)."""
        from .core.seq_engine import SequentialEngine

        if self._seq is None or self._seq.spec is not self.spec:
            self._seq = SequentialEngine(self.spec)
        if self._dead_ct is None:
            self._dead_ct = np.zeros(self.spec.n_groups, np.int64)

        st = self.state
        S = {
            "x": np.asarray(st.x).copy(),
            "y": np.asarray(st.y).copy(),
            "dir": np.asarray(st.dir).copy(),
            "hp": np.asarray(st.hp).copy(),
            "active": np.asarray(st.active).copy(),
            "dead": np.asarray(st.dead).copy(),
            "absorbed": np.asarray(st.absorbed).copy(),
            "last_action": self._actions.copy(),
            "next_reward": np.asarray(st.next_reward).copy(),
            "last_op": np.asarray(st.last_op).copy(),
            "op_obj": np.asarray(st.op_obj).copy(),
            "id": np.asarray(st.id),
            "cell_slot": np.asarray(st.cell_slot).copy(),
            "cell_wall": np.asarray(st.cell_wall),
            "cell_food": np.asarray(st.cell_food).copy(),
            "group_reward": np.asarray(st.group_reward).copy(),
            "dead_ct": self._dead_ct,
        }
        done = self._seq.step(S, self._lcg)
        # exact event list for render/get_both_attack (fast mode
        # reconstructs instead, render/generator.py:attack_events)
        self._last_attack_events = list(self._seq.attack_events)
        self.state = st.replace(
            x=jnp.asarray(S["x"]),
            y=jnp.asarray(S["y"]),
            dir=jnp.asarray(S["dir"]),
            hp=jnp.asarray(S["hp"]),
            dead=jnp.asarray(S["dead"]),
            absorbed=jnp.asarray(S["absorbed"]),
            last_action=jnp.asarray(self._actions),
            next_reward=jnp.asarray(S["next_reward"]),
            last_op=jnp.asarray(S["last_op"]),
            op_obj=jnp.asarray(S["op_obj"]),
            cell_slot=jnp.asarray(S["cell_slot"]),
            cell_food=jnp.asarray(S["cell_food"]),
            group_reward=jnp.asarray(S["group_reward"]),
            lcg=jnp.asarray(self._lcg.state, jnp.uint32),
            done=jnp.asarray(done),
            step_ct=st.step_ct + 1,
        )
        return bool(done)

    def get_reward(self, handle):
        g = handle.value
        sp = self.spec.groups[g]
        n = self.get_num(handle)
        rew = self.state.next_reward[sp.offset : sp.offset + n] + self.state.group_reward[g]
        return np.asarray(rew, dtype=np.float32)

    def clear_dead(self):
        self.state = self._clear_fn(self.state)
        if self._dead_ct is not None:
            self._dead_ct[:] = 0

    # ------------------------------------------------------------------ info
    def get_handles(self):
        return self.group_handles

    def get_num(self, handle):
        return int(self.state.n_in_group[handle.value])

    def get_action_space(self, handle):
        return self.action_space[handle.value]

    def get_view_space(self, handle):
        return self.view_space[handle.value]

    def get_feature_space(self, handle):
        return self.feature_space[handle.value]

    def _group_slice(self, handle):
        g = handle.value
        sp = self.spec.groups[g]
        n = self.get_num(handle)
        return slice(sp.offset, sp.offset + n)

    def get_agent_id(self, handle):
        return np.asarray(self.state.id[self._group_slice(handle)], dtype=np.int32)

    def get_alive(self, handle):
        return np.asarray(~self.state.dead[self._group_slice(handle)])

    def get_pos(self, handle):
        sl = self._group_slice(handle)
        return np.stack(
            [np.asarray(self.state.x[sl]), np.asarray(self.state.y[sl])], axis=1
        ).astype(np.int32)

    def get_mean_info(self, handle):
        sl = self._group_slice(handle)
        n_action = self.action_space[handle.value][0]
        xs = np.asarray(self.state.x[sl], dtype=np.float64)
        ys = np.asarray(self.state.y[sl], dtype=np.float64)
        acts = np.asarray(self.state.last_action[sl])
        # fresh agents carry the sentinel last_action == n_action
        # (GridWorld.h:140 "dangerous here"); the reference's histogram
        # write `action_counter[x]++` is out-of-bounds UB for them
        # (GridWorld.cc:777-779), so they are dropped from the counts here
        # (the mean divisor stays the full population, like the reference)
        hist = np.bincount(acts[acts < n_action], minlength=n_action)
        n = max(len(xs), 1)
        out = np.empty(2 + n_action, np.float32)
        out[0] = xs.mean() if len(xs) else 0.0
        out[1] = ys.mean() if len(ys) else 0.0
        out[2:] = hist / n
        return out

    def get_view2attack(self, handle):
        t = self.spec.groups[handle.value].type
        return t.attack_base, t.view2attack()

    def get_both_attack(self):
        """Count of targets attacked by more than one agent last step.

        The reference increments ``attack_obj_counter[obj_pos]`` only AFTER
        the blank-cell check (GridWorld.cc:487-495), so attacks on empty
        cells never count — only attacks that found a live object do.  The
        engine records exactly that: an attacker whose strike landed has
        ``last_op`` ∈ {ATTACK, KILL} and ``op_obj`` = the target's slot
        (core/engine.py attack phase).  Ops are reset by ``clear_dead``
        (Agent::init_reward, GridWorld.h:168-173), so in the canonical
        step→clear_dead loop these records are from the last step.
        (Upstream the stat is compile-time disabled — ``const bool stat =
        false``, GridWorld.cc:458 — so this is a strict superset of the
        reference's observable behavior, which always reports 0.)"""
        from . import spec as speclib

        st = self.state
        last_op = np.asarray(st.last_op)
        op_obj = np.asarray(st.op_obj)
        active = np.asarray(st.active)
        pre_dead = self._pre_step_dead
        if pre_dead is None or len(pre_dead) != len(last_op):
            pre_dead = np.asarray(st.dead)
        counts = {}
        for g in self.spec.groups:
            t = g.type
            sl = slice(g.offset, g.offset + g.cap)
            act = self._actions[sl]
            landed = (last_op[sl] == speclib.OP_ATTACK) | (
                last_op[sl] == speclib.OP_KILL)
            is_attack = (
                active[sl] & ~pre_dead[sl] & landed
                & (act >= t.attack_base) & (act < t.n_action)
                & (op_obj[sl] >= 0)
            )
            for k in np.nonzero(is_attack)[0]:
                tgt = int(op_obj[g.offset + k])
                counts[tgt] = counts.get(tgt, 0) + 1
        return sum(1 for v in counts.values() if v > 1)

    def get_global_minimap(self, height, width):
        sp = self.spec
        G = sp.n_groups
        out = np.zeros((height, width, G), np.float32)
        scale_h = (sp.height + height - 1) // height
        scale_w = (sp.width + width - 1) // width
        for i in range(G):
            channel = (i + 1) % G  # reference called with group=-1
            sl = self._group_slice(self.group_handles[i])
            xs = np.asarray(self.state.x[sl]) // scale_w
            ys = np.asarray(self.state.y[sl]) // scale_h
            np.add.at(out[:, :, channel], (ys, xs), 1.0)
            out[:, :, channel] /= max(len(xs), 1)
        return out

    # ---------------------------------------------------------------- render
    def set_render_dir(self, name):
        if not os.path.exists(name):
            os.makedirs(name, exist_ok=True)
        self._render_dir = name

    def render(self):
        from .render.generator import RenderGenerator

        if self._render_gen is None:
            self._render_gen = RenderGenerator(self._render_dir or "render")
            self._render_gen.file_ct = self._render_reset_ct
        if self._first_render:
            self._first_render = False
            self._render_gen.gen_config(self)
        self._render_gen.render_a_frame(self, include_events=self._render_ever)
        self._render_ever = True

    def _get_groups_info(self):
        colors = [(192, 64, 64), (64, 64, 192), (64, 192, 64), (64, 64, 64)]
        sp = self.spec
        out = np.empty((sp.n_groups, 5), np.int32)
        for i, g in enumerate(sp.groups):
            out[i, 0] = g.type.width
            out[i, 1] = g.type.length
            out[i, 2:5] = colors[i % 4]
        return out

    def _get_walls_info(self):
        wall = np.asarray(self.state.cell_wall)
        ys, xs = np.nonzero(wall)
        return np.stack([xs, ys], axis=1).astype(np.int32)

    def _get_render_info(self, x_range, y_range):
        # querying render info activates event capture, like the first
        # render() (reference: GridWorld.cc:797-798): the first query
        # returns no events, later ones return last step's attack events
        from .render.generator import attack_events

        if self._render_ever:
            ev = attack_events(self)
            self._attack_events = (
                np.asarray(ev, np.int32).reshape(-1, 3)
                if ev else np.zeros((0, 3), np.int32))
        self._render_ever = True
        agent_info = {}
        for handle in self.group_handles:
            sl = self._group_slice(handle)
            ids = np.asarray(self.state.id[sl])
            xs = np.asarray(self.state.x[sl])
            ys = np.asarray(self.state.y[sl])
            absorbed = np.asarray(self.state.absorbed[sl])
            can_absorb = self.spec.groups[handle.value].type.can_absorb
            for k in range(len(ids)):
                if not (x_range[0] <= xs[k] <= x_range[1] and y_range[0] <= ys[k] <= y_range[1]):
                    continue
                if can_absorb and not absorbed[k]:
                    continue
                agent_info[int(ids[k])] = [int(xs[k]), int(ys[k]), handle.value]
        return agent_info, self._attack_events

    # --------------------------------------------------------------- special
    def set_goal(self, handle, method, *args, **kwargs):
        """Assign per-agent goals (deprecated upstream; reference:
        GridWorld.cc:667-679).  The reference's Python layer always forwards
        method="random" regardless of the argument (gridworld.py:485-488),
        and goals are write-only in the C++ engine (``get_goal`` has no call
        sites) — the observable effects are the two engine-RNG draws consumed
        per agent and the stored coordinates, both mirrored here.  Under
        ``goal_mode`` the feature vector also gains two always-zero slots
        (spec.feature_size, reference GridWorld.cc:926-933)."""
        g = handle.value if isinstance(handle, Handle) else int(handle)
        n = self.get_num(Handle(g))
        W, H = self.spec.width, self.spec.height
        goals = np.zeros((n, 2), np.int32)
        for i in range(n):
            goals[i, 0] = self._lcg() % W
            goals[i, 1] = self._lcg() % H
        self._goals[g] = goals
        self.state = self.state.replace(
            lcg=jnp.asarray(self._lcg.state, jnp.uint32)
        )
