"""DiscreteSnake: the reference's second (deprecated) game, TPU-native.

Capability parity with the reference engine (reference:
src/discrete_snake/DiscreteSnake.{h,cc}, Map.{h,cc}, snake_def.h and the
Python wrapper python/magent/discrete_snake.py):

- snakes move on a grid with actions RIGHT/DOWN/LEFT/UP/NOOP; reversing is
  ignored (DiscreteSnake.cc:184-193);
- bodies grow with accumulated reward (tail pops while
  ``total_reward + 1 + initial_length - eps >= length``,
  DiscreteSnake.cc:199-201);
- heads hitting walls or other snakes die; two heads on one cell kill both;
  eating food adds its value as reward (Map::move_head, Map.cc:183-218);
- dead snakes turn into corpse food and the total food resource is
  rebalanced every step (DiscreteSnake.cc:246-281);
- observations are a (view_h, view_w, 5) window around the head with
  channels wall/food/self/other/id plus features
  [id embedding | last-action one-hot | length] (snake_def.h:29,
  DiscreteSnake.cc:127-152).

The TPU design: bodies are fixed-capacity ring buffers [A, max_length];
grids (owner slot, per-cell body count, food value, wall) are dense arrays;
one jitted step resolves every snake simultaneously (double-head kills are
exact; the reference resolves them the same way via its head mask).
Observations reuse the window-gather kernel over a 5-channel image.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .ops import window_gather as wg

ACT_RIGHT, ACT_DOWN, ACT_LEFT, ACT_UP, ACT_NOOP, ACT_NUM = 0, 1, 2, 3, 4, 5
_DELTA = np.asarray([[1, 0], [0, 1], [-1, 0], [0, -1]], np.int32)
_INVERSE = np.asarray([ACT_LEFT, ACT_UP, ACT_RIGHT, ACT_DOWN], np.int32)
CHANNEL_NUM = 5  # wall food self other id


class Config:
    """reference: python/magent/discrete_snake.py:204-209"""

    def __init__(self):
        self.config_dict = {}

    def set(self, args):
        for key in args:
            self.config_dict[key] = args[key]


@struct.dataclass
class SnakeState:
    body_x: jnp.ndarray  # int32 [A, L] ring buffer
    body_y: jnp.ndarray  # int32 [A, L]
    head: jnp.ndarray  # int32 [A], ring index of the head
    length: jnp.ndarray  # int32 [A]
    dir: jnp.ndarray  # int32 [A]
    alive: jnp.ndarray  # bool [A]
    active: jnp.ndarray  # bool [A] (slot in use; dead-but-not-cleared stays)
    id: jnp.ndarray  # int32 [A]
    last_action: jnp.ndarray  # int32 [A]
    total_reward: jnp.ndarray  # f32 [A] (drives growth)
    step_reward: jnp.ndarray  # f32 [A]
    cell_owner: jnp.ndarray  # int32 [H, W] slot or -1
    cell_ct: jnp.ndarray  # int32 [H, W] body segments on the cell
    cell_food: jnp.ndarray  # f32 [H, W]
    cell_wall: jnp.ndarray  # bool [H, W]
    key: jnp.ndarray
    id_counter: jnp.ndarray  # int32 []


class DiscreteSnake:
    OBS_VIEW_INDEX = 0
    OBS_FEATURE_INDEX = 1

    def __new__(cls, config=None, *args, engine_mode: str = "fast", **kwargs):
        if engine_mode == "sequential":
            # reference-order host engine driven by the glibc random()
            # stream — the bit-exact parity mode (core/seq_snake.py)
            from .core.seq_snake import SequentialSnake

            return SequentialSnake(config, **kwargs)
        return super().__new__(cls)

    def __init__(self, config, caps: int = 256, max_length: int = 48,
                 engine_mode: str = "fast", **kwargs):
        cd = config.config_dict
        self.width = int(cd.get("map_width", 100))
        self.height = int(cd.get("map_height", 100))
        self.view_width = int(cd.get("view_width", 21))
        self.view_height = int(cd.get("view_height", 21))
        self.max_dead_penalty = float(cd.get("max_dead_penalty", -10))
        self.corpse_value = float(cd.get("corpse_value", 1))
        self.initial_length = int(cd.get("initial_length", 3))
        # the reference hardcodes (int)(100*100*0.1) in its constructor and
        # never recomputes it from the actual map size
        # (DiscreteSnake.cc:20,75-76)
        self.total_resource = int(cd.get("total_resource", 1000))
        self.embedding_size = int(cd.get("embedding_size", 16))
        self.caps = caps
        self.max_length = max_length

        self.view_space = [self.view_height, self.view_width, CHANNEL_NUM]
        self.feature_space = self.embedding_size + ACT_NUM + 1
        self.action_space = ACT_NUM

        self._rng = np.random.RandomState(int(cd.get("seed", 0)))
        self._actions = np.zeros(caps, np.int32)
        self._step_fn = jax.jit(self._make_step())
        self._obs_fn = jax.jit(self._make_observe())
        self.reset()

    # ------------------------------------------------------------------ state
    def reset(self):
        # the reference bumps the replay file number on EVERY reset
        # (DiscreteSnake.cc:43 render_generator.next_file()), so the first
        # user reset dumps video_1.txt (the constructor's internal reset
        # does not count: the reference constructor never resets)
        gen = getattr(self, "_render_gen", None)
        if gen is not None:
            gen.file_ct += 1
            gen.frame_ct = 0
        else:
            self._render_reset_ct = getattr(self, "_render_reset_ct", -1) + 1
        H, W, A, L = self.height, self.width, self.caps, self.max_length
        wall = np.zeros((H, W), bool)
        wall[0, :] = wall[-1, :] = wall[:, 0] = wall[:, -1] = True
        self.state = SnakeState(
            body_x=jnp.zeros((A, L), jnp.int32),
            body_y=jnp.zeros((A, L), jnp.int32),
            head=jnp.zeros(A, jnp.int32),
            length=jnp.zeros(A, jnp.int32),
            dir=jnp.zeros(A, jnp.int32),
            alive=jnp.zeros(A, bool),
            active=jnp.zeros(A, bool),
            id=jnp.zeros(A, jnp.int32),
            last_action=jnp.full(A, ACT_NUM, jnp.int32),
            total_reward=jnp.zeros(A, jnp.float32),
            step_reward=jnp.zeros(A, jnp.float32),
            cell_owner=jnp.full((H, W), -1, jnp.int32),
            cell_ct=jnp.zeros((H, W), jnp.int32),
            cell_food=jnp.zeros((H, W), jnp.float32),
            cell_wall=jnp.asarray(wall),
            key=jax.random.PRNGKey(7),
            id_counter=jnp.asarray(0, jnp.int32),
        )
        self._actions[:] = ACT_NOOP

    # ------------------------------------------------------------- add object
    def _blank_host(self):
        owner = np.asarray(self.state.cell_owner)
        wall = np.asarray(self.state.cell_wall)
        food = np.asarray(self.state.cell_food)
        return (~wall) & (owner < 0) & (food <= 0)

    def add_walls(self, method, **kwargs):
        assert method == "random"
        blank = self._blank_host()
        wall = np.asarray(self.state.cell_wall).copy()
        n = int(kwargs["n"])
        ys, xs = np.nonzero(blank)
        pick = self._rng.choice(len(xs), size=min(n, len(xs)), replace=False)
        wall[ys[pick], xs[pick]] = True
        self.state = self.state.replace(cell_wall=jnp.asarray(wall))

    def add_food(self, method, **kwargs):
        assert method == "random"
        blank = self._blank_host()
        food = np.asarray(self.state.cell_food).copy()
        n = int(kwargs["n"])
        ys, xs = np.nonzero(blank)
        pick = self._rng.choice(len(xs), size=min(n, len(xs)), replace=False)
        food[ys[pick], xs[pick]] = self.corpse_value
        self.state = self.state.replace(cell_food=jnp.asarray(food))

    def add_agent(self, method, *args, **kwargs):
        """random snake placement by a short self-avoiding walk
        (reference: Map::get_random_blank, discrete_snake/Map.cc:65-111)"""
        assert method == "random"
        n = int(kwargs["n"])
        st = self.state
        blank = self._blank_host()
        owner = np.asarray(st.cell_owner).copy()
        ct = np.asarray(st.cell_ct).copy()
        bx = np.asarray(st.body_x).copy()
        by = np.asarray(st.body_y).copy()
        head = np.asarray(st.head).copy()
        length = np.asarray(st.length).copy()
        dirs = np.asarray(st.dir).copy()
        alive = np.asarray(st.alive).copy()
        active = np.asarray(st.active).copy()
        ids = np.asarray(st.id).copy()
        idc = int(st.id_counter)

        free_slots = np.nonzero(~active)[0]
        placed = 0
        tries = 0
        while placed < n and placed < len(free_slots) and tries < self.width * self.height:
            tries += 1
            body = []
            x = self._rng.randint(self.width)
            y = self._rng.randint(self.height)
            ok = True
            last_dir = 100
            for i in range(self.initial_length):
                if not blank[y, x]:
                    ok = False
                    break
                body.append((x, y))
                start = self._rng.randint(100)
                moved = False
                for j in range(4):
                    d = (start + j) % 4
                    if abs(d - last_dir) == 2:
                        continue
                    nx, ny = x + _DELTA[d][0], y + _DELTA[d][1]
                    if 0 <= nx < self.width and 0 <= ny < self.height and blank[ny, nx] \
                            and (nx, ny) not in body:
                        x, y, last_dir, moved = nx, ny, d, True
                        break
                if not moved and i < self.initial_length - 1:
                    ok = False
                    break
            if not ok or len(body) < self.initial_length:
                continue
            slot = free_slots[placed]
            # body[0] is the head in ring order
            for i, (cx, cy) in enumerate(body):
                ring = (self.initial_length - 1 - i) % self.max_length
                bx[slot, ring] = cx
                by[slot, ring] = cy
                owner[cy, cx] = slot
                ct[cy, cx] += 1
                blank[cy, cx] = False
            head[slot] = self.initial_length - 1
            length[slot] = self.initial_length
            dirs[slot] = self._rng.randint(4)
            alive[slot] = True
            active[slot] = True
            ids[slot] = idc
            idc += 1
            placed += 1

        self.state = st.replace(
            body_x=jnp.asarray(bx), body_y=jnp.asarray(by),
            head=jnp.asarray(head), length=jnp.asarray(length),
            dir=jnp.asarray(dirs), alive=jnp.asarray(alive),
            active=jnp.asarray(active), id=jnp.asarray(ids),
            cell_owner=jnp.asarray(owner), cell_ct=jnp.asarray(ct),
            id_counter=jnp.asarray(idc, jnp.int32),
        )

    # ------------------------------------------------------------------- step
    def _make_step(self):
        H, W, A, L = self.height, self.width, self.caps, self.max_length
        init_len = self.initial_length
        eps = 1e-6
        delta = jnp.asarray(_DELTA)
        inverse = jnp.asarray(_INVERSE)
        corpse_value = self.corpse_value
        max_dead_penalty = self.max_dead_penalty
        total_resource = self.total_resource

        def gather_body(st, ring_idx):
            take = jnp.clip(ring_idx, 0, L - 1)
            rows = jnp.arange(A)
            return st.body_x[rows, take], st.body_y[rows, take]

        def step(st: SnakeState, actions):
            act = jnp.asarray(actions, jnp.int32)
            alive = st.alive & st.active

            # direction update (DiscreteSnake.cc:184-193)
            change = alive & (act != ACT_NOOP) & (act != st.dir) & (act != inverse[jnp.clip(st.dir, 0, 3)])
            d = jnp.where(change, act, st.dir)

            # push new head into the ring
            hx, hy = gather_body(st, st.head)
            nhx = jnp.clip(hx + delta[jnp.clip(d, 0, 3), 0], 0, W - 1)
            nhy = jnp.clip(hy + delta[jnp.clip(d, 0, 3), 1], 0, H - 1)
            new_head_idx = jnp.where(alive, (st.head + 1) % L, st.head)
            rows = jnp.arange(A)
            body_x = st.body_x.at[rows, new_head_idx].set(
                jnp.where(alive, nhx, st.body_x[rows, new_head_idx]))
            body_y = st.body_y.at[rows, new_head_idx].set(
                jnp.where(alive, nhy, st.body_y[rows, new_head_idx]))
            # a full ring (length == L) overwrites its own tail slot: that is
            # a FORCED tail pop (the reference's deque is unbounded; here the
            # lost tail cell must leave the grid or it haunts it forever)
            forced = alive & (st.length >= L)
            length = jnp.where(alive, jnp.minimum(st.length + 1, L), st.length)

            # pop tail while too long (DiscreteSnake.cc:199-201).  The
            # post-push tail is element length-1, ring new_head-(length-1);
            # a FORCED pop removes the old tail whose ring slot the push
            # just overwrote (= new_head_idx), so its coords must come from
            # the PRE-push ring (st) — which is also identical to the
            # post-push ring at the normal tail slot for length >= 2
            want = jnp.floor(st.total_reward + 1 + init_len - eps).astype(jnp.int32)
            pop = alive & (want < length)
            tail_idx = jnp.where(
                forced, new_head_idx, (new_head_idx - (length - 1) + L) % L)
            st2 = st.replace(body_x=body_x, body_y=body_y)
            tx, ty = gather_body(st, tail_idx)
            do_pop = pop | forced
            cell_ct = st.cell_ct.at[
                jnp.where(do_pop, ty, H), jnp.where(do_pop, tx, W)].add(
                -1, mode="drop")
            length = jnp.where(pop, length - 1, length)
            # owner cleared where count hits zero is recomputed below

            # head collision resolution (DiscreteSnake.cc:205-244)
            head_cell = nhy * W + nhx
            head_cnt = jnp.zeros(H * W + 1, jnp.int32).at[
                jnp.where(alive, head_cell, H * W)
            ].add(1)[: H * W]
            double_head = alive & (head_cnt[head_cell] > 1)
            hit_wall = alive & st.cell_wall[nhy, nhx]
            owner_at = st.cell_owner[nhy, nhx]
            # cells vacated by tail pops this step do NOT count as occupied
            # (the reference pops every tail before any head check,
            # DiscreteSnake.cc:183-206) — hence the post-pop cell_ct here
            occupied = (owner_at >= 0) & (cell_ct[nhy, nhx] > 0)
            hit_other = alive & occupied & (owner_at != rows)
            food_val = st.cell_food[nhy, nhx]
            eat = alive & ~double_head & ~hit_wall & ~hit_other & (food_val > 0)
            dead_now = double_head | hit_wall | hit_other

            step_reward = jnp.where(eat, food_val, 0.0)
            step_reward = jnp.where(dead_now, -max_dead_penalty, step_reward)
            total_reward = st.total_reward + jnp.where(alive, step_reward, 0.0)

            # eaten food disappears; survivors' heads occupy their cells
            cell_food = st.cell_food.at[
                jnp.where(eat, nhy, H), jnp.where(eat, nhx, W)
            ].set(0.0, mode="drop")
            surv = alive & ~dead_now
            cell_owner = st.cell_owner.at[
                jnp.where(surv, nhy, H), jnp.where(surv, nhx, W)
            ].set(jnp.where(surv, rows, -1).astype(jnp.int32), mode="drop")
            cell_ct = cell_ct.at[
                jnp.where(surv, nhy, H), jnp.where(surv, nhx, W)
            ].add(1, mode="drop")

            # dead snakes: remove body, drop corpse food on body cells
            # beyond the initial length (DiscreteSnake.cc:252-259)
            corpse_budget = jnp.where(dead_now, length - init_len, 0)
            for i in range(L):
                ring = (new_head_idx - i + L) % L
                # i=0 is the just-pushed head, which a dead snake never put
                # on the grid — removing it would corrupt whatever occupies
                # that cell (another snake's body, a wall, a blank)
                in_body = dead_now & (i >= 1) & (i < length)
                cx, cy = gather_body(st2, ring)
                cxi = jnp.where(in_body, cx, W)
                cyi = jnp.where(in_body, cy, H)
                cell_ct = cell_ct.at[cyi, cxi].add(-1, mode="drop")
                cell_owner = cell_owner.at[cyi, cxi].set(-1, mode="drop")
                drop = in_body & (i <= corpse_budget)  # in_body already skips the head
                cell_food = cell_food.at[
                    jnp.where(drop, cy, H), jnp.where(drop, cx, W)
                ].set(corpse_value, mode="drop")

            # owner invariant: cells whose body count hit zero are free
            cell_owner = jnp.where(cell_ct > 0, cell_owner, -1)

            alive_next = alive & ~dead_now

            # resource balancing (DiscreteSnake.cc:262-281): spawn food on
            # random blank cells until total food ~= total_resource
            added_length = jnp.sum(
                jnp.where(alive_next, length - init_len, 0)
            )
            n_food = jnp.sum((cell_food > 0).astype(jnp.int32))
            need = jnp.clip(total_resource - added_length - n_food, 0, 1024)
            key, sub = jax.random.split(st.key)
            k1, k2 = jax.random.split(sub)
            cx = jax.random.randint(k1, (1024,), 0, W)
            cy = jax.random.randint(k2, (1024,), 0, H)
            blank = (~st.cell_wall[cy, cx]) & (cell_ct[cy, cx] == 0) & (
                cell_food[cy, cx] <= 0)
            # count each cell once: two candidates on the same blank cell
            # spawn ONE food but would decrement `need` twice otherwise
            cells = cy * W + cx
            order = jnp.arange(1024)
            first = jnp.full(H * W + 1, 1 << 30, jnp.int32).at[
                jnp.where(blank, cells, H * W)].min(order.astype(jnp.int32))
            uniq = blank & (first[cells] == order)
            take = uniq & (jnp.cumsum(uniq.astype(jnp.int32)) <= need)
            cell_food = cell_food.at[
                jnp.where(take, cy, H), jnp.where(take, cx, W)
            ].set(corpse_value, mode="drop")

            return st.replace(
                body_x=body_x, body_y=body_y, head=new_head_idx,
                length=length, dir=d, alive=alive_next,
                last_action=act,
                total_reward=total_reward, step_reward=step_reward,
                cell_owner=cell_owner, cell_ct=cell_ct, cell_food=cell_food,
                key=key,
            )

        return step

    # ------------------------------------------------------------------- obs
    def _make_observe(self):
        H, W, A = self.height, self.width, self.caps
        vh, vw = self.view_height, self.view_width
        C = CHANNEL_NUM
        emb = self.embedding_size
        Hp, Wp, lanes, pad_y, pad_x = wg.padded_geometry(H, W, C, vh, vw)

        mask = jnp.ones((vh, vw * C), jnp.float32)

        def observe(st: SnakeState):
            # channel image: wall/food (self/other resolved per observer)
            idc = jnp.maximum(st.id_counter, 1).astype(jnp.float32)
            img = jnp.zeros((Hp, Wp, C), jnp.float32)
            img = img.at[pad_y : pad_y + H, pad_x : pad_x + W, 0].set(
                st.cell_wall.astype(jnp.float32))
            img = img.at[pad_y : pad_y + H, pad_x : pad_x + W, 1].set(
                (st.cell_food > 0).astype(jnp.float32))
            occ = (st.cell_ct > 0).astype(jnp.float32)
            img = img.at[pad_y : pad_y + H, pad_x : pad_x + W, 3].set(occ)
            owner_id = jnp.where(
                st.cell_ct > 0,
                (st.id[jnp.clip(st.cell_owner, 0, A - 1)].astype(jnp.float32) + 1)
                / idc,
                0.0,
            )
            img = img.at[pad_y : pad_y + H, pad_x : pad_x + W, 4].set(owner_id)
            flat = jnp.pad(img.reshape(Hp, Wp * C),
                           ((0, 0), (0, lanes - Wp * C)))[None]

            rows = jnp.arange(A)
            hx = st.body_x[rows, jnp.clip(st.head, 0, self.max_length - 1)]
            hy = st.body_y[rows, jnp.clip(st.head, 0, self.max_length - 1)]
            tlx = hx - vw // 2 + pad_x
            tly = hy - vh // 2 + pad_y
            pos = (tly * Wp + tlx)[None]

            if wg.supports_pallas():
                view = wg.window_gather(flat, pos * 1024, mask, vh=vh, vw=vw,
                                        C=C, Wp=Wp, chunk=min(40, A))
            else:
                view = wg.window_gather_xla(flat, pos, mask, vh=vh, vw=vw,
                                            C=C, Wp=Wp)
            view = view.reshape(A, vh, vw, C)
            # other -> self where the owner is the observer itself
            owner_win = view[..., 3]
            # self channel: cells owned by me (detected by id match)
            my_idval = (st.id.astype(jnp.float32) + 1) / idc
            is_self = (jnp.abs(view[..., 4] - my_idval[:, None, None]) < 1e-6) & (
                owner_win > 0)
            view = view.at[..., 2].set(is_self.astype(jnp.float32))
            view = view.at[..., 3].set(
                jnp.where(is_self, 0.0, owner_win))

            feats = []
            if emb > 0:
                bits = (st.id[:, None] >> jnp.arange(emb)[None, :]) & 1
                feats.append(bits.astype(jnp.float32))
            feats.append(jax.nn.one_hot(st.last_action, ACT_NUM, dtype=jnp.float32))
            feats.append(st.length.astype(jnp.float32)[:, None])
            feature = jnp.concatenate(feats, axis=1)

            act_mask = st.active
            view = view * act_mask[:, None, None, None]
            feature = feature * act_mask[:, None]
            return view, feature

        return observe

    # ------------------------------------------------------------------- api
    def get_observation(self, handle=0):
        view, feat = self._obs_fn(self.state)
        n = self.get_num()
        idx = np.nonzero(np.asarray(self.state.active))[0][:n]
        return (np.asarray(view)[idx], np.asarray(feat)[idx])

    def set_action(self, handle, actions):
        idx = np.nonzero(np.asarray(self.state.active))[0]
        acts = np.full(self.caps, ACT_NOOP, np.int32)
        acts[idx] = np.asarray(actions, np.int32)[: len(idx)]
        self._actions = acts

    def step(self):
        self.state = self._step_fn(self.state, jnp.asarray(self._actions))
        return False

    def get_reward(self, handle=0):
        idx = np.nonzero(np.asarray(self.state.active))[0]
        return np.asarray(self.state.step_reward)[idx].astype(np.float32)

    def clear_dead(self):
        st = self.state
        active = np.asarray(st.active) & np.asarray(st.alive)
        self.state = st.replace(active=jnp.asarray(active))

    def get_num(self, handle=0):
        return int(np.sum(np.asarray(self.state.active)))

    def get_action_space(self, handle=0):
        return (self.action_space,)

    def get_view_space(self, handle=0):
        return tuple(self.view_space)

    def get_feature_space(self, handle=0):
        return (self.feature_space,)

    def get_agent_id(self, handle=0):
        idx = np.nonzero(np.asarray(self.state.active))[0]
        return np.asarray(self.state.id)[idx].astype(np.int32)

    def get_head(self, handle=0):
        st = self.state
        idx = np.nonzero(np.asarray(st.active))[0]
        rows = idx
        h = np.asarray(st.head)[idx] % self.max_length
        return np.stack(
            [np.asarray(st.body_x)[rows, h], np.asarray(st.body_y)[rows, h]],
            axis=1,
        ).astype(np.int32)

    def get_alive(self, handle=0):
        idx = np.nonzero(np.asarray(self.state.active))[0]
        return np.asarray(self.state.alive)[idx]

    def get_length(self, handle=0):
        idx = np.nonzero(np.asarray(self.state.active))[0]
        return np.asarray(self.state.length)[idx].astype(np.int32)

    def get_food_num(self):
        return int(np.sum(np.asarray(self.state.cell_food) > 0))

    def set_render_dir(self, name):
        from .render.generator import SnakeRenderGenerator

        self._render_dir = name
        self._render_gen = SnakeRenderGenerator(name)
        self._render_gen.file_ct = getattr(self, "_render_reset_ct", 0)
        self._render_gen.gen_config(self)

    def render(self):
        """Append one replay frame (reference:
        src/discrete_snake/RenderGenerator.cc:146-203)."""
        gen = getattr(self, "_render_gen", None)
        if gen is not None:
            gen.render_a_frame(self)

    def render_next_file(self):
        gen = getattr(self, "_render_gen", None)
        if gen is not None:
            gen.file_ct += 1
            gen.frame_ct = 0
