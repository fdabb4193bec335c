"""Environment state as a pytree of fixed-capacity masked arrays.

Replaces the reference's pointer-based ``Map``/``Agent*`` object graph
(reference: src/gridworld/Map.h, GridWorld.h:131-313) with struct-of-arrays:

- a dense occupancy grid of agent slot indices (multi-cell bodies fill every
  cell of their rectangle), plus wall/food grids
- per-slot agent attribute arrays with ``active``/``dead`` masks; group ``g``
  owns the static slot range ``[offset[g], offset[g]+cap[g])`` and keeps its
  live agents compacted to a prefix of that range after ``clear_dead``

All shapes are static so every step/observe runs under one ``jit``; batches of
envs are `vmap`-ed over the leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .. import spec as speclib
from . import lcg


@struct.dataclass
class State:
    # grid (indexed [y, x])
    cell_slot: jnp.ndarray  # int32 [H, W], occupying agent slot or -1
    cell_wall: jnp.ndarray  # bool  [H, W]
    cell_food: jnp.ndarray  # float32 [H, W], food hp; -1 = none (a 0-value
    # corpse still OCCUPIES its cell in the reference, Map.cc:277-284)

    # agents (capacity A)
    x: jnp.ndarray  # int32 [A], stored top-left of body rect ("save" coords)
    y: jnp.ndarray  # int32 [A]
    dir: jnp.ndarray  # int32 [A], EAST=0 SOUTH=1 WEST=2 NORTH=3
    hp: jnp.ndarray  # float32 [A]
    active: jnp.ndarray  # bool [A], slot in use (incl. dead-not-yet-cleared)
    dead: jnp.ndarray  # bool [A]
    absorbed: jnp.ndarray  # bool [A] (can_absorb demo flag)
    id: jnp.ndarray  # int32 [A]
    last_action: jnp.ndarray  # int32 [A]
    next_reward: jnp.ndarray  # float32 [A], reward accumulated this step
    last_reward: jnp.ndarray  # float32 [A], reward of previous step
    last_op: jnp.ndarray  # int32 [A], event op code, OP_NULL when none
    op_obj: jnp.ndarray  # int32 [A], slot of the op object, -1 when none

    # groups
    group_reward: jnp.ndarray  # float32 [G]
    n_in_group: jnp.ndarray  # int32 [G], used slots per group (prefix)

    # rng / episode
    lcg: jnp.ndarray  # uint32 [], minstd engine state (parity mode)
    key: jnp.ndarray  # uint32 [2], threefry key (fast mode)
    done: jnp.ndarray  # bool []
    id_counter: jnp.ndarray  # int32 []
    step_ct: jnp.ndarray  # int32 []


def init_state(spec: speclib.GameSpec, seed: int | None = None) -> State:
    """Fresh empty state: border walls only (reference: Map.cc:39-46)."""
    import jax

    H, W, A, G = spec.height, spec.width, spec.n_agents_cap, spec.n_groups
    wall = jnp.zeros((H, W), dtype=bool)
    wall = wall.at[0, :].set(True).at[H - 1, :].set(True)
    wall = wall.at[:, 0].set(True).at[:, W - 1].set(True)

    seed = spec.seed if seed is None else seed
    return State(
        cell_slot=jnp.full((H, W), -1, dtype=jnp.int32),
        cell_wall=wall,
        cell_food=jnp.full((H, W), -1.0, dtype=jnp.float32),
        x=jnp.zeros(A, dtype=jnp.int32),
        y=jnp.zeros(A, dtype=jnp.int32),
        dir=jnp.full(A, speclib.NORTH, dtype=jnp.int32),
        hp=jnp.zeros(A, dtype=jnp.float32),
        active=jnp.zeros(A, dtype=bool),
        dead=jnp.zeros(A, dtype=bool),
        absorbed=jnp.zeros(A, dtype=bool),
        id=jnp.zeros(A, dtype=jnp.int32),
        last_action=jnp.zeros(A, dtype=jnp.int32),
        next_reward=jnp.zeros(A, dtype=jnp.float32),
        last_reward=jnp.zeros(A, dtype=jnp.float32),
        last_op=jnp.full(A, speclib.OP_NULL, dtype=jnp.int32),
        op_obj=jnp.full(A, -1, dtype=jnp.int32),
        group_reward=jnp.zeros(G, dtype=jnp.float32),
        n_in_group=jnp.zeros(G, dtype=jnp.int32),
        lcg=jnp.asarray(lcg.seed_state(seed), dtype=jnp.uint32),
        key=jax.random.PRNGKey(seed).astype(jnp.uint32),
        done=jnp.asarray(False),
        id_counter=jnp.asarray(0, dtype=jnp.int32),
        step_ct=jnp.asarray(0, dtype=jnp.int32),
    )
