"""Vectorized coordinate transforms between body ("save") coords, the
direction-dependent anchor ("real") coords, and relative offsets.

Replicates reference Map.cc:515-607 (rela_to_abs / abs_to_rela / save_to_real /
real_to_save / get_size_for_dir) as branch-free array ops over the direction
enum EAST=0, SOUTH=1, WEST=2, NORTH=3 (grid_def.h:15).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..spec import NORTH, SOUTH, WEST


def save_to_real(x, y, d, w, l):
    """Stored top-left -> direction anchor (reference: Map.cc:553-574)."""
    rx = jnp.where(
        d == NORTH, x, jnp.where(d == SOUTH, x + w - 1, jnp.where(d == WEST, x, x + l - 1))
    )
    ry = jnp.where(
        d == NORTH, y, jnp.where(d == SOUTH, y + l - 1, jnp.where(d == WEST, y + w - 1, y))
    )
    return rx, ry


def real_to_save(x, y, d, w, l):
    """Direction anchor -> stored top-left (reference: Map.cc:576-595)."""
    sx = jnp.where(
        d == NORTH, x, jnp.where(d == SOUTH, x - w + 1, jnp.where(d == WEST, x, x - l + 1))
    )
    sy = jnp.where(
        d == NORTH, y, jnp.where(d == SOUTH, y - l + 1, jnp.where(d == WEST, y - w + 1, y))
    )
    return sx, sy


def rela_to_abs(cx, cy, d, rx, ry):
    """Relative (agent frame) -> absolute (reference: Map.cc:515-532)."""
    ax = jnp.where(
        d == NORTH, cx + rx, jnp.where(d == SOUTH, cx - rx, jnp.where(d == WEST, cx + ry, cx - ry))
    )
    ay = jnp.where(
        d == NORTH, cy + ry, jnp.where(d == SOUTH, cy - ry, jnp.where(d == WEST, cy - rx, cy + rx))
    )
    return ax, ay


def size_for_dir(d, w, l):
    """Axis-aligned body rect size for a direction (reference: Map.cc:597-607)."""
    ns = (d == NORTH) | (d == SOUTH)
    return jnp.where(ns, w, l), jnp.where(ns, l, w)


def size_for_dir_np(d, w, l):
    """Host (scalar/numpy) variant of :func:`size_for_dir` — the ONE place
    the direction→footprint convention lives for host-side placement code
    (env._commit_agents); the jitted grid builders use :func:`size_for_dir`."""
    ns = (d == NORTH) | (d == SOUTH)
    return (w if ns else l), (l if ns else w)


def save_to_real_np(x, y, d, w, l):
    """Host (numpy) variant of :func:`save_to_real` for render dumps."""
    import numpy as np

    rx = np.where(
        d == NORTH, x, np.where(d == SOUTH, x + w - 1, np.where(d == WEST, x, x + l - 1))
    )
    ry = np.where(
        d == NORTH, y, np.where(d == SOUTH, y + l - 1, np.where(d == WEST, y + w - 1, y))
    )
    return rx, ry


def rela_to_abs_np(cx, cy, d, rx, ry):
    """Host (numpy) variant of :func:`rela_to_abs` for render dumps."""
    import numpy as np

    ax = np.where(
        d == NORTH, cx + rx, np.where(d == SOUTH, cx - rx, np.where(d == WEST, cx + ry, cx - ry))
    )
    ay = np.where(
        d == NORTH, cy + ry, np.where(d == SOUTH, cy - ry, np.where(d == WEST, cy - rx, cy + rx))
    )
    return ax, ay


def rotate_move_delta(d, dx, dy):
    """Move delta rotation (reference: GridWorld.cc:587-595)."""
    ddx = jnp.where(
        d == NORTH, dx, jnp.where(d == SOUTH, -dx, jnp.where(d == WEST, dy, -dy))
    )
    ddy = jnp.where(
        d == NORTH, dy, jnp.where(d == SOUTH, -dy, jnp.where(d == WEST, -dx, dx))
    )
    return ddx, ddy
