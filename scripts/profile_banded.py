"""Cost ladder for the banded window kernel (ops.window_gather_banded) —
the obs path for maps whose channel image exceeds VMEM (single-world
1e5/1e6 agents, round-4 ladder: obs = 522 of 930 ms/step at 16x62500).

The banded call has four parts: PACK (the overlapping-band image copy),
SORT (band sort + chunk-padding tables), KERNEL (the Pallas launch), and
UNSORT (the take_along_axis that restores slot order).  Each variant is
its own scanned program with per-iteration input dependence (a
loop-invariant body gets hoisted and reads ~4x too fast — profile_drqn's
pitfall); component isolation uses hoisting deliberately: `fixed_pos`
keeps positions loop-invariant so XLA hoists SORT out of the scan, and
`fixed_img` hoists PACK.

Usage:
  python scripts/profile_banded.py --n_envs 16 --per_env 62500  # map 1118
  python scripts/profile_banded.py --n_envs 1 --per_env 1000000 # map 4472
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from magent_tpu.ops import window_gather as wg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_envs", type=int, default=16)
    ap.add_argument("--per_env", type=int, default=62500)
    ap.add_argument("--vh", type=int, default=11)  # forest predator view
    ap.add_argument("--C", type=int, default=5)    # wall + 2 groups x (has,hp)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--band_rows", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=40)
    # NOTE: the "xla" variant crashed the TPU worker at 16x62500 (gather at
    # ~1M x 2.4k-float windows) — keep it opt-in, not in the defaults
    ap.add_argument("variants", nargs="*",
                    default=["full", "fixed_pos", "fixed_img", "pack",
                             "sort", "unsort", "unsort_flat", "unsort_lane",
                             "unsort_scatter", "unsort_bf16"])
    args = ap.parse_args()

    B, N = args.n_envs, args.per_env
    vh = vw = args.vh
    C = args.C
    map_size = int(math.sqrt(N * 20))
    Hp, Wp, lanes, pad_y, pad_x = wg.padded_geometry(map_size, map_size, C,
                                                     vh, vw)
    vwc = vw * C
    rows = wg._ceil_to(vh + wg._SUBLANE - 1, wg._SUBLANE)
    n_bands = -(-Hp // args.band_rows)
    img_mb = B * Hp * lanes * 4 / 1e6
    print(f"map {map_size}^2, {B} envs x {N} agents; image [B,{Hp},{lanes}]"
          f" = {img_mb:.0f} MB, {n_bands} bands", flush=True)

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (B, Hp, lanes), jnp.float32)
    # top-left positions of in-map agents (uniform over the map)
    def rand_pos(k):
        y = jax.random.randint(k, (B, N), pad_y, pad_y + map_size - vh)
        x = jax.random.randint(jax.random.fold_in(k, 1), (B, N),
                               pad_x, pad_x + map_size - vw)
        return y * Wp + x
    pos0 = rand_pos(jax.random.fold_in(key, 7))
    mask = jnp.ones((vh, vwc), jnp.float32)

    kw = dict(vh=vh, vw=vw, C=C, Wp=Wp, chunk=args.chunk,
              band_rows=args.band_rows)

    def timed(name, body, *operands):
        @jax.jit
        def run(k, *ops):
            def step(carry, t):
                k = carry
                k = jax.random.fold_in(k, t)
                return k, body(k, *ops)
            k, sink = jax.lax.scan(step, k, jnp.arange(args.steps))
            return jnp.sum(sink)

        print(f"[{time.strftime('%H:%M:%S')}] compiling {name}...",
              flush=True)
        s = run(key, *operands)
        float(s)
        t0 = time.perf_counter()
        for c in range(args.calls):
            s = run(jax.random.fold_in(key, c), *operands)
        float(s)
        dt = time.perf_counter() - t0
        ms = dt / (args.steps * args.calls) * 1e3
        rate = B * N * args.steps * args.calls / dt
        print(f"{name:12s} {ms:9.3f} ms/step   {rate/1e6:7.2f}M windows/s",
              flush=True)
        return ms

    which = args.variants
    # sink: a lane-friendly slice per agent (XLA layout assignment copies a
    # whole Pallas output to feed a scalar-slice fusion — CLAUDE.md)
    def sink_windows(out):
        return jnp.sum(out[:, :, 0, 0].astype(jnp.float32))

    if "full" in which:
        def body(k, img, pos):
            im = img + jax.random.uniform(k, (1, 1, 1))
            p = (pos + jax.random.randint(k, (B, N), 0, 2)).clip(0,
                                                                 Hp * Wp - 1)
            out = wg.window_gather_banded(im, p, mask, **kw)
            return sink_windows(out)
        timed("full", body, img, pos0)

    if "fixed_pos" in which:
        # positions loop-invariant -> SORT hoists out of the scan:
        # measures PACK + KERNEL + UNSORT
        def body(k, img, pos):
            im = img + jax.random.uniform(k, (1, 1, 1))
            out = wg.window_gather_banded(im, pos, mask, **kw)
            return sink_windows(out)
        timed("fixed_pos", body, img, pos0)

    if "fixed_img" in which:
        # image loop-invariant -> PACK hoists: SORT + KERNEL + UNSORT
        def body(k, img, pos):
            p = (pos + jax.random.randint(k, (B, N), 0, 2)).clip(0,
                                                                 Hp * Wp - 1)
            out = wg.window_gather_banded(img, p, mask, **kw)
            return sink_windows(out)
        timed("fixed_img", body, img, pos0)

    if "kernel" in which:
        # fixed pos (tables hoisted) + no unsort: PACK + KERNEL only
        def body(k, img, pos):
            im = img + jax.random.uniform(k, (1, 1, 1))
            out, inv = wg.window_gather_banded(im, pos, mask, unsort=False,
                                               **kw)
            return jnp.sum(out[:, :, 0, 0])
        timed("kernel", body, img, pos0)

    if "pack" in which:
        def body(k, img):
            im = img + jax.random.uniform(k, (1, 1, 1))
            g = wg.banded_pack(im, band_rows=args.band_rows, rows=rows)
            return jnp.sum(g[:, ::64, ::128])
        timed("pack", body, img)

    if "sort" in which:
        def body(k, pos):
            p = (pos + jax.random.randint(k, (B, N), 0, 2)).clip(0,
                                                                 Hp * Wp - 1)
            pos_pad, chunk_band, inv = wg.banded_tables(
                p, Wp=Wp, band_rows=args.band_rows, n_bands=n_bands,
                chunk=args.chunk)
            return (jnp.sum(pos_pad[:, ::64]) + jnp.sum(inv[:, ::64])
                    + jnp.sum(chunk_band[:, ::8]))
        timed("sort", body, pos0)

    n_pad = wg._ceil_to(N, args.chunk) + n_bands * args.chunk
    if "unsort" in which:
        wins = jax.random.uniform(jax.random.fold_in(key, 3),
                                  (B, n_pad, vh, vwc), jnp.float32)
        def body(k, wins):
            inv = jax.random.randint(k, (B, N), 0, n_pad)
            out = jnp.take_along_axis(wins, inv[:, :, None, None], axis=1)
            return sink_windows(out)
        timed("unsort", body, wins)

    if "unsort_flat" in which:
        # gather rows of a flattened [B, n_pad, vh*vwc] array
        wins = jax.random.uniform(jax.random.fold_in(key, 3),
                                  (B, n_pad, vh * vwc), jnp.float32)
        def body(k, wins):
            inv = jax.random.randint(k, (B, N), 0, n_pad)
            out = jnp.take_along_axis(wins, inv[:, :, None], axis=1)
            return jnp.sum(out[:, :, 0])
        timed("unsort_flat", body, wins)

    if "unsort_lane" in which:
        # gather rows padded to a 128-lane multiple (what the kernel would
        # emit with a padded out block): is the 55-lane row the problem?
        row = wg._ceil_to(vh * vwc, 128)
        wins = jax.random.uniform(jax.random.fold_in(key, 3),
                                  (B, n_pad, row), jnp.float32)
        def body(k, wins):
            inv = jax.random.randint(k, (B, N), 0, n_pad)
            out = jnp.take_along_axis(wins, inv[:, :, None], axis=1)
            return jnp.sum(out[:, :, 0])
        timed("unsort_lane", body, wins)

    if "unsort_scatter" in which:
        # scatter banded rows to slot positions instead of gathering
        row = wg._ceil_to(vh * vwc, 128)
        wins = jax.random.uniform(jax.random.fold_in(key, 3),
                                  (B, n_pad, row), jnp.float32)
        def body(k, wins):
            dest = jax.random.randint(k, (B, n_pad), 0, N)
            out = jnp.zeros((B, N, row), jnp.float32).at[
                jnp.arange(B)[:, None], dest].set(wins)
            return jnp.sum(out[:, :, 0])
        timed("unsort_scatter", body, wins)

    if "unsort_bf16" in which:
        wins = jax.random.uniform(jax.random.fold_in(key, 3),
                                  (B, n_pad, vh, vwc)).astype(jnp.bfloat16)
        def body(k, wins):
            inv = jax.random.randint(k, (B, N), 0, n_pad)
            out = jnp.take_along_axis(wins, inv[:, :, None, None], axis=1)
            return sink_windows(out)
        timed("unsort_bf16", body, wins)

    if "xla" in which:
        def body(k, img, pos):
            p = (pos + jax.random.randint(k, (B, N), 0, 2)).clip(0,
                                                                 Hp * Wp - 1)
            out = wg.window_gather_xla(img, p, mask, vh=vh, vw=vw, C=C, Wp=Wp)
            return sink_windows(out)
        timed("xla", body, img, pos0)


if __name__ == "__main__":
    main()
