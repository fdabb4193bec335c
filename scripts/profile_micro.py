"""Micro-costs of the engine's primitive ops at battle scale (B=16, A=2048).

Each measurement is a scanned loop on the real chip (single dispatches cost
~25-30ms through the tunnel).  Usage:
    python scripts/profile_micro.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magent_tpu_jax_cache")

import jax
import jax.numpy as jnp

from magent_tpu.ops import attack_prefix as ap

B = 16
A = 2048
STEPS = 64
CALLS = 3


def timed(name, init, body):
    @jax.jit
    def run(carry):
        carry, sink = jax.lax.scan(lambda c, _: body(c), carry, None,
                                   length=STEPS)
        return carry, jnp.sum(sink)

    carry = init(jax.random.PRNGKey(0))
    print(f"[{time.strftime('%H:%M:%S')}] compiling {name}...", flush=True)
    carry2, sink = run(carry)
    float(sink)
    t0 = time.perf_counter()
    for _ in range(CALLS):
        carry2, sink = run(carry2)
    float(sink)
    dt = time.perf_counter() - t0
    print(f"{name:18s} {dt / (STEPS * CALLS) * 1e3:7.3f} ms/step", flush=True)


def main():
    which = sys.argv[1:] or ["rank_prefix", "move_claims", "row_gather",
                             "scatter_max", "scatter_set", "rand_bits"]

    if "rank_prefix" in which:
        def init(key):
            tgt = jax.random.randint(key, (B, A), -1, A, jnp.int32)
            dmg = jnp.ones((B, A), jnp.float32)
            return (tgt, dmg, jax.random.PRNGKey(1))

        def body(c):
            tgt, dmg, key = c
            key, k2 = jax.random.split(key)
            bits = jax.random.bits(k2, (B, A))
            rank = jax.vmap(lambda b: ap.pack_rank(b, A))(bits)
            P = jax.vmap(ap.rank_prefix)(tgt, rank, dmg)
            return (tgt, dmg, key), jnp.sum(P[:, ::256])

        timed("rank_prefix", init, body)

    if "move_claims" in which:
        def init(key):
            return (jax.random.randint(key, (B, A), 0, 40000, jnp.int32),
                    jnp.zeros((B,), jnp.float32))

        def body(c):
            tcell, acc = c
            cnt, head = jax.vmap(ap.move_claims)(tcell)
            s = jnp.sum(cnt[:, ::256] + head[:, ::256], axis=1).astype(jnp.float32)
            return (tcell + 1, acc + s), jnp.sum(s)

        timed("move_claims", init, body)

    if "row_gather" in which:
        def init(key):
            vals = jax.random.normal(key, (B, A, 2))
            idx = jax.random.randint(jax.random.PRNGKey(3), (B, A), 0, A,
                                     jnp.int32)
            return (vals, idx)

        def body(c):
            vals, idx = c
            out = jnp.take_along_axis(vals, idx[..., None], axis=1)
            return (vals + 1e-6, (idx + 1) % A), jnp.sum(out[:, ::256])

        timed("row_gather", init, body)

    if "scatter_max" in which:
        def init(key):
            vals = jax.random.uniform(key, (B, A))
            idx = jax.random.randint(jax.random.PRNGKey(3), (B, A), 0, A,
                                     jnp.int32)
            return (vals, idx)

        def body(c):
            vals, idx = c
            out = jax.vmap(
                lambda v, i: jnp.zeros(A + 1, jnp.float32).at[i].max(v)[:A]
            )(vals, idx)
            return (vals + 1e-6, (idx + 1) % A), jnp.sum(out[:, ::256])

        timed("scatter_max", init, body)

    if "scatter_set" in which:
        def init(key):
            vals = jax.random.uniform(key, (B, A, 2))
            idx = jax.random.randint(jax.random.PRNGKey(3), (B, A), 0, A,
                                     jnp.int32)
            return (vals, idx)

        def body(c):
            vals, idx = c
            out = jax.vmap(
                lambda v, i: jnp.zeros((A + 1, 2), jnp.float32).at[i].set(v)[:A]
            )(vals, idx)
            return (vals + 1e-6, (idx + 1) % A), jnp.sum(out[:, ::256])

        timed("scatter_set", init, body)

    if "rand_bits" in which:
        def init(key):
            return (key,)

        def body(c):
            (key,) = c
            key, k2 = jax.random.split(key)
            bits = jax.random.bits(k2, (B, A))
            return (key,), jnp.sum(bits[:, ::256].astype(jnp.float32))

        timed("rand_bits", init, body)


if __name__ == "__main__":
    main()
