"""Interpret-mode parity for the pairwise conflict-resolution kernels.

tests/conftest.py forces CPU, so the engine's differential tests exercise
only the *_xla fallbacks; these run the actual Pallas kernels
(ops/attack_prefix.py) through the interpreter against the XLA pairwise
formulations — the kernels ARE the production path for the gridless engine
on the chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magent_tpu.ops import attack_prefix as ap


@pytest.fixture(params=[97, 512, 777])
def arrays(request):
    A = request.param
    k = jax.random.PRNGKey(A)
    tgt = jax.random.randint(k, (A,), -1, A, jnp.int32)
    tgt = jnp.where(tgt < 0, 2**30, tgt)
    rank = ap.pack_rank(jax.random.bits(jax.random.fold_in(k, 1), (A,)), A)
    dmg = jax.random.uniform(jax.random.fold_in(k, 2), (A,))
    hp = jax.random.uniform(jax.random.fold_in(k, 3), (A,)) * 10
    # unique occupied cells (1x1 bodies)
    cell = jax.random.permutation(
        jax.random.fold_in(k, 4), jnp.arange(3 * A, dtype=jnp.int32))[:A]
    acell = jax.random.randint(jax.random.fold_in(k, 5), (A,), 0, 3 * A,
                               jnp.int32)
    tcell = jax.random.randint(jax.random.fold_in(k, 6), (A,), 0, A,
                               jnp.int32)
    return tgt, rank, dmg, hp, cell, acell, tcell


def test_rank_prefix_interpret_matches_xla(arrays):
    tgt, rank, dmg, hp, *_ = arrays
    P1 = ap.rank_prefix_tpu(tgt, rank, dmg, interpret=True)
    P2 = ap.rank_prefix_xla(tgt, rank, dmg)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-5)

    P1, H1 = ap.rank_prefix_tpu(tgt, rank, dmg, hp, interpret=True)
    P2, H2 = ap.rank_prefix_xla(tgt, rank, dmg, hp)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), atol=1e-5)


def test_occupant_interpret_matches_xla(arrays):
    _, _, _, hp, cell, acell, _ = arrays
    t1, h1 = ap.occupant_tpu(acell, cell, hp, interpret=True)
    t2, h2 = ap.occupant_xla(acell, cell, hp)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)


def test_move_resolve_interpret_matches_xla(arrays):
    *_, cell, _, tcell = arrays
    c1, hd1, o1 = ap.move_resolve_tpu(tcell, cell, interpret=True)
    c2, hd2, o2 = ap.move_resolve_xla(tcell, cell)
    A = tcell.shape[0]
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # head sentinels differ (2^30 vs A); compare where a contender exists
    hd1, hd2 = np.asarray(hd1), np.asarray(hd2)
    has = hd2 < A
    np.testing.assert_array_equal(hd1[has], hd2[has])


def test_move_claims_interpret_matches_xla(arrays):
    *_, tcell = arrays
    c1, hd1 = ap.move_claims_tpu(tcell, interpret=True)
    c2, hd2 = ap.move_claims_xla(tcell)
    A = tcell.shape[0]
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    hd1, hd2 = np.asarray(hd1), np.asarray(hd2)
    has = hd2 < A
    np.testing.assert_array_equal(hd1[has], hd2[has])
