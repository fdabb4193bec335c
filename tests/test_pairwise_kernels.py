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


@pytest.mark.parametrize("gate", ["exclude_self", "lower_only"])
@pytest.mark.parametrize("max_body", [2, 3])
def test_rect_first_overlap_interpret_matches_xla(gate, max_body):
    A = 230
    k = jax.random.PRNGKey(41 + max_body)
    side = 40
    x = jax.random.randint(k, (A,), 0, side, jnp.int32)
    y = jax.random.randint(jax.random.fold_in(k, 1), (A,), 0, side, jnp.int32)
    bw = jax.random.randint(jax.random.fold_in(k, 2), (A,), 0, max_body + 1,
                            jnp.int32)
    bh = jax.random.randint(jax.random.fold_in(k, 3), (A,), 0, max_body + 1,
                            jnp.int32)
    qx = jax.random.randint(jax.random.fold_in(k, 4), (A,), 0, side, jnp.int32)
    qy = jax.random.randint(jax.random.fold_in(k, 5), (A,), 0, side, jnp.int32)
    # some non-queries carry the caller's sentinel
    sent = jax.random.bernoulli(jax.random.fold_in(k, 6), 0.2, (A,))
    qx = jnp.where(sent, -2**20, qx)
    tbw = jnp.where(sent, 0, bw)
    tbh = jnp.where(sent, 0, bh)

    s1 = ap.rect_first_overlap_tpu(qx, qy, tbw, tbh, x, y, bw, bh,
                                   max_body=max_body, gate=gate,
                                   interpret=True)
    s2 = ap.rect_first_overlap_xla(qx, qy, tbw, tbh, x, y, bw, bh,
                                   max_body, gate)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert int(jnp.sum(s2 < ap._NONE)) > 0  # the case actually overlaps


@pytest.mark.parametrize("gate", ["exclude_self", "lower_only"])
def test_rect_first_overlap_matches_cell_min_semantics(gate):
    """The single-reduction kernel must reproduce the per-cell sweep logic
    it replaced (first overlapped cell in (i outer, j inner) scan order,
    then the covering slot)."""
    A, MB, side = 150, 2, 30
    k = jax.random.PRNGKey(7)
    x = jax.random.randint(k, (A,), 0, side, jnp.int32)
    y = jax.random.randint(jax.random.fold_in(k, 1), (A,), 0, side, jnp.int32)
    bw = jax.random.randint(jax.random.fold_in(k, 2), (A,), 0, MB + 1, jnp.int32)
    bh = jax.random.randint(jax.random.fold_in(k, 3), (A,), 0, MB + 1, jnp.int32)
    qx = jax.random.randint(jax.random.fold_in(k, 4), (A,), 0, side, jnp.int32)
    qy = jax.random.randint(jax.random.fold_in(k, 5), (A,), 0, side, jnp.int32)

    cells = ap.rect_cell_min_xla(qx, qy, bw, bh, x, y, bw, bh, MB,
                                 gate == "exclude_self")
    slots = jnp.arange(A, dtype=jnp.int32)
    want = jnp.full(A, ap._NONE, jnp.int32)
    found = jnp.zeros(A, bool)
    for c in cells:  # scan order: first cell with a qualifying occupant
        if gate == "lower_only":
            hit = c < slots
        else:
            hit = c < ap._NONE
        want = jnp.where(~found & hit, c, want)
        found = found | hit

    got = ap.rect_first_overlap_xla(qx, qy, bw, bh, x, y, bw, bh, MB, gate)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_move_claims_interpret_matches_xla(arrays):
    *_, tcell = arrays
    c1, hd1 = ap.move_claims_tpu(tcell, interpret=True)
    c2, hd2 = ap.move_claims_xla(tcell)
    A = tcell.shape[0]
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    hd1, hd2 = np.asarray(hd1), np.asarray(hd2)
    has = hd2 < A
    np.testing.assert_array_equal(hd1[has], hd2[has])
