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


def _seg_case(A, side, max_body, seed, degenerate=False):
    """Random rect-sweep operands PRE-SORTED by y (the segmented sweep's
    contract); returns (args8, sort_y, order) with ORIGINAL slot ids
    shuffled so order != identity."""
    k = jax.random.PRNGKey(seed)
    y = jax.random.randint(k, (A,), 0, 3 if degenerate else side, jnp.int32)
    x = jax.random.randint(jax.random.fold_in(k, 1), (A,), 0, side, jnp.int32)
    bw = jax.random.randint(jax.random.fold_in(k, 2), (A,), 0, max_body + 1,
                            jnp.int32)
    bh = jax.random.randint(jax.random.fold_in(k, 3), (A,), 0, max_body + 1,
                            jnp.int32)
    # queries near the body rows (the engine's targets are within max_dy)
    qx = x + jax.random.randint(jax.random.fold_in(k, 4), (A,), -2, 3,
                                jnp.int32)
    qy = y + jax.random.randint(jax.random.fold_in(k, 5), (A,), -2, 3,
                                jnp.int32)
    sent = jax.random.bernoulli(jax.random.fold_in(k, 6), 0.2, (A,))
    qx = jnp.where(sent, -2**20, qx)
    tbw = jnp.where(sent, 0, bw)
    tbh = jnp.where(sent, 0, bh)

    slots = jnp.arange(A, dtype=jnp.int32)
    sort_y, order = jax.lax.sort((y, slots), num_keys=1)
    perm = order
    args = tuple(a[perm] for a in (qx, qy, tbw, tbh, x, y, bw, bh))
    return args, sort_y, order


@pytest.mark.parametrize("gate", ["exclude_self", "lower_only"])
def test_rect_first_overlap_seg_matches_xla(gate):
    """The y-segmented sweep (sorted operands + windowed partners +
    explicit slot ids) must equal the full slot-ordered sweep, both when
    windows genuinely subset (uniform ys) and when a degenerate density
    forces the overflow fallback."""
    A = 3072  # 3 segments of SEG_ROWS=1024, SEG_WIN=2048 windows subset
    mb = 2
    for degenerate in (False, True):
        args, sort_y, order = _seg_case(A, 400, mb, 57, degenerate)
        res = ap.rect_first_overlap_seg(
            *args, sort_y, order, max_body=mb, gate=gate,
            margin=mb + 4, interpret=True)
        got = np.zeros(A, np.int32)
        got[np.asarray(order)] = np.asarray(res)
        # oracle on slot-ordered operands
        inv = np.argsort(np.asarray(order))
        slot_args = [np.asarray(a)[inv] for a in args]
        want = np.asarray(ap.rect_first_overlap_xla(
            *[jnp.asarray(a) for a in slot_args], mb, gate))
        np.testing.assert_array_equal(got, want,
                                      err_msg="degenerate=%s" % degenerate)
        assert (want < ap._NONE).sum() > 0


@pytest.mark.parametrize("gate", ["exclude_self", "lower_only"])
def test_rect_first_overlap_slot_operands_match_iota(gate):
    """qslot/bslot operands on shuffled arrays reproduce the slot-ordered
    sweep exactly (the segmented path's overflow-fallback branch)."""
    A = 230
    mb = 2
    args, sort_y, order = _seg_case(A, 40, mb, 91)
    res = ap.rect_first_overlap_tpu(*args, max_body=mb, gate=gate,
                                    interpret=True, qslot=order,
                                    bslot=order)
    got = np.zeros(A, np.int32)
    got[np.asarray(order)] = np.asarray(res)
    inv = np.argsort(np.asarray(order))
    slot_args = [np.asarray(a)[inv] for a in args]
    want = np.asarray(ap.rect_first_overlap_xla(
        *[jnp.asarray(a) for a in slot_args], mb, gate))
    np.testing.assert_array_equal(got, want)


def test_occupant_rect_seg_matches_xla():
    """Segmented rect-occupant lookup == full sweep (slot ids carried as
    operands through the sorted layout), incl. the overflow fallback."""
    A = 3072
    mb = 2
    for degenerate in (False, True):
        k = jax.random.PRNGKey(77 + degenerate)
        y = jax.random.randint(k, (A,), 0, 3 if degenerate else 400,
                               jnp.int32)
        x = jax.random.randint(jax.random.fold_in(k, 1), (A,), 0, 400,
                               jnp.int32)
        bw = jax.random.randint(jax.random.fold_in(k, 2), (A,), 0, mb + 1,
                                jnp.int32)
        bh = jax.random.randint(jax.random.fold_in(k, 3), (A,), 0, mb + 1,
                                jnp.int32)
        hp = jax.random.uniform(jax.random.fold_in(k, 4), (A,))
        qx = x + jax.random.randint(jax.random.fold_in(k, 5), (A,), -3, 4,
                                    jnp.int32)
        qy = y + jax.random.randint(jax.random.fold_in(k, 6), (A,), -3, 4,
                                    jnp.int32)
        slots = jnp.arange(A, dtype=jnp.int32)
        sort_y, order = jax.lax.sort((y, slots), num_keys=1)
        perm = order
        args = tuple(a[perm] for a in (qx, qy, x, y, bw, bh, hp))
        t_s, h_s = ap.occupant_rect_seg(*args, sort_y, order,
                                        margin=3 + mb, interpret=True)
        tgt = np.zeros(A, np.int32)
        hpt = np.zeros(A, np.float32)
        tgt[np.asarray(order)] = np.asarray(t_s)
        hpt[np.asarray(order)] = np.asarray(h_s)
        want_t, want_h = ap.occupant_rect_xla(qx, qy, x, y, bw, bh, hp)
        np.testing.assert_array_equal(tgt, np.asarray(want_t))
        np.testing.assert_allclose(hpt, np.asarray(want_h), atol=1e-6)
        assert (np.asarray(want_t) >= 0).sum() > 0


def test_rank_prefix_seg_matches_xla():
    """Segmented rank-prefix == full sweep on VALID rows (sentinel rows
    accumulate window-dependent garbage both sweeps mask)."""
    A = 3072
    for degenerate in (False, True):
        k = jax.random.PRNGKey(99 + degenerate)
        y = jax.random.randint(k, (A,), 0, 3 if degenerate else 400,
                               jnp.int32)
        # targets spatially near their attackers (reach <= 3 rows):
        # pick a partner among y-neighbors by perturbing own index
        valid = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.7, (A,))
        slots = jnp.arange(A, dtype=jnp.int32)
        sort_y, order = jax.lax.sort((y, slots), num_keys=1)
        # target = a slot whose y is within 3 of mine: pick from the sorted
        # neighborhood
        rank_in_sorted = jnp.zeros(A, jnp.int32).at[order].set(slots)
        nb = jnp.clip(rank_in_sorted
                      + jax.random.randint(jax.random.fold_in(k, 2), (A,),
                                           -8, 9), 0, A - 1)
        tgt_raw = order[nb]
        # enforce the spatial bound (|y_t - y_a| <= 3) or invalidate
        ok = jnp.abs(y[tgt_raw] - y) <= 3
        tgt = jnp.where(valid & ok, tgt_raw, A)  # engine sentinel
        rank = ap.pack_rank(
            jax.random.bits(jax.random.fold_in(k, 3), (A,)), A)
        dmg = jnp.where(valid & ok,
                        jax.random.uniform(jax.random.fold_in(k, 4), (A,)),
                        0.0)
        args = tuple(a[order] for a in (tgt, rank, dmg))
        P_s = ap.rank_prefix_seg(*args, sort_y, margin=2 * 4,
                                 interpret=True)
        got = np.zeros(A, np.float32)
        got[np.asarray(order)] = np.asarray(P_s)
        want = np.asarray(ap.rank_prefix_xla(tgt, rank, dmg))
        mask = np.asarray(valid & ok)
        np.testing.assert_allclose(got[mask], want[mask], atol=1e-5)
        assert mask.sum() > 100


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
