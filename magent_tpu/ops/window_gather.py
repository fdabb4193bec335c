"""Per-agent view-window extraction kernel.

This is the observation hot loop (reference: Map::extract_view,
src/gridworld/Map.cc:129-207 — an OpenMP loop scanning each agent's rotated
window).  Here the whole map is first rendered once into a dense per-cell
channel image ``gfull`` of shape [B, Hp, Wp*C] (channels contiguous per cell
along lanes), and each agent's (vh, vw*C) window is then a 2-D slice at a
dynamic offset.

XLA lowers dynamic per-agent slices to a generic gather, which this TPU
backend executes at ~140M elem/s — 50x too slow.  The Pallas kernel instead
keeps the image block in VMEM and, per agent, issues one aligned vector load
plus two dynamic rolls:

- loads must start at (sublane % 8 == 0, lane % 128 == 0), so the kernel
  loads an aligned (ROWS, LANES) superset of the window;
- ``pltpu.roll`` (dynamic rotate) shifts the window to origin (positive
  shifts only — negative sublane rolls miscompile on this toolchain);
- the top-left (vh, vw*C) corner is multiplied by the view-range mask and
  stored.

Grid = (B, n_chunks): one program per (env, agent-chunk); the image block is
re-fetched only when the env index changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# superset load geometry: window rows <= ROWS - 7, window lanes <= LANES - 127
_SUBLANE = 8

# scalar-prefetch SMEM budgets, int32 elements (module-level so tests can
# shrink them to exercise the sub-batch splits in interpret mode)
SMEM_BUDGET = 200_000       # single pos operand (~800KB)
SMEM_BUDGET_G4 = 66_000     # three operands (word/aux/act) share ~800KB

_LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supports_pallas() -> bool:
    """Pallas TPU kernels need a real TPU backend."""
    return jax.default_backend() == "tpu"


def padded_geometry(H: int, W: int, C: int, vh: int, vw: int):
    """Compute the padded image geometry for a (vh, vw, C) window over an
    (H, W) map.

    Returns (Hp, Wp, lanes, pad_y, pad_x): the image holds map cell (y, x)
    at image position (y + pad_y, (x + pad_x) * C); windows whose top-left is
    any in-map agent position stay fully inside, and aligned superset loads
    never run off the end.
    """
    pad_y = vh  # covers -y1 up to vh
    pad_x = vw
    rows = _ceil_to(vh + _SUBLANE - 1, _SUBLANE)
    Hp = _ceil_to(H + 2 * pad_y + rows, _SUBLANE)
    Wp = W + 2 * pad_x
    vwc = vw * C
    lanes_load = _ceil_to(vwc + _LANE - 1, _LANE)
    lanes = _ceil_to(Wp * C, _LANE) + lanes_load
    # widen Wp so Wp * C == lanes exactly: the channel image is then built
    # at its final lane width by the compare-table expansion and the
    # 120MB-per-step jnp.pad to `lanes` disappears (physical VMEM tiles are
    # identical either way)
    Wp = -(-lanes // C)
    lanes = Wp * C
    return Hp, Wp, lanes, pad_y, pad_x


@functools.partial(
    jax.jit,
    static_argnames=("vh", "vw", "C", "Wp", "chunk", "interpret", "out_dtype"),
)
def window_gather(gfull, pos, mask, *, vh, vw, C,
                  Wp, chunk=40, interpret=False, out_dtype=jnp.float32):
    """Gather per-agent windows from a padded channel image.

    gfull: [B, Hp, lanes] f32 — padded image (see :func:`padded_geometry`).
    pos:   [B, N] int32 — packed ``(tl_y * Wp + tl_x) * 1024 + self_cell``
           where tl is the window top-left in padded map cells and
           ``self_cell`` (< 1024) is the agent's pooled minimap cell
           ``sy * vw + sx`` (0 when minimap is off; unused here — the
           minimap epilogue runs in XLA for this kernel, observe.py; the
           fused in-kernel variant is :func:`window_gather4`).

    Returns [B, N, vh, vw*C].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp, lanes = gfull.shape
    N = pos.shape[1]
    vwc = vw * C
    rows = _ceil_to(vh + _SUBLANE - 1, _SUBLANE)
    lanes_load = _ceil_to(vwc + _LANE - 1, _LANE)

    n_pad = _ceil_to(N, chunk)
    if n_pad != N:
        pos = jnp.pad(pos, ((0, 0), (0, n_pad - N)))

    # the position table is a scalar-prefetch operand and must fit SMEM
    # (~1MB); at mega scale split the call over env sub-batches (or, for a
    # single huge env, over agent sub-ranges)
    smem_budget = SMEM_BUDGET
    if B * n_pad > smem_budget:
        outs = []
        if B > 1:
            n_sub = max(1, smem_budget // n_pad)
            for b0 in range(0, B, n_sub):
                outs.append(window_gather(
                    gfull[b0 : b0 + n_sub], pos[b0 : b0 + n_sub, :N], mask,
                    vh=vh, vw=vw, C=C, Wp=Wp, chunk=chunk,
                    interpret=interpret, out_dtype=out_dtype,
                ))
            return jnp.concatenate(outs, axis=0)
        n_sub = max(chunk, (smem_budget // chunk) * chunk)
        for a0 in range(0, N, n_sub):
            outs.append(window_gather(
                gfull, pos[:, a0 : a0 + n_sub], mask,
                vh=vh, vw=vw, C=C, Wp=Wp, chunk=chunk, interpret=interpret,
                out_dtype=out_dtype,
            ))
        return jnp.concatenate(outs, axis=1)[:, :N]

    def kernel(pos_ref, g_ref, mask_ref, out_ref):
        b = pl.program_id(0)
        k = pl.program_id(1)
        base = b * n_pad + k * chunk
        m = mask_ref[...]

        def body(a, _):
            p = pos_ref[base + a]
            p = p // 1024  # drop the (unused) packed minimap self-cell
            yy = p // Wp
            lane = (p % Wp) * C
            y8 = (yy // _SUBLANE) * _SUBLANE
            l128 = (lane // _LANE) * _LANE
            win = g_ref[
                0,
                pl.ds(pl.multiple_of(y8, _SUBLANE), rows),
                pl.ds(pl.multiple_of(l128, _LANE), lanes_load),
            ]
            win = pltpu.roll(win, (rows - (yy - y8)) % rows, 0)
            win = pltpu.roll(win, (lanes_load - (lane - l128)) % lanes_load, 1)
            out_ref[0, a] = (win[:vh, :vwc] * m).astype(out_dtype)
            return 0

        # fully unrolled: the rolled-load body is ~30 vector ops, and the
        # sequential fori_loop's per-iteration overhead costs ~50% on top
        jax.lax.fori_loop(0, chunk, body, 0, unroll=chunk)

    in_specs = [
        pl.BlockSpec((1, Hp, lanes), lambda b, k, pos: (b, 0, 0)),
        pl.BlockSpec((vh, vwc), lambda b, k, pos: (0, 0)),
    ]
    operands = (pos.reshape(-1), gfull, mask)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_pad // chunk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, chunk, vh, vwc), lambda b, k, pos: (b, k, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, vh, vwc), out_dtype),
        interpret=interpret,
    )(*operands)
    return out[:, :N]


@functools.partial(
    jax.jit,
    static_argnames=("vh", "vw", "C", "Wp", "chunk", "interpret", "out_dtype"),
)
def window_gather4(gfull, pos, mask, mm_img=None, mm_mask=None, act=None, *,
                   vh, vw, C, Wp, chunk=200, interpret=False,
                   out_dtype=jnp.float32):
    """Window gather via shifted image replicas: minimum-size aligned loads.

    :func:`window_gather` loads an aligned (vh+7→%8, vw*C+127→%128) superset
    per agent and pays two full-size rolls — ~2x the data movement the
    window needs.  This variant keeps FOUR copies of the image, shifted by
    (0|4 rows, 0|64 lanes); picking the right replica caps the residual
    offsets at (3, 63), so a (16, 128) load suffices for windows up to
    (13, 65) and the rolls shrink to match.  ~2x fewer vector ops per agent
    at battle geometry, for 4x the image VMEM (use only when it fits).

    Optional fused epilogue (saves a separate XLA pass over the ~100MB of
    windows): ``mm_img [B, vh, vw*C]`` pooled minimaps added to every
    window, ``mm_mask [vh, vw*C]`` the minimap-channel mask (the agent's
    own pooled cell, packed in ``pos`` as ``tl*1024 + self_cell``, gets +1
    there), ``act [B, N] int32`` a 0/1 liveness factor per agent.

    ``out_dtype``: windows are computed in f32 (the image stays f32 — Mosaic
    rejects bf16 dynamic sublane rolls) and cast just before the store;
    ``bfloat16`` halves the output HBM traffic (~260MB/pass at battle scale)
    and measures ~19% faster per call on v5e.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hp, lanes = gfull.shape
    N = pos.shape[1]
    vwc = vw * C
    # residuals cap at (3, 63) after replica selection, so the load covers
    # windows up to (16-3, 128-63) = (13, 65)
    assert vh <= 13 and vwc <= 65, (vh, vwc)
    ROWS, LANES = 16, 128
    minor = 64
    minimap = mm_img is not None

    n_pad = _ceil_to(N, chunk)
    if n_pad != N:
        pos = jnp.pad(pos, ((0, 0), (0, n_pad - N)))
        if act is not None:
            act = jnp.pad(act, ((0, 0), (0, n_pad - N)))

    # three scalar-prefetch operands (word/aux/act) share the ~1MB SMEM
    # budget; split over env sub-batches when they would not fit
    # (cf. the same split in :func:`window_gather`)
    smem_budget = SMEM_BUDGET_G4
    if B * n_pad > smem_budget:
        outs = []
        if B > 1:
            n_sub = max(1, smem_budget // n_pad)
            for b0 in range(0, B, n_sub):
                outs.append(window_gather4(
                    gfull[b0 : b0 + n_sub], pos[b0 : b0 + n_sub, :N], mask,
                    None if mm_img is None else mm_img[b0 : b0 + n_sub],
                    mm_mask,
                    None if act is None else act[b0 : b0 + n_sub, :N],
                    vh=vh, vw=vw, C=C, Wp=Wp, chunk=chunk,
                    interpret=interpret, out_dtype=out_dtype,
                ))
            return jnp.concatenate(outs, axis=0)
        # single huge env: split over agent sub-ranges instead (cf. the
        # same fallback in :func:`window_gather` — without it a B=1 call
        # past the budget would launch with >1MB of SMEM prefetch operands)
        n_sub = max(chunk, (smem_budget // chunk) * chunk)
        for a0 in range(0, N, n_sub):
            outs.append(window_gather4(
                gfull, pos[:, a0 : a0 + n_sub], mask, mm_img, mm_mask,
                None if act is None else act[:, a0 : a0 + n_sub],
                vh=vh, vw=vw, C=C, Wp=Wp, chunk=chunk, interpret=interpret,
                out_dtype=out_dtype,
            ))
        return jnp.concatenate(outs, axis=1)[:, :N]

    # precompute ALL per-agent address math here (vectorized, free) — the
    # kernel's scalar unit pays multi-cycle div/mods per agent otherwise.
    # word = rep<<29 | y8<<15 | l128, aux = rry<<17 | rrl<<10 | self_cell
    p = pos // 1024
    self_cell = pos % 1024
    yy = p // Wp
    lane = (p % Wp) * C
    y8 = (yy // _SUBLANE) * _SUBLANE
    l128 = (lane // _LANE) * _LANE
    ry = yy - y8
    rl = lane - l128
    sel_r = (ry >= 4).astype(jnp.int32)
    sel_l = (rl >= minor).astype(jnp.int32)
    rep = sel_r * 2 + sel_l
    rry = (ROWS - (ry - sel_r * 4)) % ROWS
    rrl = (LANES - (rl - sel_l * minor)) % LANES
    assert Hp < (1 << 14) and lanes < (1 << 15), (Hp, lanes)
    word = (rep << 29) | (y8 << 15) | l128
    aux = (rry << 17) | (rrl << 10) | self_cell

    # replicas shifted by (dr, dl): reading replica (dr, dl) at aligned
    # (r, l) yields image rows r+dr.., lanes l+dl..
    def shift(img, dr, dl):
        out = img
        if dr:
            out = jnp.pad(out[:, dr:], ((0, 0), (0, dr), (0, 0)))
        if dl:
            out = jnp.pad(out[:, :, dl:], ((0, 0), (0, 0), (0, dl)))
        return out

    reps = jnp.stack(
        [shift(gfull, 0, 0), shift(gfull, 0, minor),
         shift(gfull, 4, 0), shift(gfull, 4, minor)], axis=0
    )  # [4, B, Hp, lanes]

    def body_window(word_ref, aux_ref, g_ref, a, base):
        w = word_ref[base + a]
        x = aux_ref[base + a]
        win = g_ref[
            w >> 29, 0,
            pl.ds(pl.multiple_of((w >> 15) & 0x3FFF, _SUBLANE), ROWS),
            pl.ds(pl.multiple_of(w & 0x7FFF, _LANE), LANES),
        ]
        win = pltpu.roll(win, (x >> 17) & 0xF, 0)
        win = pltpu.roll(win, (x >> 10) & 0x7F, 1)
        return win

    if minimap:
        def kernel(word_ref, aux_ref, act_ref, g_ref, mask_ref, mm_ref,
                   mmm_ref, out_ref):
            b = pl.program_id(0)
            k = pl.program_id(1)
            base = b * n_pad + k * chunk
            m = mask_ref[...]
            mm = mm_ref[0]
            mmm = mmm_ref[...]
            cell_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (vh, vwc), 0) * vw
                + jax.lax.broadcasted_iota(jnp.int32, (vh, vwc), 1) // C
            )

            def body(a, _):
                win = body_window(word_ref, aux_ref, g_ref, a, base)
                self_cell = aux_ref[base + a] & 0x3FF
                self_add = (cell_ids == self_cell).astype(jnp.float32) * mmm
                alive = act_ref[base + a].astype(jnp.float32)
                out_ref[0, a] = (
                    (win[:vh, :vwc] * m + mm + self_add) * alive
                ).astype(out_dtype)
                return 0

            jax.lax.fori_loop(0, chunk, body, 0, unroll=chunk)

        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B, n_pad // chunk),
                in_specs=[
                    pl.BlockSpec((4, 1, Hp, lanes),
                                 lambda b, k, w, x, act: (0, b, 0, 0)),
                    pl.BlockSpec((vh, vwc), lambda b, k, w, x, act: (0, 0)),
                    pl.BlockSpec((1, vh, vwc),
                                 lambda b, k, w, x, act: (b, 0, 0)),
                    pl.BlockSpec((vh, vwc), lambda b, k, w, x, act: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, chunk, vh, vwc), lambda b, k, w, x, act: (b, k, 0, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, vh, vwc), out_dtype),
            interpret=interpret,
        )(word.reshape(-1), aux.reshape(-1), act.reshape(-1), reps, mask,
          mm_img, mm_mask)
        return out[:, :N]

    def kernel(word_ref, aux_ref, g_ref, mask_ref, out_ref):
        b = pl.program_id(0)
        k = pl.program_id(1)
        base = b * n_pad + k * chunk
        m = mask_ref[...]

        def body(a, _):
            win = body_window(word_ref, aux_ref, g_ref, a, base)
            out_ref[0, a] = (win[:vh, :vwc] * m).astype(out_dtype)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=chunk)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_pad // chunk),
            in_specs=[
                pl.BlockSpec((4, 1, Hp, lanes),
                             lambda b, k, w, x: (0, b, 0, 0)),
                pl.BlockSpec((vh, vwc), lambda b, k, w, x: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, chunk, vh, vwc), lambda b, k, w, x: (b, k, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, vh, vwc), out_dtype),
        interpret=interpret,
    )(word.reshape(-1), aux.reshape(-1), reps, mask)
    return out[:, :N]


def banded_pack(gfull, *, band_rows, rows):
    """Build the overlapping-band image for :func:`window_gather_banded`:
    band b's slab replicates its ``rows`` margin from band b+1 (Pallas
    block indexing cannot express overlapping blocks).  One full-image
    HBM copy per call."""
    B, Hp, lanes = gfull.shape
    n_bands = -(-Hp // band_rows)
    block_rows = band_rows + rows
    # pad the image so the last band's block never runs off the end
    gfull = jnp.pad(gfull, ((0, 0), (0, n_bands * band_rows + rows - Hp),
                            (0, 0)))
    slabs = [
        jax.lax.dynamic_slice_in_dim(gfull, b * band_rows, block_rows, axis=1)
        for b in range(n_bands)
    ]
    return jnp.concatenate(slabs, axis=1)  # [B, n_bands*block_rows, lanes]


def banded_tables(pos, *, Wp, band_rows, n_bands, chunk):
    """Band sort + per-band chunk padding (pure XLA bookkeeping) for
    :func:`window_gather_banded`.

    Returns ``(pos_pad, chunk_band, inv)``: padded per-chunk position
    tables (dummies point at their band's first row), the chunk->band
    prefetch table, and the slot->dest permutation that undoes the band
    sort on the kernel outputs."""
    B, N = pos.shape
    band = pos // (Wp * band_rows)
    slot_iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    s_band, s_pos, s_slot = jax.lax.sort(
        (band.astype(jnp.int32), pos.astype(jnp.int32), slot_iota), num_keys=1
    )
    # rank within band
    def per_env(s_band_e, s_pos_e, s_slot_e):
        counts = jnp.zeros(n_bands, jnp.int32).at[s_band_e].add(1)
        padded = -(-counts // chunk) * chunk
        pad_off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1]]
        )
        start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        rank = jnp.arange(N, dtype=jnp.int32) - start[s_band_e]
        dest = pad_off[s_band_e] + rank
        return dest, padded, pad_off

    dest, padded_counts, pad_offs = jax.vmap(per_env)(s_band, s_pos, s_slot)

    n_pad_total = _ceil_to(N, chunk) + n_bands * chunk  # static upper bound
    n_chunks = n_pad_total // chunk
    # chunk -> band table (per env): chunk k belongs to the band whose padded
    # range contains k*chunk
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    chunk_band = (
        jnp.sum(
            (pad_offs[:, None, :] <= chunk_starts[None, :, None]).astype(
                jnp.int32
            ),
            axis=2,
        )
        - 1
    )
    chunk_band = jnp.clip(chunk_band, 0, n_bands - 1)

    # padded position tables; dummies point at their band's first row
    pos_pad = jnp.zeros((B, n_pad_total), jnp.int32)
    pos_pad = pos_pad.reshape(B, n_chunks, chunk) + (
        chunk_band[:, :, None] * band_rows * Wp
    )
    pos_pad = pos_pad.reshape(B, n_pad_total)
    pos_pad = pos_pad.at[
        jnp.arange(B)[:, None], dest
    ].set(s_pos)

    # undo-the-sort permutation: for each original slot, where its window
    # lands in the padded chunk layout
    inv = jnp.zeros((B, N), jnp.int32).at[
        jnp.arange(B)[:, None], s_slot
    ].set(dest)
    return pos_pad, chunk_band, inv


@functools.partial(
    jax.jit,
    static_argnames=("vh", "vw", "C", "Wp", "chunk", "band_rows", "interpret",
                     "out_dtype", "unsort"),
)
def window_gather_banded(gfull, pos, mask, *, vh, vw, C, Wp, chunk=40,
                         band_rows=32, interpret=False,
                         out_dtype=jnp.float32, unsort=True):
    """Window gather for images too large for VMEM: the image is processed
    in horizontal bands; agents are sorted by band and each kernel program
    loads only its band's block.

    Same contract as :func:`window_gather` with unpacked positions
    (``pos = tl_y * Wp + tl_x``, no self-cell packing).  Returns windows in
    SLOT order (the band sort is undone with one gather over the outputs).

    ``band_rows`` must be a multiple of 8 (sublane alignment); the block a
    program sees is ``band_rows + rows`` tall, so VMEM use is
    ``(band_rows + rows) * lanes * 4`` bytes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert band_rows % _SUBLANE == 0
    B, Hp, lanes = gfull.shape
    N = pos.shape[1]
    vwc = vw * C
    rows = _ceil_to(vh + _SUBLANE - 1, _SUBLANE)
    lanes_load = _ceil_to(vwc + _LANE - 1, _LANE)
    n_bands = -(-Hp // band_rows)
    block_rows = band_rows + rows

    gbanded = banded_pack(gfull, band_rows=band_rows, rows=rows)
    pos_pad, chunk_band, inv = banded_tables(
        pos, Wp=Wp, band_rows=band_rows, n_bands=n_bands, chunk=chunk)
    n_pad_total = pos_pad.shape[1]
    n_chunks = n_pad_total // chunk

    # the position table must fit SMEM (~1MB): split the launch over chunk
    # ranges; the banded image operand is shared (no copies).  The prefetch
    # operand holds B * k_count * chunk entries, so the env batch divides
    # the budget too.
    smem_budget = SMEM_BUDGET
    k_sub = max(1, min(n_chunks, smem_budget // (chunk * max(B, 1))))

    def launch(pos_part, band_part, k_count):
        def kernel(pos_ref, band_ref, g_ref, mask_ref, out_ref):
            b = pl.program_id(0)
            k = pl.program_id(1)
            base = b * (k_count * chunk) + k * chunk
            band_base = band_ref[b * k_count + k] * band_rows
            m = mask_ref[...]

            def body(a, _):
                p = pos_ref[base + a]
                yy = p // Wp - band_base
                lane = (p % Wp) * C
                y8 = (yy // _SUBLANE) * _SUBLANE
                l128 = (lane // _LANE) * _LANE
                win = g_ref[
                    0,
                    pl.ds(pl.multiple_of(y8, _SUBLANE), rows),
                    pl.ds(pl.multiple_of(l128, _LANE), lanes_load),
                ]
                win = pltpu.roll(win, (rows - (yy - y8)) % rows, 0)
                win = pltpu.roll(win, (lanes_load - (lane - l128)) % lanes_load, 1)
                out_ref[0, a] = (win[:vh, :vwc] * m).astype(out_dtype)
                return 0

            jax.lax.fori_loop(0, chunk, body, 0, unroll=chunk)

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, k_count),
                in_specs=[
                    pl.BlockSpec(
                        (1, block_rows, lanes),
                        lambda b, k, pos, band: (b, band[b * k_count + k], 0),
                    ),
                    pl.BlockSpec((vh, vwc), lambda b, k, pos, band: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, chunk, vh, vwc), lambda b, k, pos, band: (b, k, 0, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((B, k_count * chunk, vh, vwc),
                                           out_dtype),
            interpret=interpret,
        )(pos_part.reshape(-1), band_part.reshape(-1), gbanded, mask)

    if k_sub == n_chunks:
        out = launch(pos_pad, chunk_band, n_chunks)
    else:
        parts = []
        pos_3d = pos_pad.reshape(B, n_chunks, chunk)
        for k0 in range(0, n_chunks, k_sub):
            kc = min(k_sub, n_chunks - k0)
            parts.append(launch(
                pos_3d[:, k0 : k0 + kc].reshape(B, kc * chunk),
                chunk_band[:, k0 : k0 + kc], kc,
            ))
        out = jnp.concatenate(parts, axis=1)

    if not unsort:
        # banded order + the slot->row permutation, for consumers that can
        # defer/avoid the window permutation (profiling; order-free sinks)
        return out, inv

    # undo the band sort: for each original slot, where did its window land.
    # Gather FLATTENED [n_pad, vh*vwc] rows: the 4-D take_along_axis (slice
    # sizes (1,1,vh,vwc)) lowers to a gather ~18x slower than the same
    # permutation over 2-D rows (measured 505 -> 28 ms at 16x62500,
    # scripts/profile_banded.py unsort vs unsort_flat)
    n_pad_out = out.shape[1]
    flat = out.reshape(B, n_pad_out, vh * vwc)
    picked = jnp.take_along_axis(flat, inv[:, :, None], axis=1)
    return picked.reshape(B, N, vh, vwc)


def window_gather_xla(gfull, pos, mask, *, vh, vw, C, Wp):
    """Reference XLA fallback (CPU tests / non-TPU backends), implemented
    with a plain gather.  Unlike :func:`window_gather`, ``pos`` here is the
    UNPACKED top-left cell index ``tl_y * Wp + tl_x`` (no ``* 1024 +
    self_cell`` packing; cf. :func:`window_gather_banded`)."""
    B, Hp, lanes = gfull.shape
    y0 = pos // Wp
    x0 = pos % Wp
    oy = jnp.arange(vh, dtype=jnp.int32)
    ox = jnp.arange(vw * C, dtype=jnp.int32)
    gy = y0[:, :, None, None] + oy[None, None, :, None]
    gl = x0[:, :, None, None] * C + ox[None, None, None, :]

    def per_env(g, yy, ll):
        return g[yy, ll]

    out = jax.vmap(per_env)(gfull, gy, gl)
    return out * mask[None, None]
