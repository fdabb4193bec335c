"""Parity between the three observation paths: the kernel-formulated fast
path (XLA fallback), the Pallas kernel in interpreter mode, and the legacy
rotation-capable gather path (which mirrors the reference's Map::extract_view
most directly)."""

import numpy as np
import jax
import pytest

import magent_tpu as magent
from magent_tpu.core import observe as obs_mod


def _battle_env(map_size=32):
    env = magent.GridWorld("battle", map_size=map_size)
    h0, h1 = env.get_handles()
    env.reset()
    pos0 = [[x, y] for x in range(4, 16, 2) for y in range(6, 26, 3)]
    pos1 = [[x, y] for x in range(18, 28, 2) for y in range(7, 27, 3)]
    env.add_agents(h0, method="custom", pos=pos0)
    env.add_agents(h1, method="custom", pos=pos1)
    env.add_walls(method="custom", pos=[[16, y] for y in range(10, 16)])
    return env, (h0, h1)


def _step_random(env, handles, steps=4, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        for h in handles:
            n = env.get_num(h)
            acts = rng.randint(0, env.get_action_space(h)[0], size=n).astype(np.int32)
            env.set_action(h, acts)
        env.step()
        env.clear_dead()


@pytest.mark.parametrize("group", [0, 1])
def test_fast_path_matches_rotating_path(group):
    env, handles = _battle_env()
    _step_random(env, handles)
    spec, state = env.spec, env.state

    fast = obs_mod.make_observe(spec, group, force_xla=True)
    legacy = obs_mod._make_observe_rotating(spec, group)

    v_fast, f_fast = jax.jit(fast)(state)
    v_leg, f_leg = jax.jit(legacy)(state)
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_leg), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_leg), atol=1e-6)


@pytest.mark.slow
def test_pallas_interpret_matches_xla_fallback():
    env, handles = _battle_env(24)
    _step_random(env, handles, steps=2)
    spec, state = env.spec, env.state

    xla = obs_mod.make_observe(spec, 0, force_xla=True)
    pallas = obs_mod.make_observe(spec, 0, interpret=True)

    v_x, f_x = xla(state)
    v_p, f_p = pallas(state)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), atol=1e-6)


def test_banded_obs_path_matches_xla(monkeypatch):
    """The full banded obs branch (banded-order kernel + in-banded-order
    minimap/self-mark/liveness epilogue + one flat unsort, observe.py
    use_banded) must equal the XLA path bit-for-bit.  Forced on a small
    battle map (minimap_mode on) by shrinking the VMEM budget."""
    env, handles = _battle_env(24)
    _step_random(env, handles, steps=2)
    spec, state = env.spec, env.state

    xla = obs_mod.make_observe(spec, 0, force_xla=True)
    monkeypatch.setattr(obs_mod, "VMEM_IMAGE_BUDGET", 1)
    banded = obs_mod.make_observe(spec, 0, interpret=True)
    assert banded.uses_banded

    v_x, f_x = xla(state)
    v_b, f_b = banded(state)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_x), atol=1e-6)


def test_batched_observe_matches_single():
    env, handles = _battle_env(24)
    _step_random(env, handles, steps=2)
    spec, state = env.spec, env.state

    fast = obs_mod.make_observe(spec, 0, force_xla=True)
    v1, f1 = fast(state)
    state_b = jax.tree.map(lambda a: np.stack([np.asarray(a)] * 3), state)
    vb, fb = fast(state_b)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(vb[b]), np.asarray(v1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(fb[b]), np.asarray(f1), atol=1e-6)


def test_banded_kernel_matches_xla():
    """window_gather_banded (huge-map path) == plain gather, interpret mode."""
    import jax
    import jax.numpy as jnp
    from magent_tpu.ops import window_gather as wg

    B, H, W, C, N = 2, 90, 90, 5, 37
    vh = vw = 7
    Hp, Wp, lanes, pad_y, pad_x = wg.padded_geometry(H, W, C, vh, vw)
    key = jax.random.PRNGKey(0)
    gfull = jax.random.uniform(key, (B, Hp, lanes), jnp.float32)
    xs = jax.random.randint(key, (B, N), 0, W)
    ys = jax.random.randint(jax.random.fold_in(key, 1), (B, N), 0, H)
    pos = (ys + pad_y) * Wp + (xs + pad_x)
    mask = jnp.ones((vh, vw * C), jnp.float32)

    ref = wg.window_gather_xla(gfull, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp)
    out = wg.window_gather_banded(gfull, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                                  chunk=8, band_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    out16 = wg.window_gather_banded(gfull, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                                    chunk=8, band_rows=16, interpret=True,
                                    out_dtype=jnp.bfloat16)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out16, np.float32), np.asarray(ref),
                               atol=0.01)


def test_bf16_obs_dtype():
    """obs_dtype=bfloat16 returns bf16 views equal to f32 up to rounding
    (window math stays f32; only the store casts — window_gather.py)."""
    import jax.numpy as jnp
    from magent_tpu.builtin.config import battle
    from magent_tpu.parallel import VecGridWorld

    v32 = VecGridWorld(battle.get_config(32), [20, 20], n_envs=2)
    v16 = VecGridWorld(battle.get_config(32), [20, 20], n_envs=2,
                       obs_dtype=jnp.bfloat16)
    state = jax.jit(v32.reset)(jax.random.PRNGKey(0))
    for g in range(2):
        view32, feat32 = v32.observe(state, g)
        view16, feat16 = v16.observe(state, g)
        assert view16.dtype == jnp.bfloat16
        assert feat16.dtype == jnp.float32  # features stay f32
        np.testing.assert_allclose(
            np.asarray(view16, np.float32), np.asarray(view32), atol=0.01)
        np.testing.assert_allclose(np.asarray(feat16), np.asarray(feat32),
                                   atol=1e-6)


def test_smem_split_paths_match(monkeypatch):
    """Shrinking the SMEM budgets must route through the env/agent sub-batch
    splits without changing results (window_gather.py; exercised in
    interpret mode with unique shapes to avoid stale jit caches)."""
    import jax
    import jax.numpy as jnp
    from magent_tpu.ops import window_gather as wg

    B, H, W, C, N = 3, 23, 29, 3, 11
    vh, vw = 5, 5
    Hp, Wp, lanes, pad_y, pad_x = wg.padded_geometry(H, W, C, vh, vw)
    key = jax.random.PRNGKey(7)
    gfull = jax.random.uniform(key, (B, Hp, lanes), jnp.float32)
    xs = jax.random.randint(key, (B, N), 0, W)
    ys = jax.random.randint(jax.random.fold_in(key, 1), (B, N), 0, H)
    pos = ((ys + pad_y) * Wp + (xs + pad_x)) * 1024
    mask = jnp.ones((vh, vw * C), jnp.float32)

    ref = wg.window_gather_xla(gfull, pos // 1024, mask,
                               vh=vh, vw=vw, C=C, Wp=Wp)

    def run(chunk):
        return wg.window_gather(gfull, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                                chunk=chunk, interpret=True)

    # whole-call baseline, env split (B>1), then agent split (B==1)
    base = run(4)
    monkeypatch.setattr(wg, "SMEM_BUDGET", 20)  # forces n_sub=1 env batches
    split_env = run(5)
    one_ref = wg.window_gather_xla(gfull[:1], pos[:1] // 1024, mask,
                                   vh=vh, vw=vw, C=C, Wp=Wp)
    split_agents = wg.window_gather(gfull[:1], pos[:1], mask, vh=vh, vw=vw,
                                    C=C, Wp=Wp, chunk=3, interpret=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(split_env), np.asarray(ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(split_agents), np.asarray(one_ref),
                               atol=1e-6)

    # the replica kernel's 3-operand split
    monkeypatch.setattr(wg, "SMEM_BUDGET_G4", 16)
    g4 = wg.window_gather4(gfull, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                           chunk=6, interpret=True)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(ref), atol=1e-6)


def test_smem_split_gather4_single_env(monkeypatch):
    """A single huge env past the gather4 SMEM budget must split over AGENT
    sub-ranges (window_gather4's B==1 fallback) instead of launching a
    kernel with oversized scalar-prefetch operands."""
    import jax
    import jax.numpy as jnp
    from magent_tpu.ops import window_gather as wg

    B, H, W, C, N = 1, 23, 29, 3, 13
    vh, vw = 5, 5
    Hp, Wp, lanes, pad_y, pad_x = wg.padded_geometry(H, W, C, vh, vw)
    key = jax.random.PRNGKey(11)
    gfull = jax.random.uniform(key, (B, Hp, lanes), jnp.float32)
    xs = jax.random.randint(key, (B, N), 0, W)
    ys = jax.random.randint(jax.random.fold_in(key, 1), (B, N), 0, H)
    pos = ((ys + pad_y) * Wp + (xs + pad_x)) * 1024
    mask = jnp.ones((vh, vw * C), jnp.float32)

    ref = wg.window_gather_xla(gfull, pos // 1024, mask,
                               vh=vh, vw=vw, C=C, Wp=Wp)
    monkeypatch.setattr(wg, "SMEM_BUDGET_G4", 8)  # << n_pad: forces splits
    g4 = wg.window_gather4(gfull, pos, mask, vh=vh, vw=vw, C=C, Wp=Wp,
                           chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(ref), atol=1e-6)


# ---------------------------------------------------------------- turn mode
def _turn_env(map_size=20, minimap=False):
    """turn_mode config with 2x1 bodies (rotating footprints), walls and an
    attack rule — every rotation-path feature in one env."""
    gw = magent.gridworld
    cfg = gw.Config()
    cfg.set({"map_width": map_size, "map_height": map_size,
             "turn_mode": True, "embedding_size": 4,
             "minimap_mode": minimap})
    big = cfg.register_agent_type(
        "big", {'width': 1, 'length': 2, 'hp': 6, 'speed': 1,
                'view_range': gw.CircleRange(3),
                'attack_range': gw.CircleRange(2), 'damage': 1})
    small = cfg.register_agent_type(
        "small", {'width': 1, 'length': 1, 'hp': 4, 'speed': 1,
                  'view_range': gw.CircleRange(2),
                  'attack_range': gw.CircleRange(1), 'damage': 1})
    g0 = cfg.add_group(big)
    g1 = cfg.add_group(small)
    a, b = gw.AgentSymbol(g0, 'any'), gw.AgentSymbol(g1, 'any')
    cfg.add_reward_rule(gw.Event(a, 'attack', b), receiver=a, value=0.3)
    env = magent.GridWorld(cfg)
    h0, h1 = env.get_handles()
    env.reset()
    env.add_walls(method="custom", pos=[[10, y] for y in range(8, 14)])
    env.add_agents(h0, method="custom",
                   pos=[[4 + 3 * i, 5 + 3 * j, (i + j) % 4]
                        for i in range(3) for j in range(3)])
    env.add_agents(h1, method="custom",
                   pos=[[13 + 2 * i, 6 + 3 * j, (i + 3 * j) % 4]
                        for i in range(3) for j in range(3)])
    return env, (h0, h1)


# group 0 exercises the big-body channel permutation with minimap channels;
# group 1 the small-body one without — the cross combos add only interpret
# time, not coverage.  The second combo is nightly-tier (interpret compile
# dominates its minute of wall time).
@pytest.mark.parametrize("group,minimap", [
    (0, True),
    pytest.param(1, False, marks=pytest.mark.slow),
])
def test_rotating_kernel_matches_rotating_xla(group, minimap):
    """The stacked-rotations kernel path (turn_mode observations through the
    Pallas window kernel) must match the legacy per-direction XLA gather —
    all four directions, rotating 2x1 footprints, walls, hp, minimap."""
    env, handles = _turn_env(minimap=minimap)
    _step_random(env, handles, steps=3)
    spec, state = env.spec, env.state

    dirs = np.asarray(state.dir)[np.asarray(state.active)]
    assert set(np.unique(dirs)) == {0, 1, 2, 3}, "need all four directions"

    legacy = obs_mod._make_observe_rotating_xla(spec, group)
    geom_S = max(spec.height, spec.width)
    from magent_tpu.ops import window_gather as wg
    t = spec.groups[group].type
    geom = wg.padded_geometry(geom_S, geom_S, spec.n_channel,
                              t.view_range.height, t.view_range.width)
    kernel = obs_mod._make_observe_rotating_kernel(
        spec, group, geom, interpret=True)

    v_leg, f_leg = jax.jit(legacy)(state)
    v_ker, f_ker = kernel(state)
    np.testing.assert_allclose(np.asarray(v_ker), np.asarray(v_leg),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_ker), np.asarray(f_leg),
                               atol=1e-6)


def test_rotating_kernel_banded_matches_xla():
    """Big turn-mode maps route the stacked-rotations image through the
    banded window kernel; force that variant on a small env."""
    env, handles = _turn_env(minimap=False)
    _step_random(env, handles, steps=2)
    spec, state = env.spec, env.state

    from magent_tpu.ops import window_gather as wg
    t = spec.groups[0].type
    S = max(spec.height, spec.width)
    geom = wg.padded_geometry(S, S, spec.n_channel,
                              t.view_range.height, t.view_range.width)
    legacy = obs_mod._make_observe_rotating_xla(spec, 0)
    kernel = obs_mod._make_observe_rotating_kernel(
        spec, 0, geom, interpret=True, banded=True)

    v_leg, f_leg = jax.jit(legacy)(state)
    v_ker, f_ker = kernel(state)
    np.testing.assert_allclose(np.asarray(v_ker), np.asarray(v_leg),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_ker), np.asarray(f_leg),
                               atol=1e-6)
