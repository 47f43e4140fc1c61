"""Parity: batch-last engine (sim/batched.py) vs the vmap engine.

Same formulas, different layouts — results must agree to f32 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu.envs.physics import asset_path
from mbd_tpu.sim import batched as BT
from mbd_tpu.sim import pipeline as P
from mbd_tpu.sim.system import load_mjcf

# humanoid scenes excluded here purely for test-suite compile time; their
# parity is covered by the planner-level check in test_fused_planner.py
SCENES = ["cartpole", "hopper", "pushT"]


def _rand_batch(sys, B=4, seed=0):
    rng = np.random.default_rng(seed)
    qs = np.tile(np.asarray(sys.init_q)[:, None], (1, B)) \
        + rng.normal(size=(sys.nq, B)) * 0.05
    for j in range(sys.njnt):
        if sys.jnt_type[j] == 0:
            a = sys.jnt_qposadr[j]
            qs[a + 3:a + 7] /= np.linalg.norm(qs[a + 3:a + 7], axis=0)
    qds = rng.normal(size=(sys.nv, B)) * 0.3
    ctrl = rng.normal(size=(sys.nu, B)) * 0.5
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return f32(qs), f32(qds), f32(ctrl)


@pytest.mark.parametrize("scene", SCENES)
def test_substep_parity(scene):
    sys = load_mjcf(asset_path(f"{scene}.xml"))
    qs, qds, ctrl = _rand_batch(sys)

    def step1(q, qd, u):
        st = P.make_state(sys, q, qd)
        st2 = P.pipeline_step(sys, st, u, 1)
        return st2.q, st2.qd

    qv, qdv = jax.jit(jax.vmap(step1, in_axes=(1, 1, 1), out_axes=1))(
        qs, qds, ctrl)
    qb, qdb = jax.jit(lambda a, b, c: BT.env_step_b(sys, a, b, c, 1))(
        qs, qds, ctrl)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(qb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdv), np.asarray(qdb), atol=1e-3)


def test_link_out_matches_pipeline_state():
    sys = load_mjcf(asset_path("hopper.xml"))
    qs, qds, _ = _rand_batch(sys)
    out = BT.link_out_b(sys, qs, qds)
    st = jax.vmap(lambda q, qd: P.make_state(sys, q, qd),
                  in_axes=(1, 1))(qs, qds)
    for b in range(1, sys.nbody):
        np.testing.assert_allclose(
            np.asarray(out.xpos[b]).T, np.asarray(st.x.pos[:, b - 1]),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.vel[b]).T, np.asarray(st.xd.vel[:, b - 1]),
            atol=1e-4)


def test_fused_rollout_matches_vmap_rollout():
    import functools

    from mbd_tpu import envs
    from mbd_tpu.rollout import rollout_us
    from mbd_tpu.rollout.fused import rollout_rewards

    env = envs.get_env("hopper")
    state0 = env.reset(jax.random.PRNGKey(0))
    Y0s = jax.random.uniform(jax.random.PRNGKey(1), (8, 10, 3),
                             minval=-1, maxval=1)
    rews_v, _ = jax.jit(jax.vmap(
        functools.partial(rollout_us, env.step), in_axes=(None, 0)))(
            state0, Y0s)
    rews_f, ps, diverged = jax.jit(
        lambda s, y: rollout_rewards(env, s, y))(state0, Y0s)
    assert float(diverged.sum()) == 0.0
    np.testing.assert_allclose(np.asarray(rews_v), np.asarray(rews_f),
                               atol=2e-3)


def test_topo_cache_keys_on_structure_not_identity():
    """Two different topologies must get different caches even if Python
    object ids collide (round-1 verdict: id()-keyed cache risked stale hits);
    identical topologies share one cache entry."""
    s_hop = load_mjcf(asset_path("hopper.xml"))
    s_cart = load_mjcf(asset_path("cartpole.xml"))
    t_hop = BT.topo(s_hop)
    t_cart = BT.topo(s_cart)
    assert t_hop is not t_cart
    assert len(t_hop.dof_body) != len(t_cart.dof_body)
    # reloading the same scene hits the same cache entry (structural key)
    assert BT.topo(load_mjcf(asset_path("hopper.xml"))) is t_hop


@pytest.mark.parametrize("scene", ["walker2d", "hopper"])
def test_static_rows_sweep_matches_dynamic(scene):
    """The two PGS row-sweep forms (static_rows=True — the statically
    unrolled Mosaic-compatible form the Pallas kernel traces; False — the
    dynamic-index fori_loop form the XLA engines use) must produce
    bit-identical trajectories: same stacked data, same row order, same
    projection (sim/batched.py::contact_qfrc_b). Contact-rich scenes so
    both contacts AND joint-limit rows enter the sweep."""
    sys = load_mjcf(asset_path(f"{scene}.xml"))
    qs, qds, ctrl = _rand_batch(sys, seed=3)
    # drop the root so feet/torso actually touch the floor within a few
    # substeps (contact rows active, not just limits)
    qs = qs.at[1].add(-0.3) if scene == "hopper" else qs.at[1].add(-0.4)
    qd_dyn, qs_dyn = None, None
    for static in (False, True):
        q, qd = jax.jit(lambda a, b, c: BT.env_step_b(
            sys, a, b, c, 5, static_rows=static),
            static_argnums=())(qs, qds, ctrl)
        if qd_dyn is None:
            qs_dyn, qd_dyn = q, qd
        else:
            np.testing.assert_allclose(np.asarray(qs_dyn), np.asarray(q),
                                       atol=1e-6, rtol=1e-6)
            np.testing.assert_allclose(np.asarray(qd_dyn), np.asarray(qd),
                                       atol=1e-5, rtol=1e-5)


def test_stacked_component_helpers_bitmatch_per_item():
    """The axis-1 stacked helpers (cross_c/dot3_c/qmul_c/qrot_c/
    quat_to_cols_c) power the body-stacked spatial-inertia build and the
    stacked PGS pre-compute; they must be BIT-identical to mapping the
    per-item [k, *B] helpers over the leading axis (same formulas, same
    accumulation order — sim/batched.py docstring contract)."""
    rng = np.random.default_rng(7)
    C, B = 5, (3, 4)
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    a3 = f32(rng.normal(size=(C, 3) + B))
    b3 = f32(rng.normal(size=(C, 3) + B))
    q4 = f32(rng.normal(size=(C, 4) + B))
    p4 = f32(rng.normal(size=(C, 4) + B))

    def per_item(fn, *ops):
        return jnp.stack([fn(*(o[c] for o in ops)) for c in range(C)])

    pairs = [
        (BT.cross_c(a3, b3), per_item(BT.cross, a3, b3)),
        (BT.dot3_c(a3, b3), per_item(BT.dot3, a3, b3)),
        (BT.qmul_c(q4, p4), per_item(BT.qmul, q4, p4)),
        (BT.qrot_c(q4, a3), per_item(BT.qrot, q4, a3)),
    ]
    cs = BT.quat_to_cols_c(q4)
    ref = [per_item(lambda q: BT.quat_to_cols(q)[k], q4) for k in range(3)]
    pairs += list(zip(cs, ref))
    for got, want in pairs:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_spatial_inertia_all_symmetric_and_consistent():
    """I is symmetric per body; the [3:,3:] block is m·1₃ and the [3:,:3]
    block is (m c×)ᵀ — structural invariants of the stacked build."""
    sys = load_mjcf(asset_path("hopper.xml"))
    qs, qds, _ = _rand_batch(sys, B=3, seed=11)
    kin = BT.fk_b(sys, qs)
    I_all = BT.spatial_inertia_all(sys, kin)
    assert I_all[0] is None and len(I_all) == sys.nbody
    masses = np.asarray(sys.body_mass)
    for b in range(1, sys.nbody):
        I = np.asarray([[np.asarray(I_all[b][r][c]) for c in range(6)]
                        for r in range(6)])          # [6, 6, B]
        np.testing.assert_allclose(I, np.swapaxes(I, 0, 1),
                                   atol=1e-5, rtol=1e-5)
        m = masses[b]
        np.testing.assert_allclose(
            I[3:, 3:], m * np.eye(3)[..., None] * np.ones_like(I[3:, 3:]),
            atol=1e-6)
