"""Density control on the sharded trainer (parallel/distributed.py ::
make_sharded_densify_train_step): stats and updates must match the
single-device densify step, and slot-buffer surgery must run on sharded
state. Virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.parallel import distributed, mesh as meshlib
from gaussian_splat_ipu_tpu.train import densify, trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig

import pytest

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow

CFG = RasterConfig(image_width=64, image_height=256,
                   pair_capacity=1 << 12, max_chunks_per_tile=4)
TC = trainer.TrainConfig(ssim_weight=0.0)


def _setup(capacity=64, n_alive=48):
    model = GaussianModel.random(jax.random.PRNGKey(0), n_alive)
    padded = densify.pad_model(model, capacity)
    dstate = densify.init_state(n_alive, capacity, jax.random.PRNGKey(1))
    state = trainer.init_state(padded, TC)
    cam = Camera.orbit(np.array([-1.0, -1.0, -1.0], np.float32),
                       np.array([1.0, 1.0, 1.0], np.float32),
                       fov_radians=np.radians(45.0), aspect=0.25)
    target = jnp.zeros((256, 64, 4), jnp.float32)
    return state, dstate, cam, target


def test_sharded_densify_step_matches_single_device():
    state_s, dstate_s, cam, target = _setup()
    state_1, dstate_1, _, _ = _setup()

    mesh = meshlib.make_mesh(8)
    state_s = trainer.TrainState(
        params=meshlib.shard_model(state_s.params, mesh),
        opt_state=state_s.opt_state, step=state_s.step)

    step_s = distributed.make_sharded_densify_train_step(
        mesh, CFG, TC, use_pallas=False, pair_capacity=1 << 12)
    step_1 = densify.make_train_step(CFG, TC, use_pallas=False)

    state_s, dstate_s, loss_s = step_s(state_s, dstate_s, cam, target)
    state_1, dstate_1, loss_1 = step_1(state_1, dstate_1, cam, target)

    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(dstate_s.vis_count),
                                  np.asarray(dstate_1.vis_count))
    np.testing.assert_allclose(np.asarray(dstate_s.grad_sum),
                               np.asarray(dstate_1.grad_sum),
                               rtol=1e-4, atol=1e-7)
    for name in ("means", "log_scales", "quats", "opacities", "sh"):
        np.testing.assert_allclose(
            np.asarray(getattr(state_s.params, name)),
            np.asarray(getattr(state_1.params, name)),
            rtol=1e-4, atol=1e-6, err_msg=name)


def test_densify_event_on_sharded_state():
    state, dstate, cam, target = _setup()
    mesh = meshlib.make_mesh(8)
    state = trainer.TrainState(
        params=meshlib.shard_model(state.params, mesh),
        opt_state=state.opt_state, step=state.step)

    step = distributed.make_sharded_densify_train_step(
        mesh, CFG, TC, use_pallas=False, pair_capacity=1 << 12)
    for _ in range(3):
        state, dstate, loss = step(state, dstate, cam, target)
    assert np.isfinite(float(loss))

    cfg = densify.DensifyConfig(grad_threshold=1e-7)  # force events
    new_state, new_dstate = densify.densify_and_prune(state, dstate, cfg)
    alive = int(jnp.sum(new_dstate.alive))
    assert alive >= 1
    # Surgery must not break the sharded step: run one more.
    state2, dstate2, loss2 = step(new_state, new_dstate, cam, target)
    assert np.isfinite(float(loss2))
    assert state2.params.num_gaussians == 64


def test_grow_capacity_sharded_matches_single_device_semantics():
    # Growth on sharded state: per-shard padding keeps an even P(axis)
    # layout, the alive population is unchanged, and a subsequent sharded
    # densify step produces the same loss as before growth (dead slots
    # render as nothing).
    state, dstate, cam, target = _setup(capacity=64, n_alive=48)
    mesh = meshlib.make_mesh(8)
    state = trainer.TrainState(
        params=meshlib.shard_model(state.params, mesh),
        opt_state=state.opt_state, step=state.step)
    step = distributed.make_sharded_densify_train_step(mesh, CFG, TC,
                                                       use_pallas=False)
    _, _, loss_before = step(*_clone(state, dstate), cam, target)

    state2, dstate2 = distributed.grow_capacity_sharded(mesh, state,
                                                        dstate, 128)
    assert state2.params.num_gaussians == 128
    assert dstate2.alive.shape == (128,)
    assert int(jnp.sum(dstate2.alive)) == 48
    # Even layout: every device owns 16 rows of every grown leaf.
    shard_rows = {s.data.shape[0]
                  for s in state2.params.means.addressable_shards}
    assert shard_rows == {16}
    # New slots are dead AND invisible: same loss at the new capacity.
    step2 = distributed.make_sharded_densify_train_step(mesh, CFG, TC,
                                                        use_pallas=False)
    _, _, loss_after = step2(state2, dstate2, cam, target)
    np.testing.assert_allclose(float(loss_after), float(loss_before),
                               rtol=1e-6)
    # Growth by a non-multiple of the mesh is refused loudly.
    import pytest
    with pytest.raises(ValueError):
        distributed.grow_capacity_sharded(mesh, state, dstate, 130)


def _clone(state, dstate):
    # step donates its inputs; give it throwaway copies.
    c = jax.tree.map(lambda x: jnp.array(x), (state, dstate))
    return c[0], c[1]
