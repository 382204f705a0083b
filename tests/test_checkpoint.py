"""Checkpoint/resume + PLY export tests (aux subsystem, SURVEY.md §5:
the reference only checkpoints its executable; we checkpoint train state)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.train import checkpoint, trainer


def _model(seed=0, n=32, sh_degree=0):
    return GaussianModel.random(jax.random.PRNGKey(seed), n,
                                sh_degree=sh_degree)


class TestCheckpoint:
    def test_roundtrip_train_state(self, tmp_path):
        state = trainer.init_state(_model())
        state = state._replace(step=jnp.int32(17))
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save_checkpoint(path, state)

        template = trainer.init_state(_model(seed=1))  # same shapes
        restored = checkpoint.restore_checkpoint(path, template)
        assert int(restored.step) == 17
        np.testing.assert_array_equal(np.asarray(restored.params.means),
                                      np.asarray(state.params.means))
        # Optimizer state trees match leaf-for-leaf.
        for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                        jax.tree_util.tree_leaves(state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path):
        state = trainer.init_state(_model(n=32))
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save_checkpoint(path, state)
        template = trainer.init_state(_model(n=64))
        with pytest.raises(ValueError, match="shape"):
            checkpoint.restore_checkpoint(path, template)


class TestPlyExport:
    @pytest.mark.parametrize("degree", [0, 2])
    def test_roundtrip(self, tmp_path, degree):
        model = _model(n=40, sh_degree=degree)
        path = str(tmp_path / "scene.ply")
        checkpoint.export_ply(path, model)
        back = checkpoint.import_ply(path)
        assert back.sh_degree == degree
        for name in ("means", "log_scales", "quats", "opacities", "sh"):
            np.testing.assert_allclose(np.asarray(getattr(back, name)),
                                       np.asarray(getattr(model, name)),
                                       atol=1e-6, err_msg=name)

    def test_reference_field_parity(self, tmp_path):
        """Exported files carry exactly the field set the reference loader
        reads (src/splat/file_io.cpp:62-77)."""
        from gaussian_splat_ipu_tpu.io.ply import read_ply
        model = _model(n=8)
        path = str(tmp_path / "scene.ply")
        checkpoint.export_ply(path, model)
        ply = read_ply(path)
        names = {n for n, _ in ply["vertex"].properties}
        required = {"x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2", "opacity",
                    "scale_0", "scale_1", "scale_2", "rot_0", "rot_1",
                    "rot_2", "rot_3"}
        assert required <= names
