"""Device-resident training loop over gaussian parameters.

The reference has no training path at all (forward render server only;
SURVEY.md §7); this implements the north-star configs 3-4: pixel loss ->
grads -> optimizer step, with parameters, optimizer state, and the whole
step living on device. Per-parameter learning rates follow the standard
3DGS schedule (means get an exponential decay, each family its own Adam).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render.pipeline import render_image
from gaussian_splat_ipu_tpu.train import losses
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hashable (static under jit) optimisation hyper-parameters."""

    lr_means: float = 1.6e-4
    lr_means_final: float = 1.6e-6
    lr_means_decay_steps: int = 30_000
    lr_log_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacities: float = 5e-2
    lr_sh: float = 2.5e-3
    # Higher-order SH bands step at lr_sh * this (standard 3DGS trains
    # f_rest at 1/20 of the f_dc rate).
    sh_rest_lr_scale: float = 1.0 / 20.0
    ssim_weight: float = 0.2
    # Scene extent multiplies the means learning rate (3DGS convention:
    # position steps scale with scene size).
    scene_extent: float = 1.0
    adam_eps: float = 1e-15


class TrainState(NamedTuple):
    params: GaussianModel
    opt_state: optax.OptState
    step: jnp.ndarray  # () i32


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    means_lr = optax.exponential_decay(
        init_value=cfg.lr_means * cfg.scene_extent,
        transition_steps=cfg.lr_means_decay_steps,
        # Guarded ratio: lr_means == 0 (a frozen scene, e.g. pose-only
        # refinement) must not divide by zero — any decay_rate works
        # since the init value is already 0.
        decay_rate=(cfg.lr_means_final / cfg.lr_means
                    if cfg.lr_means > 0 else 1.0),
        end_value=cfg.lr_means_final * cfg.scene_extent)

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=cfg.adam_eps)

    def scale_sh_rest(s: float) -> optax.GradientTransformation:
        """Post-Adam, scale the update of SH bands >= 1 by s (the f_rest
        vs f_dc rate split): update shape is (N, K, 3), band axis 1."""
        def scale_leaf(u):
            k = u.shape[1]
            row = jnp.concatenate([jnp.ones((1,), u.dtype),
                                   jnp.full((k - 1,), s, u.dtype)])
            return u * row[None, :, None]

        def update(updates, state, params=None):
            del params
            # multi_transform hands the full (masked) pytree; map over the
            # real leaves (each an (N, K, 3) sh array).
            return jax.tree.map(scale_leaf, updates), state
        return optax.GradientTransformation(
            lambda params: optax.EmptyState(), update)

    labels = GaussianModel(means="means", log_scales="log_scales",
                           quats="quats", opacities="opacities", sh="sh")
    return optax.multi_transform(
        {
            "means": adam(means_lr),
            "log_scales": adam(cfg.lr_log_scales),
            "quats": adam(cfg.lr_quats),
            "opacities": adam(cfg.lr_opacities),
            "sh": optax.chain(adam(cfg.lr_sh),
                              scale_sh_rest(cfg.sh_rest_lr_scale)),
        },
        labels,
    )


def init_state(model: GaussianModel,
               cfg: TrainConfig = TrainConfig()) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(params=model, opt_state=tx.init(model),
                      step=jnp.zeros((), jnp.int32))


def loss_fn(params: GaussianModel, camera: Camera, target: jnp.ndarray,
            raster_cfg: RasterConfig, train_cfg: TrainConfig,
            use_pallas: bool = True) -> jnp.ndarray:
    image = render_image(params, camera, raster_cfg, use_pallas)
    return losses.render_loss(image, target, train_cfg.ssim_weight)


def apply_param_updates(tx: optax.GradientTransformation,
                        params: GaussianModel, grads: GaussianModel,
                        opt_state: optax.OptState):
    """Optimizer update + quaternion renormalisation, shared by every
    train-step variant (single-device, view-batch, sharded, densify).

    Renormalising quats after the step: standard 3DGS keeps raw quats and
    normalises in covariance_3d; doing both keeps them well-scaled.
    """
    updates, opt_state = tx.update(grads, opt_state, params)
    p = optax.apply_updates(params, updates)
    p = GaussianModel(
        means=p.means, log_scales=p.log_scales,
        quats=p.quats / jnp.maximum(
            jnp.linalg.norm(p.quats, axis=-1, keepdims=True), 1e-8),
        opacities=p.opacities, sh=p.sh)
    return p, opt_state


def train_step(state: TrainState, camera: Camera, target: jnp.ndarray,
               raster_cfg: RasterConfig, train_cfg: TrainConfig,
               use_pallas: bool = True
               ) -> Tuple[TrainState, jnp.ndarray]:
    """One forward+backward+update step. Jit with static cfgs:

        step = jax.jit(train_step, static_argnums=(3, 4, 5),
                       donate_argnums=(0,))
    """
    tx = make_optimizer(train_cfg)
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, camera, target, raster_cfg, train_cfg, use_pallas)
    params, opt_state = apply_param_updates(tx, state.params, grads,
                                            state.opt_state)
    return TrainState(params=params, opt_state=opt_state,
                      step=state.step + 1), loss


def fit(model: GaussianModel, cameras, targets, raster_cfg: RasterConfig,
        train_cfg: TrainConfig = TrainConfig(), num_steps: int = 100,
        use_pallas: bool = True,
        log_every: Optional[int] = None):
    """Simple single-device fit loop over a list of (camera, target) views.

    Returns (trained model, list of losses). Compiles once; all steps reuse
    the same executable (camera/target are traced args).
    """
    state = init_state(model, train_cfg)
    step = jax.jit(train_step, static_argnums=(3, 4, 5))
    history = []
    n_views = len(cameras)
    for i in range(num_steps):
        cam = cameras[i % n_views]
        tgt = targets[i % n_views]
        state, loss = step(state, cam, tgt, raster_cfg, train_cfg,
                           use_pallas)
        if log_every and (i % log_every == 0):
            history.append(float(loss))
        elif not log_every:
            history.append(float(loss))
    return state.params, history
