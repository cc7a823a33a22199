"""The StylEx model bundle: encoder + mapping + generator + discriminator.

Functional equivalent of the reference's ``StylEx`` container
(`/root/reference/stylex/stylex_train.py:912-999` and the conditional
variant `stylex_train_new.py:923-1010`). Modules are built once from a
:class:`~stylex_tpu.config.ModelConfig`; parameters live in a plain pytree
``{'encoder', 'S', 'G', 'D', 'SE', 'GE'}`` (EMA copies included, exactly the
state the reference checkpoints — SURVEY §5.4).

Both architecture variants are covered by :func:`make_w` / :func:`prior_w`:

* OLD — w = [E(x); classifier logits], mapping width = latent_dim
  (`stylex_train.py:1312`),
* NEW — w = [E(x); softmax(logits)] and for prior samples
  [S(z); probabilities] with mapping width latent_dim - num_classes
  (`stylex_train_new.py:332-333,1333,1342`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stylex_tpu.config import Arch, ModelConfig
from stylex_tpu.models.debug_encoders import encoder_registry
from stylex_tpu.models.discriminator import DiscriminatorE
from stylex_tpu.models.generator import Generator
from stylex_tpu.models.mapping import StyleVectorizer

__all__ = ["StylExModules", "build_stylex", "init_stylex_params", "make_w", "prior_w", "ema_update"]

Params = Dict[str, Any]


@dataclass(frozen=True)
class StylExModules:
    cfg: ModelConfig
    encoder: nn.Module
    S: StyleVectorizer
    G: Generator
    D: DiscriminatorE

    @property
    def num_layers(self) -> int:
        return self.G.num_layers

    @property
    def total_style_coords(self) -> int:
        return self.G.total_style_coords

    # --- thin apply wrappers -------------------------------------------------
    def encode(self, params, images):
        variables = {"params": params["encoder"]}
        if "E_vq" in params:  # encoder quantize layers (fq_layers configs)
            variables["vq"] = params["E_vq"]
        return self.encoder.apply(variables, images)

    def map_z(self, params, z, ema: bool = False):
        return self.S.apply({"params": params["SE" if ema else "S"]}, z)

    def generate(self, params, w_styles, noise, style_delta=None, ema: bool = False,
                 start_block: int = 0, initial_state=None, capture_states: bool = False):
        return self.G.apply(
            {"params": params["GE" if ema else "G"]}, w_styles, noise, style_delta,
            start_block, initial_state, capture_states
        )

    def discriminate(self, params, images, probabilities=None):
        variables = {"params": params["D"]}
        if "D_vq" in params:
            variables["vq"] = params["D_vq"]
        if self.cfg.arch == Arch.NEW:
            return self.D.apply(variables, images, probabilities)
        return self.D.apply(variables, images)


def build_stylex(cfg: ModelConfig) -> StylExModules:
    if cfg.encoder_class is None:
        # the reference's encoder shares D's trunk config INCLUDING the
        # feature-quantize layers (`stylex_train.py:923-925`)
        encoder = DiscriminatorE(
            image_size=cfg.image_size,
            network_capacity=cfg.network_capacity,
            attn_layers=tuple(cfg.attn_layers),
            transparent=cfg.transparent,
            mode="encoder",
            encoder_dim=cfg.encoder_dim,
            fmap_max=cfg.fmap_max,
            fq_layers=tuple(cfg.fq_layers),
            fq_dict_size=cfg.fq_dict_size,
        )
    else:
        encoder = encoder_registry[cfg.encoder_class]()

    S = StyleVectorizer(cfg.mapping_dim, cfg.style_depth, lr_mul=cfg.lr_mlp)
    G = Generator(
        image_size=cfg.image_size,
        latent_dim=cfg.latent_dim,
        network_capacity=cfg.network_capacity,
        transparent=cfg.transparent,
        attn_layers=tuple(cfg.attn_layers),
        no_const=cfg.no_const,
        fmap_max=cfg.fmap_max,
        remat=cfg.remat,
    )
    D = DiscriminatorE(
        image_size=cfg.image_size,
        network_capacity=cfg.network_capacity,
        attn_layers=tuple(cfg.attn_layers),
        transparent=cfg.transparent,
        mode="cond_disc" if cfg.arch == Arch.NEW else "disc",
        num_classes=cfg.num_classes,
        fmap_max=cfg.fmap_max,
        fq_layers=tuple(cfg.fq_layers),
        fq_dict_size=cfg.fq_dict_size,
    )
    return StylExModules(cfg=cfg, encoder=encoder, S=S, G=G, D=D)


def init_stylex_params(
    key: jax.Array, modules: StylExModules, dtype=None
) -> Params:
    """Initialise all parameter trees; EMA copies start equal to the live
    nets (``reset_parameter_averaging``, `stylex_train.py:994-996`).

    Runs as ONE jitted program on the host CPU and transfers the finished
    tree once (``utils.device.init_on_host``): eager per-op init through
    the TPU relay costs minutes of remote compiles. ``dtype`` optionally
    casts float32 leaves inside the same program.
    """
    from stylex_tpu.utils.device import init_on_host

    return init_on_host(
        lambda k: build_stylex_params(k, modules), key, dtype=dtype
    )


def build_stylex_params(key: jax.Array, modules: StylExModules) -> Params:
    """Pure (traceable) builder behind :func:`init_stylex_params`; callers
    composing larger single-program inits (optimizer slots etc.) trace this
    directly."""
    cfg = modules.cfg
    k_e, k_s, k_g, k_d = jax.random.split(key, 4)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 4 if cfg.transparent else 3))
    z = jnp.zeros((1, cfg.mapping_dim))
    w = jnp.zeros((1, modules.num_layers, cfg.latent_dim))
    noise = jnp.zeros((1, cfg.image_size, cfg.image_size, 1))

    enc_vars = modules.encoder.init(k_e, img)
    s_params = modules.S.init(k_s, z)["params"]
    g_params = modules.G.init(k_g, w, noise)["params"]
    if cfg.arch == Arch.NEW:
        d_vars = modules.D.init(k_d, img, jnp.zeros((1, cfg.num_classes)))
    else:
        d_vars = modules.D.init(k_d, img)

    out = {
        "encoder": enc_vars["params"],
        "S": s_params,
        "G": g_params,
        "D": d_vars["params"],
        "SE": jax.tree.map(jnp.copy, s_params),
        "GE": jax.tree.map(jnp.copy, g_params),
    }
    if "vq" in d_vars:
        out["D_vq"] = d_vars["vq"]
    if "vq" in enc_vars:
        out["E_vq"] = enc_vars["vq"]
    return out


def make_w(cfg: ModelConfig, encoder_output: jax.Array, classifier_logits: jax.Array) -> jax.Array:
    """Encoder-path w: concat the encoding with the conditioning vector."""
    if cfg.arch == Arch.NEW:
        cond = jax.nn.softmax(classifier_logits, axis=-1)
    else:
        cond = classifier_logits
    return jnp.concatenate([encoder_output, cond], axis=-1)


def prior_w(cfg: ModelConfig, s_out: jax.Array, probabilities: Optional[jax.Array]) -> jax.Array:
    """Prior-path w: OLD maps the full latent through S; NEW appends
    probabilities after S (`latent_to_w`, `stylex_train_new.py:331-333`)."""
    if cfg.arch == Arch.NEW:
        return jnp.concatenate([s_out, probabilities], axis=-1)
    return s_out


def ema_update(ema_params: Params, new_params: Params, beta: float = 0.995) -> Params:
    """``old * beta + (1 - beta) * new`` (`EMA.update_average`,
    `stylex_train.py:74-80,985-992`)."""
    return jax.tree.map(lambda o, n: o * beta + (1.0 - beta) * n, ema_params, new_params)
