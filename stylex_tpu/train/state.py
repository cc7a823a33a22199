"""Training state: parameters, optimizers, EMA, and regulariser statistics.

One pytree carries everything the reference's ``StylEx`` module +
``Trainer`` attributes held mutably (optimizer slots, EMA copies, the
path-length running mean — `/root/reference/stylex/stylex_train.py:912-999,
1121,1467-1479`), so a train step is ``state -> state``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stylex_tpu.config import Arch, ModelConfig, TrainConfig

__all__ = ["StylExTrainState", "create_train_state", "make_optimizers"]

Params = Dict[str, Any]


class StylExTrainState(struct.PyTreeNode):
    step: jax.Array  # int32 scalar
    params: Params  # {'encoder','S','G','D'}
    ema_params: Params  # {'SE','GE'}
    g_opt_state: Any
    d_opt_state: Any
    # path-length running mean; < 0 means "not yet initialised"
    # (`Trainer.pl_mean = None`, `stylex_train.py:1121`).
    pl_mean: jax.Array

    def full_params(self) -> Params:
        """Merge live + EMA trees into the checkpoint layout."""
        return {**self.params, **self.ema_params}


def make_optimizers(model_cfg: ModelConfig, train_cfg: TrainConfig):
    """Adam(0.5, 0.9); D uses TTUR ``lr * ttur_mult``
    (`stylex_train.py:956-959`). The NEW arch trains the encoder in its own
    LR group (1e-5, `stylex_train_new.py:967-969`)."""
    lr = train_cfg.lr
    adam = lambda l: optax.adam(l, b1=0.5, b2=0.9, eps=1e-8)
    if model_cfg.arch == Arch.NEW:
        enc_lr = train_cfg.encoder_lr if train_cfg.encoder_lr is not None else 1e-5
        top_labels = {"G": "gen", "S": "gen", "encoder": "enc"}
        labels_fn = lambda params: {
            k: jax.tree.map(lambda _: top_labels[k], v) for k, v in params.items()
        }
        g_tx = optax.multi_transform({"gen": adam(lr), "enc": adam(enc_lr)}, labels_fn)
    else:
        g_tx = adam(lr)
    d_tx = adam(lr * train_cfg.ttur_mult)
    return g_tx, d_tx


def create_train_state(
    key: jax.Array, modules, model_cfg: ModelConfig, train_cfg: TrainConfig
) -> Tuple[StylExTrainState, Any, Any]:
    """Initialise params + optimizer slots; returns (state, g_tx, d_tx).

    The whole state (params + optimizer slots) is built as one host-side
    jitted program and transferred once — eager init through the TPU relay
    costs a remote compile per distinct op shape (utils/device.py).
    """
    from stylex_tpu.models.stylex import build_stylex_params
    from stylex_tpu.utils.device import init_on_host

    g_tx, d_tx = make_optimizers(model_cfg, train_cfg)

    def build(k):
        all_params = build_stylex_params(k, modules)
        keys = ["encoder", "S", "G", "D"] + [
            k2 for k2 in ("D_vq", "E_vq") if k2 in all_params
        ]
        params = {k2: all_params[k2] for k2 in keys}
        ema_params = {k2: all_params[k2] for k2 in ("SE", "GE")}
        g_opt_state = g_tx.init({k2: params[k2] for k2 in ("encoder", "S", "G")})
        d_opt_state = d_tx.init(params["D"])
        return StylExTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=ema_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            pl_mean=jnp.asarray(-1.0, jnp.float32),
        )

    return init_on_host(build, key), g_tx, d_tx
