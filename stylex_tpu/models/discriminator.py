"""Discriminator / encoder — the shared D/E trunk.

Reference: ``DiscriminatorBlock`` / ``DiscriminatorE``
(`/root/reference/stylex/stylex_train.py:721-744,842-909`; conditional
projection variant `/root/reference/stylex/stylex_train_new.py:842-916`).
One flax module serves three heads:

* ``mode='disc'``      — unconditional critic, fc -> 1 (old architecture),
* ``mode='cond_disc'`` — projection critic, fc -> num_classes then a
  probability-weighted sum (new architecture, BigGAN-style projection),
* ``mode='encoder'``   — encoder E, fc -> encoder_dim (512), producing the
  first 512 dims of StylEx's w (`stylex_train.py:885-888,913`).

NHWC throughout; the blur+strided-conv downsample pair is kept adjacent so
XLA fuses the taps into the conv's input pipeline.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stylex_tpu.models.layers import AttnAndFF, ConvTorch, DenseTorch, leaky_relu

__all__ = ["DiscriminatorBlock", "DiscriminatorE", "discriminator_filters"]

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def discriminator_filters(image_size: int, network_capacity: int = 16, fmap_max: int = 512):
    """Channel plan: ``[3, cap*4, cap*8, ...]`` capped at ``fmap_max``
    (`DiscriminatorE.__init__`, `stylex_train.py:847-855`)."""
    num_layers = int(math.log2(image_size) - 1)
    filters = [(network_capacity * 4) * (2**i) for i in range(num_layers + 1)]
    return [3] + [min(f, fmap_max) for f in filters]


class DiscriminatorBlock(nn.Module):
    """Residual conv block with blur-antialiased downsampling
    (`DiscriminatorBlock`, `stylex_train.py:721-744`)."""

    filters: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x):
        res = ConvTorch(
            self.filters, 1, stride=2 if self.downsample else 1, name="conv_res"
        )(x)
        x = ConvTorch(self.filters, 3, padding=1, name="conv1")(x)
        x = leaky_relu(x)
        x = ConvTorch(self.filters, 3, padding=1, name="conv2")(x)
        x = leaky_relu(x)
        if self.downsample:
            # blur + strided conv composed into one stride-2 conv with the
            # 5x5 kernel (ops/downconv.py) — same param tree, one fewer
            # full-resolution HBM round trip per block.
            x = ConvTorch(
                self.filters, 3, stride=2, padding=1, pre_blur=True, name="conv_down"
            )(x)
        return (x + res) * _INV_SQRT2


class DiscriminatorE(nn.Module):
    image_size: int
    network_capacity: int = 16
    attn_layers: Sequence[int] = ()
    transparent: bool = False
    mode: str = "disc"  # 'disc' | 'cond_disc' | 'encoder'
    encoder_dim: int = 512
    num_classes: int = 2
    fmap_max: int = 512
    # optional feature-quantization layers (`fq_layers`/`fq_dict_size`,
    # `stylex_train.py:867-871`); commitment losses are sown under
    # intermediates/quantize_loss (the reference silently drops them —
    # see stylex_tpu.ops.vq).
    fq_layers: Sequence[int] = ()
    fq_dict_size: int = 256

    def _quantize(self, x, out_chan: int, ind: int):
        from stylex_tpu.ops.vq import VQState, vector_quantize

        book = self.variable(
            "vq",
            f"codebook{ind}",
            lambda: jax.random.normal(
                jax.random.PRNGKey(ind), (self.fq_dict_size, out_chan)
            ),
        )
        cluster = self.variable("vq", f"cluster{ind}", lambda: jnp.zeros((self.fq_dict_size,)))
        avg = self.variable("vq", f"avg{ind}", lambda: jnp.array(book.value))
        state = VQState(book.value, cluster.value, avg.value)
        quantized, _, loss, new_state = vector_quantize(
            state, x, update=not self.is_initializing()
        )
        self.sow("intermediates", "quantize_loss", loss)
        if not self.is_initializing() and self.is_mutable_collection("vq"):
            book.value = new_state.codebook
            cluster.value = new_state.cluster_size
            avg.value = new_state.embed_avg
        return quantized

    @nn.compact
    def __call__(self, x, probabilities: Optional[jax.Array] = None,
                 return_features: bool = False):
        """Run the trunk.

        Args:
          x: (B, S, S, 3) images in [0, 1].
          probabilities: (B, num_classes) class probabilities — required for
            ``mode='cond_disc'`` (projection conditioning,
            `stylex_train_new.py:912-914`), ignored otherwise.
          return_features: return the flattened trunk features instead of
            head outputs (the contrastive regulariser's 'flatten' hook,
            `stylex_train.py:951`).

        Returns:
          (B,) critic scores for 'disc'/'cond_disc', (B, encoder_dim) for
          'encoder', or (B, 2*2*chan_last) features.
        """
        filters = discriminator_filters(self.image_size, self.network_capacity, self.fmap_max)
        chan_in_out = list(zip(filters[:-1], filters[1:]))

        for ind, (_, out_chan) in enumerate(chan_in_out):
            is_not_last = ind != len(chan_in_out) - 1
            x = DiscriminatorBlock(out_chan, downsample=is_not_last, name=f"block{ind}")(x)
            if (ind + 1) in self.attn_layers:
                x = AttnAndFF(out_chan, name=f"attn{ind}")(x)
            if (ind + 1) in self.fq_layers:
                x = self._quantize(x, out_chan, ind)

        chan_last = filters[-1]
        x = ConvTorch(chan_last, 3, padding=1, name="final_conv")(x)
        x = x.reshape(x.shape[0], -1)  # (B, 2*2*chan_last)

        if return_features:
            return x
        if self.mode == "encoder":
            return DenseTorch(self.encoder_dim, name="fc")(x)
        if self.mode == "cond_disc":
            logits = DenseTorch(self.num_classes, name="fc")(x)
            return jnp.sum(logits * probabilities, axis=-1)
        return DenseTorch(1, name="fc")(x)[:, 0]
