"""TF twin of the Google StylEx generator layout, for ingestion tests.

Builds a ``tf.Module`` tree with the attribute/variable layout
:func:`stylex_tpu.ingest_tf.convert_google_generator` documents
(``style_vector_calculator.style_dense_blocks[i].dense.kernel`` /
``.dense_bias.weights[0]``, ``g_synthesis.const/convs/torgbs``) and the
same synthesis math as
:class:`stylex_tpu.models.google_stylex.GoogleStylExGenerator`, saveable
via ``tf.saved_model.save`` — a synthetic stand-in for the real artifact
(`FID_TensorFlow.ipynb` cell 5), which this offline image cannot download.
"""

from __future__ import annotations

import numpy as np
import tensorflow as tf


class _Dense(tf.Module):
    def __init__(self, kernel, name=None):
        super().__init__(name=name)
        self.kernel = tf.Variable(kernel, name="kernel")


class _BiasHolder(tf.Module):
    def __init__(self, bias, name=None):
        super().__init__(name=name)
        self.weights = [tf.Variable(bias, name="bias")]


class _StyleBlock(tf.Module):
    def __init__(self, kernel, bias, name=None):
        super().__init__(name=name)
        self.dense = _Dense(kernel)
        self.dense_bias = _BiasHolder(bias)


class _Conv(tf.Module):
    def __init__(self, weight, bias, name=None):
        super().__init__(name=name)
        self.weight = tf.Variable(weight, name="weight")
        self.bias = tf.Variable(bias, name="bias")


def _modconv(x, weight, style, demod):
    """NHWC modulated conv, same math as ops.modconv.modulated_conv2d with
    the affine output modulating directly."""
    x = x * style[:, None, None, :]
    y = tf.nn.conv2d(x, weight, strides=1, padding="SAME")
    if demod:
        w_sq = tf.reduce_sum(tf.square(weight), axis=[0, 1])
        denom = tf.square(style) @ w_sq
        y = y * tf.math.rsqrt(denom + 1e-8)[:, None, None, :]
    return y


def _up2x(x):
    h = tf.shape(x)[1]
    w = tf.shape(x)[2]
    return tf.image.resize(x, (2 * h, 2 * w), method="bilinear")


class _StyleVectorCalculator(tf.Module):
    def __init__(self, conv_blocks, torgb_blocks):
        super().__init__()
        self.style_dense_blocks = conv_blocks
        self.torgb_dense_blocks = torgb_blocks

    @tf.function
    def __call__(self, w):
        conv = [
            w @ blk.dense.kernel + blk.dense_bias.weights[0]
            for blk in self.style_dense_blocks
        ]
        torgb = [
            w @ blk.dense.kernel + blk.dense_bias.weights[0]
            for blk in self.torgb_dense_blocks
        ]
        return conv, torgb


class _Synthesis(tf.Module):
    def __init__(self, const, convs, torgbs, resolutions):
        super().__init__()
        self.const = tf.Variable(const, name="const")
        self.convs = convs
        self.torgbs = torgbs
        self._resolutions = list(resolutions)

    @tf.function
    def __call__(self, inputs):
        conv_styles, torgb_styles = inputs
        b = tf.shape(conv_styles[0])[0]
        x = tf.tile(self.const, [b, 1, 1, 1])
        rgb = None
        conv_i = 0
        for res_i, res in enumerate(self._resolutions):
            n_convs = 1 if res == 4 else 2
            for k in range(n_convs):
                if res != 4 and k == 0:
                    x = _up2x(x)
                p = self.convs[conv_i]
                x = _modconv(x, p.weight, conv_styles[conv_i], demod=True)
                x = tf.nn.leaky_relu(x + p.bias, 0.2)
                conv_i += 1
            tp = self.torgbs[res_i]
            y = _modconv(x, tp.weight, torgb_styles[res_i], demod=False)
            y = y + tp.bias
            rgb = y if rgb is None else _up2x(rgb) + y
        return tf.transpose(rgb, [0, 3, 1, 2])  # NCHW, notebook convention


class TwinGenerator(tf.Module):
    """generator.savedmodel twin."""

    def __init__(self, jax_gen, seed: int = 0):
        super().__init__()
        rng = np.random.RandomState(seed)
        d = jax_gen.dlatent_dim

        def dense_pair(cin):
            return (
                (rng.randn(d, cin) / np.sqrt(d)).astype(np.float32),
                (1.0 + 0.1 * rng.randn(1, cin)).astype(np.float32),
            )

        conv_blocks, convs = [], []
        for (_, cin, cout) in jax_gen.conv_specs:
            k, bb = dense_pair(cin)
            conv_blocks.append(_StyleBlock(k, bb))
            convs.append(_Conv(
                (rng.randn(3, 3, cin, cout) / np.sqrt(9 * cin)).astype(np.float32),
                (0.01 * rng.randn(cout)).astype(np.float32),
            ))
        torgb_blocks, torgbs = [], []
        for (_, cin) in jax_gen.torgb_specs:
            k, bb = dense_pair(cin)
            torgb_blocks.append(_StyleBlock(k, bb))
            torgbs.append(_Conv(
                (rng.randn(1, 1, cin, 3) / np.sqrt(cin)).astype(np.float32),
                (0.01 * rng.randn(3)).astype(np.float32),
            ))
        const = (0.1 * rng.randn(1, 4, 4, jax_gen.channels[4])).astype(np.float32)

        self.style_vector_calculator = _StyleVectorCalculator(
            conv_blocks, torgb_blocks
        )
        self.g_synthesis = _Synthesis(const, convs, torgbs, jax_gen.resolutions)


class TwinClassifier(tf.Module):
    """mobilenet.savedmodel twin: logits from spatial mean, 2 classes."""

    def __init__(self, seed: int = 1, num_classes: int = 2):
        super().__init__()
        rng = np.random.RandomState(seed)
        self.w = tf.Variable(rng.randn(3, num_classes).astype(np.float32) * 2.0,
                             name="w")

    @tf.function
    def __call__(self, images_nhwc):
        return tf.reduce_mean(images_nhwc, axis=[1, 2]) @ self.w


class _KerasDense:
    """keras-restored Dense: weights list, no .kernel attribute."""

    def __init__(self, kernel):
        self.weights = [kernel]


class _KerasBias:
    def __init__(self, bias):
        self.bias = bias


class _KerasConv:
    """keras-restored Conv: .kernel instead of .weight."""

    def __init__(self, kernel, bias):
        self.kernel = kernel
        self.bias = bias


class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def perturb_keras_layout(gen: TwinGenerator):
    """The same weights re-exposed under keras-restored naming
    (``dense.weights[0]`` / ``dense_bias.bias`` / ``convs[i].kernel``) —
    the converter's documented alternate candidate paths."""

    def blk(b):
        return _Obj(
            dense=_KerasDense(b.dense.kernel),
            dense_bias=_KerasBias(b.dense_bias.weights[0]),
        )

    svc = gen.style_vector_calculator
    syn = gen.g_synthesis
    return _Obj(
        style_vector_calculator=_Obj(
            style_dense_blocks=[blk(b) for b in svc.style_dense_blocks],
            torgb_dense_blocks=[blk(b) for b in svc.torgb_dense_blocks],
        ),
        g_synthesis=_Obj(
            const=syn.const,
            convs=[_KerasConv(c.weight, c.bias) for c in syn.convs],
            torgbs=[_KerasConv(c.weight, c.bias) for c in syn.torgbs],
        ),
    )


def perturb_nested_layout(gen: TwinGenerator):
    """One level of extra nesting: the original module wrapped under
    ``.model`` (what a keras re-save of the tf.Module produces)."""
    return _Obj(model=_Obj(
        style_vector_calculator=gen.style_vector_calculator,
        g_synthesis=gen.g_synthesis,
    ))


def perturb_broken_layout(gen: TwinGenerator):
    """A layout the converter must refuse: no g_synthesis anywhere."""
    return _Obj(model=_Obj(
        style_vector_calculator=gen.style_vector_calculator,
    ))


def save_twins(root, jax_gen, seed: int = 0):
    """Save generator + classifier twins under the bucket's directory names
    (cell 5); returns the in-memory twin objects."""
    gen = TwinGenerator(jax_gen, seed=seed)
    clf = TwinClassifier(seed=seed + 1)
    d = jax_gen.dlatent_dim
    S = jax_gen.image_size
    # trace concrete signatures so tf.saved_model.save captures the callables
    gen.style_vector_calculator.__call__.get_concrete_function(
        tf.TensorSpec([None, d], tf.float32)
    )
    conv_specs = [
        tf.TensorSpec([None, cin], tf.float32) for (_, cin, _) in jax_gen.conv_specs
    ]
    torgb_specs = [
        tf.TensorSpec([None, cin], tf.float32) for (_, cin) in jax_gen.torgb_specs
    ]
    gen.g_synthesis.__call__.get_concrete_function((conv_specs, torgb_specs))
    clf.__call__.get_concrete_function(tf.TensorSpec([None, S, S, 3], tf.float32))
    tf.saved_model.save(gen, str(root / "generator.savedmodel"))
    tf.saved_model.save(clf, str(root / "mobilenet.savedmodel"))
    return gen, clf
