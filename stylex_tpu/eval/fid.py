"""FID — Fréchet Inception Distance, computed on-device.

The reference shells out to ``pytorch_fid`` with dumped PNG directories
(`/root/reference/stylex/stylex_train.py:1577-1622`) and re-implements the
same from pool3 features in TF (`FID_TensorFlow.ipynb` cells 21-28). Here
the pipeline stays on the TPU: batches stream through a jitted feature
extractor, running (sum, outer-product sum) moments accumulate on device,
and only the final 2048x2048 sqrtm runs on host (scipy).

Feature extractors are pluggable:

* :func:`inception_pool3_features` — InceptionV3 pool3 (2048-d), the FID
  standard; requires converted weights
  (:func:`stylex_tpu.models.inception.convert_inception_state_dict`).
* :func:`alexnet_features_fn` — seeded random AlexNet global-average
  features (offline fallback; self-consistent for tracking training
  progress, *not* comparable to published FID numbers).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FeatureStats",
    "frechet_distance",
    "fid_from_image_batches",
    "alexnet_features_fn",
    "resolve_feature_fn",
    "compute_feature_stats",
]


class FeatureStats:
    """Streaming mean/covariance accumulator.

    Sums accumulate on the HOST in float64: the ``outer - n*mu*mu``
    cancellation in :meth:`finalize` loses digits in float32 over
    thousands of samples, and pytorch_fid (the parity target,
    `stylex_train.py:1622`) accumulates in float64. The per-batch fetch of
    a (B, dim) feature block is negligible next to the extractor forward."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros((dim,), np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats) -> None:
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(axis=0)
        self.outer += f.T @ f

    def finalize(self):
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / max(self.n - 1, 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) with the standard
    jitter fallback for near-singular covariances.

    Sample covariances with fewer samples than feature dims are rank
    deficient by construction; the jitter is applied preemptively in that
    regime (and scipy's LinAlgWarning — raised for the near-singular matmul
    even when the answer is fine — is silenced here: the finiteness check
    below is the real guard)."""
    import warnings

    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    cov1, cov2 = np.atleast_2d(cov1), np.atleast_2d(cov2)
    diff = mu1 - mu2
    def _sqrtm(m):
        out = linalg.sqrtm(m)  # scipy >= 1.16: no `disp`, returns the matrix
        return out[0] if isinstance(out, tuple) else out

    def _is_rank_deficient(c):
        try:
            linalg.cholesky(c, lower=True)
            return False
        except linalg.LinAlgError:
            return True

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", linalg.LinAlgWarning)
        jitter = eps
        if _is_rank_deficient(cov1) or _is_rank_deficient(cov2):
            # preemptive: sqrtm of a singular product often returns finite
            # but inaccurate values, which the finiteness check below would
            # wave through
            offset = np.eye(cov1.shape[0]) * jitter
            covmean = _sqrtm((cov1 + offset) @ (cov2 + offset))
            jitter *= 100.0
        else:
            covmean = _sqrtm(cov1 @ cov2)
        while not np.isfinite(covmean).all() and jitter < 1e2:
            offset = np.eye(cov1.shape[0]) * jitter
            covmean = _sqrtm((cov1 + offset) @ (cov2 + offset))
            jitter *= 100.0
    if not np.isfinite(covmean).all():
        return float("inf")
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(covmean))


def alexnet_features_fn(seed: int = 0) -> Callable[[jax.Array], jax.Array]:
    """Offline-fallback feature extractor: seeded random AlexNet trunk,
    global-average-pooled conv5 (256-d)."""
    from stylex_tpu.models.lpips import _alexnet_features, init_lpips_params

    params = init_lpips_params(jax.random.PRNGKey(seed))

    @jax.jit
    def features(images: jax.Array) -> jax.Array:
        b, h, w, c = images.shape
        size = max(64, h)
        if (h, w) != (size, size):
            images = jax.image.resize(images, (b, size, size, c), method="bilinear")
        x = images * 2.0 - 1.0
        taps = _alexnet_features(params, x)
        return jnp.mean(taps[-1], axis=(1, 2))

    return features


def fid_from_image_batches(
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    feature_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> float:
    """FID between two streams of (B, H, W, 3) image batches in [0, 1].

    Defaults to InceptionV3 pool3 features when weights are available, else
    the seeded AlexNet fallback.
    """
    feature_fn = resolve_feature_fn(feature_fn)
    mu1, c1 = compute_feature_stats(real_batches, feature_fn)
    mu2, c2 = compute_feature_stats(fake_batches, feature_fn)
    return frechet_distance(mu1, c1, mu2, c2)


def resolve_feature_fn(
    feature_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> Callable[[jax.Array], jax.Array]:
    """InceptionV3 pool3 when weights are available, else seeded AlexNet.

    The returned callable carries a ``tag`` attribute identifying the
    extractor; cached feature statistics must be keyed by it (stats from
    different extractors have different dimensions and are never
    comparable)."""
    if feature_fn is not None:
        if not hasattr(feature_fn, "tag"):
            # Auto-tags include id(): two distinct extractor instances that
            # happen to share a function name must NOT share a cache key
            # (stats from different weights are never comparable). Callers
            # wanting cross-run stats reuse set a stable .tag themselves.
            auto_tag = (
                getattr(feature_fn, "__qualname__", None)
                or getattr(feature_fn, "__name__", "custom")
            ) + f"-{id(feature_fn):x}"
            try:
                feature_fn.tag = auto_tag
            except AttributeError:
                # bound methods / jitted wrappers reject attribute writes;
                # wrap so the tag (cache key) can be attached
                inner = feature_fn

                def feature_fn(x, _inner=inner):
                    return _inner(x)

                feature_fn.tag = auto_tag
        return feature_fn
    try:
        from stylex_tpu.models.inception import default_pool3_features

        feature_fn = default_pool3_features()
    except Exception:
        # an explicitly requested weights path must fail loudly (its
        # docstring's contract); only an UNSET path degrades to the
        # self-consistent random-feature fallback
        if os.environ.get("STYLEX_TPU_INCEPTION"):
            raise
        feature_fn = None
    if feature_fn is not None:
        feature_fn.tag = "inception_v3_pool3"
        return feature_fn
    feature_fn = alexnet_features_fn()
    feature_fn.tag = "alexnet_seeded"
    return feature_fn


def compute_feature_stats(
    batches: Iterable[np.ndarray],
    feature_fn: Callable[[jax.Array], jax.Array],
):
    """Streamed (mu, cov) over a stream of (B, H, W, 3) batches in [0, 1]."""
    stats = None
    for batch in batches:
        feats = feature_fn(jnp.asarray(batch))
        if stats is None:
            stats = FeatureStats(feats.shape[-1])
        stats.update(feats)
    if stats is None:
        raise ValueError("compute_feature_stats: the batch stream is empty")
    return stats.finalize()
