"""Image similarity metrics and pose geodesics for 2D/3D registration.

TPU-native reimplementation of the reference metrics (diffdrr/metrics.py):
NCC / multiscale NCC / gradient NCC (Sobel), soft-histogram mutual
information (replacing the kornia dependency, SURVEY §2.3), and the SE(3)
geodesic distances used for convergence checks.

All metrics are pure functions wrapped in thin callable classes mirroring the
reference's module API; everything is jit/grad-safe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ._precision import f32_image_metrics, f32_matmuls
import numpy as np

from .pose import RigidTransform, so3_log_map

__all__ = [
    "NormalizedCrossCorrelation2d",
    "MultiscaleNormalizedCrossCorrelation2d",
    "GradientNormalizedCrossCorrelation2d",
    "MutualInformation",
    "LogGeodesicSE3",
    "DoubleGeodesicSE3",
    "ncc2d",
    "mutual_information",
    "sobel",
    "gaussian_blur",
]


# -----------------------------------------------------------------------------
# Patches + NCC
# -----------------------------------------------------------------------------


def to_patches(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Sliding patches as channels (reference: metrics.py:16-18).

    (B, C, H, W) -> (B, C * nH * nW, patch, patch) with stride 1.
    """
    B, C, H, W = x.shape
    p = patch_size
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(p, p), window_strides=(1, 1), padding="VALID"
    )  # (B, C*p*p, nH, nW)
    nH, nW = patches.shape[-2:]
    patches = patches.reshape(B, C, p, p, nH, nW)
    patches = patches.transpose(0, 1, 4, 5, 2, 3)
    return patches.reshape(B, C * nH * nW, p, p)


def _normalize_local(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    mu = jnp.mean(x, axis=(-1, -2), keepdims=True)
    var = jnp.var(x, axis=(-1, -2), keepdims=True) + eps
    return (x - mu) / jnp.sqrt(var)


def _box_sum(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Per-channel VALID p x p box sum via separable cumulative sums.

    NOT a convolution on purpose: on TPU, f32 convs run bf16-compute on the
    MXU by default, and the downstream ``E[x^2] - mu^2`` cancellation turns
    that 8-bit mantissa into catastrophe — flat patches got variances off
    by ~1e-2, the eps floor made |ncc| explode to O(1e3), and full-scale
    TPU registration silently diverged (round-4 find; the CPU tests never
    saw it because CPU convs are true f32). Cumsum runs on the VPU in f32
    unconditionally, so the statistics stay accurate WITHOUT paying the
    3x "highest"-precision conv tax.
    """
    cs = jnp.cumsum(x, axis=2)
    x = cs[:, :, p - 1:, :] - jnp.pad(cs, ((0, 0), (0, 0), (1, 0), (0, 0))
                                      )[:, :, :-p, :]
    cs = jnp.cumsum(x, axis=3)
    return cs[:, :, :, p - 1:] - jnp.pad(cs, ((0, 0), (0, 0), (0, 0), (1, 0))
                                         )[:, :, :, :-p]


def ncc2d(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    patch_size: Optional[int] = None,
    eps: float = 1e-5,
    var_floor: float = 0.0,
) -> jnp.ndarray:
    """Normalized cross-correlation, optionally patchwise (metrics.py:21-44).

    The patchwise score is the mean over all stride-1 patch centers of the
    per-patch normalized correlation. The reference materializes every
    patch (unfold -> (B, C*nH*nW, p, p), metrics.py:16-18) — p^2 times the
    image in memory traffic. Here the identical quantity comes from box-
    filtered sufficient statistics (five separable p x p box sums):

        ncc_c = (E[x1 x2] - mu1 mu2) / sqrt((var1 + eps)(var2 + eps))

    per center c, averaged. Algebraically equal to normalizing each patch
    and correlating (the eps lands on the biased variance exactly as
    ``_normalize_local`` puts it); measured ~5x faster fwd+grad on TPU at
    200^2/p=13 (tools/ab_f32metrics.py --micro vs round-3).
    """
    if patch_size is not None:
        assert x1.shape == x2.shape, "Input images must be the same size"
        p = patch_size
        n = float(p * p)
        s1 = _box_sum(x1, p) / n
        s2 = _box_sum(x2, p) / n
        s11 = _box_sum(x1 * x1, p) / n
        s22 = _box_sum(x2 * x2, p) / n
        s12 = _box_sum(x1 * x2, p) / n
        cov = s12 - s1 * s2
        # max(., 0): E[x^2]-mu^2 cancellation can dip a hair negative in f32.
        var1 = jnp.maximum(s11 - s1 * s1, 0.0)
        var2 = jnp.maximum(s22 - s2 * s2, 0.0)
        # Gate BOTH-(near-)constant patches out of value and gradient. With
        # the bare eps floor, a flat-vs-flat patch's cov is pure f32
        # rounding noise amplified by 1/eps = 1e5 — worse, its GRADIENT is
        # noise times 1e5, platform-dependent (round-4 find: the phantom's
        # exactly-flat air regions made analytic pose gradients disagree
        # with finite differences BY SIGN on both CPU and TPU, and
        # full-scale TPU registration silently diverged; the reference has
        # the same pathology but its real CT has no exactly-flat patches).
        # A flat-flat patch's correct contribution is the limit value 0.
        # One-sided-flat patches STAY active: their cov gradient
        # ((x_other - mu_other)/denom) is real signal — it is what pulls a
        # silhouette into a structured target region (gating on either
        # side alone was measured to hide exactly that term from the
        # analytic gradient).
        valid = (var1 > eps) | (var2 > eps)
        floor = eps
        if var_floor > 0.0:
            # Relative variance floor (opt-in; default 0 keeps reference
            # parity). The absolute eps=1e-5 floor is ~9 orders below the
            # patch variances of O(100)-intensity DRRs, so near-flat
            # patches get their cov gradient amplified by 1/sqrt(var) —
            # at 256^2 on the full CT the air-adjacent faint patches then
            # dominate the analytic gradient with noise-shaped pull and
            # full-scale registration DIVERGES (round-5 find; the round-4
            # flat-flat gate only handles exactly-flat patches). Flooring
            # each variance at a fraction of the pair's mean patch
            # variance bounds the amplification while keeping the
            # silhouette-pull term active; stop_gradient keeps the floor
            # from adding its own gradient path.
            scale = jax.lax.stop_gradient(
                jnp.mean(var1 + var2, axis=(1, 2, 3), keepdims=True))
            floor = eps + var_floor * scale
        denom = jnp.sqrt((var1 + floor) * (var2 + floor))
        ncc = jnp.where(valid, cov, 0.0) / denom
        return jnp.mean(ncc, axis=(1, 2, 3))
    assert x1.shape == x2.shape, "Input images must be the same size"
    _, c, h, w = x1.shape
    x1 = _normalize_local(x1, eps)
    x2 = _normalize_local(x2, eps)
    score = jnp.einsum("b...,b...->b", x1, x2)
    return score / (c * h * w)


class NormalizedCrossCorrelation2d:
    """NCC between batches of images (reference: metrics.py:21-44)."""

    def __init__(self, patch_size: Optional[int] = None, eps: float = 1e-5,
                 var_floor: float = 0.0):
        self.patch_size = patch_size
        self.eps = eps
        self.var_floor = var_floor

    @f32_image_metrics
    def __call__(self, x1, x2):
        return ncc2d(x1, x2, self.patch_size, self.eps, self.var_floor)

    forward = __call__


class MultiscaleNormalizedCrossCorrelation2d:
    """Weighted sum of NCC at multiple patch scales (metrics.py:47-63)."""

    def __init__(
        self,
        patch_sizes: Sequence[Optional[int]] = (None,),
        patch_weights: Sequence[float] = (1.0,),
        eps: float = 1e-5,
        var_floor: float = 0.0,
    ):
        assert len(patch_sizes) == len(patch_weights), "Each scale must have a weight"
        self.patch_sizes = list(patch_sizes)
        self.patch_weights = list(patch_weights)
        self.eps = eps
        self.var_floor = var_floor

    @f32_image_metrics
    def __call__(self, x1, x2):
        scores = [
            w * ncc2d(x1, x2, p, self.eps, self.var_floor)
            for w, p in zip(self.patch_weights, self.patch_sizes)
        ]
        return jnp.sum(jnp.stack(scores, axis=0), axis=0)

    forward = __call__


# -----------------------------------------------------------------------------
# Sobel gradient NCC
# -----------------------------------------------------------------------------


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    # torchvision's construction: linspace over +-(k-1)/2, normalized.
    x = jnp.linspace(
        -(kernel_size - 1) * 0.5, (kernel_size - 1) * 0.5, kernel_size
    )
    pdf = jnp.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def gaussian_blur(img: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding (torchvision semantics)."""
    k = _gaussian_kernel1d(kernel_size, sigma).astype(img.dtype)
    pad = kernel_size // 2
    x = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    # precision=HIGHEST: these 1-D taps contract over <= ~13 elements, so
    # true-f32 costs nothing — while the TPU default's bf16 products leave
    # O(4e-3) noise in flat regions, which downstream variance gates
    # (ncc2d) would mistake for structure.
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


# NumPy on purpose: a module-level jnp.asarray would initialize the default
# device backend at import time (blocking forever when the TPU tunnel is
# down, and defeating later jax_platforms overrides).
_SOBEL_GX = np.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
_SOBEL_GY = np.asarray([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def sobel(img: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Gaussian-blurred Sobel X/Y gradients (reference: metrics.py:69-93).

    (B, 1, H, W) -> (B, 2, H, W), zero padding like torch Conv2d(padding=1).
    """
    x = img
    if sigma > 0:
        kernel_size = int(6 * sigma + 1) | 1
        x = gaussian_blur(img, kernel_size, sigma)
    kernel = jnp.stack([_SOBEL_GX, _SOBEL_GY])[:, None].astype(x.dtype)  # (2,1,3,3)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NCHW", "OIHW", "NCHW"))
    # precision=HIGHEST: 3x3 taps — free in f32, and exact zeros on flat
    # regions (the TPU bf16 default leaves noise the NCC gate would pass).
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )


class Sobel:
    def __init__(self, sigma: float):
        self.sigma = sigma

    @f32_image_metrics
    def __call__(self, img):
        return sobel(img, self.sigma)

    forward = __call__


class GradientNormalizedCrossCorrelation2d(NormalizedCrossCorrelation2d):
    """NCC between Sobel gradients of two image batches (metrics.py:96-104)."""

    def __init__(self, patch_size: Optional[int] = None, sigma: float = 1.0, **kwargs):
        super().__init__(patch_size, **kwargs)
        self.sobel = Sobel(sigma)

    @f32_image_metrics
    def __call__(self, x1, x2):
        return super().__call__(self.sobel(x1), self.sobel(x2))

    forward = __call__


# -----------------------------------------------------------------------------
# Mutual information (soft histograms)
# -----------------------------------------------------------------------------


def _histogram_sums(v1, v2, bins, sigma, chunk=16384):
    """Unnormalized Parzen marginal + joint sums, chunked over pixels.

    Computes ``sum_n K(v1_n - b_i)``, ``sum_n K(v2_n - b_j)`` and
    ``sum_n K(v1_n - b_i) K(v2_n - b_j)`` without ever materializing the
    (B, N, bins) kernel-value tensor (weak #7 in VERDICT r4: ~160 MB/image
    at 200^2, ~1 GB at 500^2). Pixels stream through a rematerialized
    ``lax.scan`` in ``chunk``-sized blocks — peak memory is O(chunk*bins)
    (~35 MB at the defaults) and the joint contraction stays an MXU matmul.
    Bitwise this matches the dense formulation up to f32 summation order.
    """
    B, N = v1.shape
    nb = bins.shape[0]
    if N <= chunk:
        kv1 = jnp.exp(-0.5 * ((v1[..., None] - bins) / sigma) ** 2)
        kv2 = jnp.exp(-0.5 * ((v2[..., None] - bins) / sigma) ** 2)
        return (jnp.sum(kv1, axis=1), jnp.sum(kv2, axis=1),
                jnp.einsum("bni,bnj->bij", kv1, kv2))

    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    w = jnp.pad(jnp.ones((N,), v1.dtype), (0, pad))
    v1p = jnp.pad(v1, ((0, 0), (0, pad)))
    v2p = jnp.pad(v2, ((0, 0), (0, pad)))
    v1c = v1p.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    v2c = v2p.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    wc = w.reshape(n_chunks, chunk)

    def body(acc, xs):
        s1, s2, j12 = acc
        c1, c2, cw = xs
        kv1 = jnp.exp(-0.5 * ((c1[..., None] - bins) / sigma) ** 2)
        kv2 = jnp.exp(-0.5 * ((c2[..., None] - bins) / sigma) ** 2)
        kv1 = kv1 * cw[None, :, None]  # zero out padding pixels
        kv2 = kv2 * cw[None, :, None]
        return (s1 + jnp.sum(kv1, axis=1),
                s2 + jnp.sum(kv2, axis=1),
                j12 + jnp.einsum("bni,bnj->bij", kv1, kv2)), None

    init = (jnp.zeros((B, nb), v1.dtype), jnp.zeros((B, nb), v1.dtype),
            jnp.zeros((B, nb, nb), v1.dtype))
    # Remat: without it the backward saves every chunk's kernel values —
    # exactly the (B, N, bins) blow-up this formulation exists to avoid.
    (s1, s2, j12), _ = jax.lax.scan(
        jax.checkpoint(body, policy=jax.checkpoint_policies.nothing_saveable),
        init, (v1c, v2c, wc))
    return s1, s2, j12


def mutual_information(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    sigma: float = 0.1,
    num_bins: int = 256,
    epsilon: float = 1e-10,
    normalize: bool = True,
) -> jnp.ndarray:
    """(Normalized) mutual information on [0, 1] images (metrics.py:110-139).

    Multi-channel images are scored per channel and averaged (the reference
    silently truncates to channel 0 via its kornia histogram call).
    """
    assert x1.shape == x2.shape
    B, C, H, W = x1.shape
    bins = jnp.linspace(0.0, 1.0, num_bins, dtype=x1.dtype)

    # Fold channels into the batch: MI per (image, channel) pair.
    v1 = x1.reshape(B * C, H * W)
    v2 = x2.reshape(B * C, H * W)
    s1, s2, j12 = _histogram_sums(v1, v2, bins, sigma)
    N = H * W
    pdf1 = s1 / N
    pdf1 = pdf1 / (jnp.sum(pdf1, axis=1, keepdims=True) + epsilon)
    pdf2 = s2 / N
    pdf2 = pdf2 / (jnp.sum(pdf2, axis=1, keepdims=True) + epsilon)
    pdf12 = j12 / (jnp.sum(j12, axis=(1, 2), keepdims=True) + epsilon)

    H1 = -jnp.sum(pdf1 * jnp.log2(pdf1 + epsilon), axis=1)
    H2 = -jnp.sum(pdf2 * jnp.log2(pdf2 + epsilon), axis=1)
    H12 = -jnp.sum(pdf12 * jnp.log2(pdf12 + epsilon), axis=(1, 2))

    mi = H1 + H2 - H12
    if normalize:
        mi = 2 * mi / (H1 + H2)
    return jnp.mean(mi.reshape(B, C), axis=1)


class MutualInformation:
    """Mutual information (reference: metrics.py:110-139)."""

    def __init__(self, sigma=0.1, num_bins=256, epsilon=1e-10, normalize=True):
        self.sigma = sigma
        self.num_bins = num_bins
        self.epsilon = epsilon
        self.normalize = normalize

    @f32_image_metrics
    def __call__(self, x1, x2):
        return mutual_information(
            x1, x2, self.sigma, self.num_bins, self.epsilon, self.normalize
        )

    forward = __call__


# -----------------------------------------------------------------------------
# SE(3) geodesics
# -----------------------------------------------------------------------------


class LogGeodesicSE3:
    """Distance in the log-space of SE(3) (reference: metrics.py:145-158)."""

    @f32_matmuls
    def __call__(self, pose_1: RigidTransform, pose_2: RigidTransform) -> jnp.ndarray:
        rel = pose_2.compose(pose_1.inverse())
        return jnp.linalg.norm(rel.get_se3_log(), axis=1)

    forward = __call__


class DoubleGeodesicSE3:
    """Angular + translational geodesics, combined (metrics.py:164-187).

    The rotational geodesic is scaled by sdd/2 to express it in units of
    length at the isocenter.
    """

    def __init__(self, sdd: float, eps: float = 1e-6):
        self.sdr = sdd / 2
        self.eps = eps

    @f32_matmuls
    def __call__(self, pose_1: RigidTransform, pose_2: RigidTransform):
        r1, t1 = pose_1.convert("matrix")
        r2, t2 = pose_2.convert("matrix")
        rot = self.sdr * jnp.linalg.norm(
            so3_log_map(jnp.einsum("...ji,...jk->...ik", r1, r2)), axis=-1
        )
        xyz = jnp.linalg.norm(t1 - t2, axis=-1)
        dou = jnp.sqrt(rot**2 + xyz**2 + self.eps)
        return rot, xyz, dou

    forward = __call__
