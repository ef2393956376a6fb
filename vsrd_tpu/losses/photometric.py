"""Photometric losses (SSIM + Huber blend).

jax re-design of `/root/reference/vsrd/losses/photometric_losses.py`.
Images are NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.iou2d import smooth_l1
from .utils import reduced


def _avg_pool2d(x, kernel_size: int, stride: int):
    window = (1, 1, kernel_size, kernel_size)
    strides = (1, 1, stride, stride)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, "VALID")
    return summed / (kernel_size * kernel_size)


def _pad_reflect(x, padding: int):
    return jnp.pad(
        x, ((0, 0), (0, 0), (padding, padding), (padding, padding)), mode="reflect"
    )


@reduced
def ssim_loss(
    inputs,
    targets,
    C1=0.01**2,
    C2=0.03**2,
    kernel_size=3,
    stride=1,
    padding=1,
):
    x = _pad_reflect(inputs, padding)
    y = _pad_reflect(targets, padding)

    mu_x = _avg_pool2d(x, kernel_size, stride)
    mu_y = _avg_pool2d(y, kernel_size, stride)

    sigma_xx = _avg_pool2d(x * x, kernel_size, stride) - mu_x * mu_x
    sigma_yy = _avg_pool2d(y * y, kernel_size, stride) - mu_y * mu_y
    sigma_xy = _avg_pool2d(x * y, kernel_size, stride) - mu_x * mu_y

    luminance = (2.0 * mu_x * mu_y + C1) / (mu_x * mu_x + mu_y * mu_y + C1)
    contrast_structure = (2.0 * sigma_xy + C2) / (sigma_xx + sigma_yy + C2)

    ssim = luminance * contrast_structure
    return jnp.clip((1.0 - ssim) / 2.0, 0.0, 1.0)


@reduced
def photometric_loss(inputs, targets, alpha=0.75):
    ssim = ssim_loss(inputs, targets, reduction="none")
    huber = smooth_l1(inputs, targets)
    return ssim * alpha + huber * (1.0 - alpha)
