"""Host-side data transforms (numpy / cv2).

TPU-native re-design of `/root/reference/vsrd/transforms/`: the input
pipeline stays on host (cv2 contours, polygon fills) producing numpy
arrays; only the padded, static-shape results move to HBM. Transforms
are callables taking/returning a sample dict with keys
``image [H, W, 3] f32``, ``masks [N, H, W] f32``, ``labels [N]``,
``boxes_3d [N, 8, 3]``, ``instance_ids [N]``, ``intrinsic_matrix``,
``extrinsic_matrix`` (+ derived keys they add).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is expected in this image
    cv2 = None


def _resize(image, size, interpolation):
    return cv2.resize(image, (size[1], size[0]), interpolation=interpolation)


class Resizer:
    """Resize image (bilinear) + masks (nearest) + rescale K
    (reference geometric_transforms.py:11-60)."""

    def __init__(self, image_size, image_interp_mode="bilinear",
                 masks_interp_mode="nearest"):
        self.image_size = tuple(image_size)
        self.image_interp = (
            cv2.INTER_LINEAR if image_interp_mode == "bilinear" else cv2.INTER_NEAREST
        )
        self.masks_interp = (
            cv2.INTER_NEAREST if masks_interp_mode == "nearest" else cv2.INTER_LINEAR
        )

    def __call__(self, sample):
        image = sample["image"]
        h, w = image.shape[:2]
        sy = self.image_size[0] / h
        sx = self.image_size[1] / w

        sample = dict(sample)
        sample["image"] = _resize(image, self.image_size, self.image_interp)
        masks = sample.get("masks")
        if masks is not None:
            if len(masks):
                sample["masks"] = np.stack(
                    [_resize(m, self.image_size, self.masks_interp) for m in masks]
                )
            else:
                sample["masks"] = np.empty(
                    (0, *self.image_size), dtype=masks.dtype
                )
        k = sample.get("intrinsic_matrix")
        if k is not None:
            scale = np.array(
                [[sx, 0, 0], [0, sy, 0], [0, 0, 1]], dtype=k.dtype
            )
            sample["intrinsic_matrix"] = scale @ k
        return sample


class Cropper:
    """Crop image/masks + shift K (reference geometric_transforms.py:63-100)."""

    def __init__(self, position, image_size):
        self.position = tuple(position)  # (y, x)
        self.image_size = tuple(image_size)

    def __call__(self, sample):
        y, x = self.position
        h, w = self.image_size
        sample = dict(sample)
        sample["image"] = sample["image"][y : y + h, x : x + w]
        masks = sample.get("masks")
        if masks is not None:
            sample["masks"] = masks[:, y : y + h, x : x + w]
        k = sample.get("intrinsic_matrix")
        if k is not None:
            shift = np.array(
                [[1, 0, -x], [0, 1, -y], [0, 0, 1]], dtype=k.dtype
            )
            sample["intrinsic_matrix"] = shift @ k
        return sample


class RandomHorizontalFlipper:
    """Horizontal flip of image/masks + K flip
    (reference geometric_transforms.py:103-136). Params are resampled via
    update_params (per reference dataset contract)."""

    def __init__(self, probability=0.5, rng=None):
        self.probability = probability
        self.rng = rng or np.random.default_rng()
        self.update_params()

    def update_params(self):
        self.flip = bool(self.rng.random() < self.probability)

    def __call__(self, sample):
        if not self.flip:
            return sample
        sample = dict(sample)
        image = sample["image"]
        sample["image"] = image[:, ::-1].copy()
        masks = sample.get("masks")
        if masks is not None:
            sample["masks"] = masks[:, :, ::-1].copy()
        k = sample.get("intrinsic_matrix")
        if k is not None:
            h, w = image.shape[:2]
            flip = np.array(
                [[-1, 0, w - 1], [0, -1, h - 1], [0, 0, 1]], dtype=k.dtype
            )
            sample["intrinsic_matrix"] = flip @ k
        return sample


class MaskAreaFilter:
    """Drop instances whose binary mask area is below a threshold
    (reference geometric_transforms.py:180-203)."""

    INSTANCE_KEYS = ("masks", "labels", "boxes_3d", "boxes_2d", "instance_ids")

    def __init__(self, min_mask_area, threshold=0.5):
        self.min_mask_area = min_mask_area
        self.threshold = threshold

    def __call__(self, sample):
        masks = sample["masks"]
        areas = (masks > self.threshold).sum(axis=(-2, -1))
        keep = areas >= self.min_mask_area
        sample = dict(sample)
        for key in self.INSTANCE_KEYS:
            if key in sample and sample[key] is not None:
                sample[key] = sample[key][keep]
        return sample


class BoxGenerator:
    """2D boxes [[x0,y0],[x1,y1]] from binary masks
    (reference geometric_transforms.py:139-167)."""

    def __init__(self, threshold=0.5):
        self.threshold = threshold

    def __call__(self, sample):
        masks = sample["masks"]
        boxes = np.zeros((len(masks), 2, 2), np.float32)
        for i, mask in enumerate(masks):
            ys, xs = np.nonzero(mask > self.threshold)
            if len(ys):
                boxes[i] = [[xs.min(), ys.min()], [xs.max(), ys.max()]]
        return dict(sample, boxes_2d=boxes)


class BoxSizeFilter:
    """Drop instances whose 2D box min side is below a threshold
    (reference geometric_transforms.py:206-230)."""

    def __init__(self, min_box_size):
        self.min_box_size = min_box_size

    def __call__(self, sample):
        boxes = sample["boxes_2d"]
        sizes = (boxes[:, 1] - boxes[:, 0]).min(axis=-1)
        keep = sizes >= self.min_box_size
        sample = dict(sample)
        for key in MaskAreaFilter.INSTANCE_KEYS:
            if key in sample and sample[key] is not None:
                sample[key] = sample[key][keep]
        return sample


def _largest_contour(mask, threshold=0.5):
    binary = (mask > threshold).astype(np.uint8)
    contours, _ = cv2.findContours(
        binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        return None
    return max(contours, key=cv2.contourArea).squeeze(-2)


class MaskRefiner:
    """Re-fill each mask from its largest external contour
    (reference geometric_transforms.py:320-360)."""

    def __init__(self, threshold=0.5):
        self.threshold = threshold

    def __call__(self, sample):
        masks = sample["masks"]
        if masks.size == 0:
            return sample
        refined = np.zeros_like(masks)
        for i, mask in enumerate(masks):
            polygon = _largest_contour(mask, self.threshold)
            if polygon is None or polygon.ndim != 2:
                continue
            canvas = np.zeros(mask.shape, np.uint8)
            cv2.fillPoly(canvas, [polygon.astype(np.int64)], 255)
            refined[i] = (canvas > 0).astype(masks.dtype)
        return dict(sample, masks=refined)


def polygon_distance_map(polygon: np.ndarray, image_size) -> np.ndarray:
    """Unsigned distance from each pixel to the polygon boundary
    (vectorized point-segment distance; reference
    geometric_transforms.py:265-288). Uses the native C++ kernel when
    available (data/native.py)."""
    from . import native

    fast = native.polygon_distance_map_native(polygon, image_size)
    if fast is not None:
        return fast
    h, w = image_size
    ys, xs = np.mgrid[0:h, 0:w]
    points = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)

    prev_v = polygon.astype(np.float32)
    next_v = np.roll(prev_v, -1, axis=0)
    sides = next_v - prev_v                                   # [V, 2]

    rel = points[:, None, :] - prev_v[None, :, :]             # [P, V, 2]
    denom = np.sum(sides * sides, axis=-1) + 1e-6
    ratio = np.clip(
        np.sum(rel * sides[None], axis=-1) / denom[None], 0.0, 1.0
    )
    normals = rel - sides[None] * ratio[..., None]
    distances = np.linalg.norm(normals, axis=-1).min(axis=-1)
    return distances.reshape(h, w)


class SoftRasterizer:
    """mask -> largest polygon -> signed distance map -> sigmoid soft mask
    (reference geometric_transforms.py:233-317). Adds ``hard_masks`` and
    ``soft_masks``."""

    def __init__(self, threshold=0.5, temperature=10.0):
        self.threshold = threshold
        self.temperature = temperature

    def __call__(self, sample):
        masks = sample["masks"]
        if masks.size == 0:
            return dict(
                sample,
                hard_masks=masks,
                soft_masks=np.empty_like(masks),
            )
        soft = np.zeros_like(masks, dtype=np.float32)
        for i, mask in enumerate(masks):
            polygon = _largest_contour(mask, self.threshold)
            if polygon is None or polygon.ndim != 2 or len(polygon) < 3:
                soft[i] = mask
                continue
            canvas = np.zeros(mask.shape, np.uint8)
            cv2.fillPoly(canvas, [polygon.astype(np.int64)], 255)
            inside = canvas > 0
            distance = polygon_distance_map(polygon, mask.shape)
            sdf = np.where(inside, distance, -distance)
            soft[i] = 1.0 / (1.0 + np.exp(-sdf / self.temperature))
        return dict(sample, hard_masks=masks, soft_masks=soft)


class BoxJitter:
    """Jitter crop boxes by a random scale of their size
    (reference geometric_transforms.py:363-373)."""

    def __init__(self, scale_range, rng=None):
        self.scale_range = scale_range
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        crop_box = sample["crop_box"]
        sizes = crop_box[1] - crop_box[0]
        scales = self.rng.uniform(*self.scale_range, size=crop_box.shape)
        return dict(sample, crop_box=crop_box + sizes * scales)


class FractalBrownianMotion:
    """Perlin-noise image augmentation
    (reference photometric_transforms.py:12-105)."""

    def __init__(self, amplitude, resolution, persistence, lacunarity,
                 num_octaves, rng=None):
        self.amplitude = np.asarray(amplitude, np.float32)
        self.resolution = np.asarray(resolution, np.int64)
        self.persistence = persistence
        self.lacunarity = lacunarity
        self.num_octaves = num_octaves
        self.rng = rng or np.random.default_rng()

    def _perlin(self, image_size, amplitude, resolution):
        image_size = np.asarray(image_size)
        resolution = np.maximum(resolution.astype(np.int64), 1)
        remnant = image_size % resolution
        padding = (resolution - remnant) % resolution
        padded = image_size + padding

        reps = padded // resolution
        grid = [
            np.modf(np.linspace(0.0, r, s, endpoint=False))[0]
            for r, s in zip(resolution, padded)
        ]
        py, px = np.meshgrid(*grid, indexing="ij")

        angles = 2.0 * np.pi * self.rng.random(tuple(resolution + 1))
        gradients = np.stack([np.cos(angles), np.sin(angles)], axis=0)
        gradients = np.repeat(gradients, reps[0], axis=1)
        gradients = np.repeat(gradients, reps[1], axis=2)

        g00 = gradients[:, : -reps[0], : -reps[1]]
        g10 = gradients[:, reps[0] :, : -reps[1]]
        g01 = gradients[:, : -reps[0], reps[1] :]
        g11 = gradients[:, reps[0] :, reps[1] :]

        def dot(gr, oy, ox):
            return (py - oy) * gr[0] + (px - ox) * gr[1]

        n00, n10 = dot(g00, 0, 0), dot(g10, 1, 0)
        n01, n11 = dot(g01, 0, 1), dot(g11, 1, 1)

        wy = 3 * py**2 - 2 * py**3
        wx = 3 * px**2 - 2 * px**3
        n0 = n00 + (n10 - n00) * wy
        n1 = n01 + (n11 - n01) * wy
        noise = n0 + (n1 - n0) * wx

        noise = (noise - noise.min()) / max(noise.max() - noise.min(), 1e-12)
        noise = (noise * 2.0 - 1.0) * amplitude
        return noise[padding[0] :, padding[1] :]

    def __call__(self, sample):
        image = sample["image"]
        size = np.asarray(image.shape[:2])
        noise = sum(
            self._perlin(
                size,
                self.amplitude * self.persistence**octave,
                self.resolution * self.lacunarity**octave,
            )
            for octave in range(self.num_octaves)
        )
        out = np.clip(
            image + noise[..., None] * self.rng.random(), 0.0, 1.0
        ).astype(image.dtype)
        return dict(sample, image=out)


class FastFractalBrownianMotion(FractalBrownianMotion):
    """FBM computed at 1/downscale_factor resolution and bilinearly
    upsampled (reference photometric_transforms.py:106-123) — same noise
    statistics at a fraction of the per-octave cost."""

    def __init__(self, *args, downscale_factor, **kwargs):
        super().__init__(*args, **kwargs)
        self.downscale_factor = downscale_factor

    def __call__(self, sample):
        image = sample["image"]
        size = np.asarray(image.shape[:2])
        small = np.maximum(size // self.downscale_factor, 1)
        noise = sum(
            self._perlin(
                small,
                self.amplitude * self.persistence**octave,
                self.resolution * self.lacunarity**octave,
            )
            for octave in range(self.num_octaves)
        )
        noise = cv2.resize(
            noise.astype(np.float32), (int(size[1]), int(size[0])),
            interpolation=cv2.INTER_LINEAR,
        )
        out = np.clip(
            image + noise[..., None] * self.rng.random(), 0.0, 1.0
        ).astype(image.dtype)
        return dict(sample, image=out)


class RandomConvolution:
    """Random-kernel blur blended with the original
    (reference photometric_transforms.py:126-152)."""

    def __init__(self, kernel_sizes, rng=None):
        self.kernel_sizes = kernel_sizes
        self.rng = rng or np.random.default_rng()

    def __call__(self, sample):
        image = sample["image"]
        k = int(self.rng.choice(self.kernel_sizes))
        weight = self.rng.normal(size=(k, k)).astype(np.float32)
        weight /= weight.sum() if abs(weight.sum()) > 1e-6 else 1.0
        convolved = cv2.filter2D(image, -1, weight)
        alpha = self.rng.random()
        out = np.clip(image + (convolved - image) * alpha, 0.0, 1.0)
        return dict(sample, image=out.astype(image.dtype))


class ColorJitter:
    """Brightness/contrast/saturation/hue jitter with parameters
    resampled via update_params (reference photometric_transforms.py:155-191)."""

    def __init__(self, brightness=(1.0, 1.0), contrast=(1.0, 1.0),
                 saturation=(1.0, 1.0), hue=(0.0, 0.0), rng=None):
        self.ranges = dict(
            brightness=brightness, contrast=contrast,
            saturation=saturation, hue=hue,
        )
        self.rng = rng or np.random.default_rng()
        self.update_params()

    def update_params(self):
        self.factors = {
            name: self.rng.uniform(*rng_) for name, rng_ in self.ranges.items()
        }
        self.order = self.rng.permutation(4)

    def _apply(self, image, name):
        factor = self.factors[name]
        if name == "brightness":
            return np.clip(image * factor, 0, 1)
        if name == "contrast":
            gray = image @ np.array([0.299, 0.587, 0.114], np.float32)
            mean = gray.mean()
            return np.clip(mean + (image - mean) * factor, 0, 1)
        if name == "saturation":
            gray = (image @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
            return np.clip(gray + (image - gray) * factor, 0, 1)
        hsv = cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
        hsv = hsv.astype(np.int32)
        hsv[..., 0] = (hsv[..., 0] + int(factor * 180)) % 180
        rgb = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        return rgb.astype(np.float32) / 255.0

    def __call__(self, sample):
        augmented = sample.get("augmented_image", sample["image"])
        names = ["brightness", "contrast", "saturation", "hue"]
        for index in self.order:
            augmented = self._apply(augmented, names[index])
        return dict(sample, augmented_image=augmented.astype(np.float32))
