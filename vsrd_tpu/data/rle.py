"""COCO run-length-encoded mask codec (pure numpy).

The KITTI-360 annotation JSONs store per-instance masks as COCO RLE
objects ``{"size": [H, W], "counts": <str|list>}`` (written by
pycocotools in the reference data-prep,
`/root/reference/tools/kitti_360/make_annotations.py:85-138`). This
module re-implements the codec without the C extension: column-major
(Fortran) run lengths alternating background/foreground, and the
pycocotools "compressed string" encoding (base-32-ish LEB128 variant
with delta coding from the second-to-last count).
"""

from __future__ import annotations

import numpy as np


def encode_counts(mask: np.ndarray) -> list[int]:
    """Binary mask [H, W] -> uncompressed column-major run lengths."""
    from . import native

    fast = native.rle_encode_native(mask)
    if fast is not None:
        return fast
    flat = np.asarray(mask, dtype=bool).flatten(order="F")
    if flat.size == 0:
        return []
    changes = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    runs = np.diff(np.concatenate([[0], changes, [flat.size]]))
    counts = runs.tolist()
    if flat[0]:  # RLE starts with the count of zeros
        counts = [0, *counts]
    return [int(c) for c in counts]


def decode_counts(counts, size) -> np.ndarray:
    """Uncompressed run lengths -> binary mask [H, W] (uint8)."""
    from . import native

    fast = native.rle_decode_native(counts, size)
    if fast is not None:
        return fast
    h, w = size
    total = h * w
    flat = np.zeros(total, dtype=np.uint8)
    pos = 0
    value = 0
    for count in counts:
        count = int(count)
        if value:
            flat[pos : pos + count] = 1
        pos += count
        value ^= 1
    return flat.reshape((h, w), order="F")


def compress_counts(counts) -> str:
    """pycocotools string compression: 5-bit groups, LSB first, with
    more-bit, sign-extended; counts delta-coded from index 2 on."""
    chars = []
    for i, count in enumerate(counts):
        x = int(count)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            # sign bit of the emitted 5-bit group
            more = not (x == 0 and not (c & 0x10)) and not (
                x == -1 and (c & 0x10)
            )
            if more:
                c |= 0x20
            chars.append(chr(c + 48))
    return "".join(chars)


def decompress_counts(string: str) -> list[int]:
    counts: list[int] = []
    pos = 0
    while pos < len(string):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(string[pos]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            pos += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))  # sign extension
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def encode(mask: np.ndarray) -> dict:
    """Binary mask [H, W] -> COCO RLE dict with compressed counts."""
    counts = encode_counts(mask)
    return {"size": list(mask.shape), "counts": compress_counts(counts)}


def decode(rle: dict) -> np.ndarray:
    """COCO RLE dict (compressed str or plain list) -> mask [H, W]."""
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = decompress_counts(counts)
    elif isinstance(counts, bytes):
        counts = decompress_counts(counts.decode("ascii"))
    return decode_counts(counts, rle["size"])


def area(rle: dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = decompress_counts(
            counts if isinstance(counts, str) else counts.decode("ascii")
        )
    return int(sum(counts[1::2]))
