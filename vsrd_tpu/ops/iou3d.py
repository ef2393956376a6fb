"""Jittable 3D / BEV box IoU via static-shape convex polygon clipping.

The reference computes this metric on host with a Python
Sutherland-Hodgman clip + scipy ConvexHull
(`/root/reference/vsrd/operations/kitti360_operations.py:7-112`),
forcing a device->host sync at every logging step. Here the clip runs
on-device with a fixed 16-vertex buffer (two convex quadrilaterals
intersect in at most 8 vertices), so metrics stay inside jit and are
vmappable over instance pairs.

Corner convention (KITTI-360 "evaluation" order, z up after the caller's
Rx(-pi/2) rotation): corners 0-3 top face, 4-7 bottom face.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_VERTS = 16


def _cross2(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _shoelace(verts, count):
    idx = jnp.arange(MAX_VERTS)
    valid = idx < count
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    v_next = verts[nxt]
    terms = verts[:, 0] * v_next[:, 1] - v_next[:, 0] * verts[:, 1]
    return 0.5 * jnp.sum(jnp.where(valid, terms, 0.0))


def _ensure_ccw(poly):
    """Reverse a quadrilateral if clockwise (signed area < 0)."""
    area2 = jnp.sum(
        poly[:, 0] * jnp.roll(poly[:, 1], -1) - jnp.roll(poly[:, 0], -1) * poly[:, 1]
    )
    return jnp.where(area2 < 0, poly[::-1], poly)


def _line_intersection(s, e, cp1, cp2):
    dc = cp1 - cp2
    dp = s - e
    n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
    n2 = s[0] * e[1] - s[1] * e[0]
    denom = dc[0] * dp[1] - dc[1] * dp[0]
    n3 = 1.0 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.stack([(n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3])


def _clip_halfplane(verts, count, cp1, cp2):
    """One Sutherland-Hodgman pass against the (cp1 -> cp2) edge."""
    idx = jnp.arange(MAX_VERTS)
    valid = idx < count
    prev = jnp.where(idx == 0, count - 1, idx - 1)
    s = verts[prev]  # [16, 2]
    e = verts

    def inside(p):
        return (cp2[0] - cp1[0]) * (p[..., 1] - cp1[1]) > (
            cp2[1] - cp1[1]
        ) * (p[..., 0] - cp1[0])

    ins_s = inside(s)
    ins_e = inside(e)
    inter = jax.vmap(lambda a, b: _line_intersection(a, b, cp1, cp2))(s, e)

    emit_inter = (ins_s != ins_e) & valid
    emit_e = ins_e & valid
    counts = emit_inter.astype(jnp.int32) + emit_e.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts

    new_verts = jnp.zeros_like(verts)
    pos_inter = jnp.where(emit_inter, offsets, MAX_VERTS)
    pos_e = jnp.where(emit_e, offsets + emit_inter.astype(jnp.int32), MAX_VERTS)
    new_verts = new_verts.at[pos_inter].set(inter, mode="drop")
    new_verts = new_verts.at[pos_e].set(e, mode="drop")
    new_count = jnp.sum(counts)
    return new_verts, new_count


def convex_polygon_intersection_area(poly1, poly2):
    """Area of the intersection of two convex CCW quadrilaterals [4, 2]."""
    poly1 = _ensure_ccw(poly1)
    poly2 = _ensure_ccw(poly2)
    verts = jnp.zeros((MAX_VERTS, 2), poly1.dtype).at[:4].set(poly1)
    count = jnp.asarray(4, jnp.int32)
    for i in range(4):
        cp1 = poly2[i]
        cp2 = poly2[(i + 1) % 4]
        verts, count = _clip_halfplane(verts, count, cp1, cp2)
    area = _shoelace(verts, count)
    return jnp.where(count >= 3, jnp.abs(area), 0.0)


def box_3d_iou(corners1: jax.Array, corners2: jax.Array):
    """3D and BEV IoU of two 8-corner boxes (z up).

    Mirrors reference kitti360_operations.py:82-108: BEV rectangles from
    corners [3, 2, 1, 0] (x, y), vertical extent from corners 0 (top)
    and 4 (bottom). Returns ``(iou_3d, iou_bev)`` scalars; vmap for
    batches.
    """
    order = jnp.array([3, 2, 1, 0])
    rect1 = corners1[order][:, :2]
    rect2 = corners2[order][:, :2]

    area1 = jnp.abs(
        0.5
        * jnp.sum(
            rect1[:, 0] * jnp.roll(rect1[:, 1], 1)
            - rect1[:, 1] * jnp.roll(rect1[:, 0], 1)
        )
    )
    area2 = jnp.abs(
        0.5
        * jnp.sum(
            rect2[:, 0] * jnp.roll(rect2[:, 1], 1)
            - rect2[:, 1] * jnp.roll(rect2[:, 0], 1)
        )
    )

    inter_area = convex_polygon_intersection_area(rect1, rect2)
    inter_area = jnp.minimum(jnp.minimum(area1, area2), inter_area)
    iou_bev = inter_area / (area1 + area2 - inter_area)

    zmax = jnp.minimum(corners1[0, 2], corners2[0, 2])
    zmin = jnp.maximum(corners1[4, 2], corners2[4, 2])
    inter_vol = inter_area * jnp.clip(zmax - zmin, min=0.0)

    def volume(c):
        a = jnp.linalg.norm(c[0] - c[1])
        b = jnp.linalg.norm(c[1] - c[2])
        h = jnp.linalg.norm(c[0] - c[4])
        return a * b * h

    vol1 = volume(corners1)
    vol2 = volume(corners2)
    iou_3d = inter_vol / (vol1 + vol2 - inter_vol)
    return iou_3d, iou_bev
