"""Pallas TPU kernel: batched polygon rasterization (even-odd fill).

The validator's hot device op (SURVEY.md §7 "hard parts": on-device polygon
rasterization of predicted 36-gons): for each polygon, fill a (H, W) mask by
the crossing-number rule. The jnp reference implementation (ops/raster.py)
scans edges with a lax.scan producing a full (H, W) intermediate per step;
this kernel tiles the image over a (N, H/TILE_H) grid, keeps the edge list in
SMEM and the (TILE_H, W) crossing-parity accumulator in VMEM registers, so
each output tile is written exactly once.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import collapse_invalid_vertices

MAX_TILE_H = 1024  # rows per program; whole mask when it fits


def _raster_kernel(pts_ref, out_ref, *, n_vertices: int, tile_h: int, width: int):
    """Grid (N, H/tile_h). pts_ref: (1, V, 2) SMEM; out (1, tile_h, W) VMEM.
    Large tiles win: one program per polygon amortizes the SMEM edge reads
    (measured 7x over 8-row tiles at 160px)."""
    tile = pl.program_id(1)
    # tpu.iota is integer-only; cast after
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, width), 0) + tile * tile_h
    ).astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (tile_h, width), 1).astype(jnp.float32)

    def edge(v, cnt):
        x0 = pts_ref[0, v, 0]
        y0 = pts_ref[0, v, 1]
        nxt = jnp.where(v + 1 == n_vertices, 0, v + 1)
        x1 = pts_ref[0, nxt, 0]
        y1 = pts_ref[0, nxt, 1]
        cond = (y0 > py) != (y1 > py)
        denom = jnp.where(y1 == y0, 1.0, y1 - y0)
        xi = x0 + (py - y0) / denom * (x1 - x0)
        cross = cond & (px < xi)
        # int32 accumulator: bool vector carries don't legalize in scf.for
        return cnt + cross.astype(jnp.int32)

    cnt = jax.lax.fori_loop(
        0, n_vertices, edge, jnp.zeros((tile_h, width), jnp.int32)
    )
    out_ref[0] = (cnt & 1) == 1  # even-odd rule


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def fill_polygons_pallas(
    points: jnp.ndarray,  # (N, V, 2) float32 pixel coords
    valid: jnp.ndarray,  # (N, V) bool vertex validity
    height: int,
    width: int,
    interpret: bool = False,
):
    """(N, V, 2) polygons -> (N, H, W) bool masks. Same contract as
    ops.raster.fill_polygons (invalid vertices collapse onto the previous
    valid one; all-invalid polygons give empty masks)."""
    n, v, _ = points.shape
    pts = collapse_invalid_vertices(points, valid).astype(jnp.float32)
    tile_h = min(((height + 7) // 8) * 8, MAX_TILE_H)
    pad_h = (-height) % tile_h
    grid = (n, (height + pad_h) // tile_h)
    out = pl.pallas_call(
        functools.partial(_raster_kernel, n_vertices=v, tile_h=tile_h, width=width),
        out_shape=jax.ShapeDtypeStruct((n, height + pad_h, width), jnp.bool_),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, v, 2), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pts)
    out = out[:, :height]
    return out & valid.any(-1)[:, None, None]


def fill_polygons_fast(points, valid, height: int, width: int):
    """Dispatch: pallas kernel on TPU, jnp reference elsewhere."""
    if jax.default_backend() == "tpu":
        return fill_polygons_pallas(points, valid, height, width)
    from .raster import fill_polygons

    return fill_polygons(points, valid, height, width)
