"""Pallas TPU kernel: GT polar-ray construction (the training hot loop).

The assigner computes, for every candidate (gt, anchor) pair, 36 GT rays from
the 360-point contour via angle binning (ops/polar.py:_gt_rays_dense). The
dense jnp version materializes (chunk, 36, 360) diff/topk intermediates in
HBM — measured as the dominant cost of the polar train step (~4x the detect
step). This kernel works per pair with the whole (36, 360) working set in
VMEM as strictly 2D tiles (3D non-128-aligned tiles stall the Mosaic
compiler), replacing lax.top_k with ANGLE_TOPK iterative masked-min sweeps.

Numerics notes:
  - atan2/atan have no Mosaic lowering: octant-reduced degree-9 minimax
    polynomial (max err ~1e-5 rad = 0.0006 deg, four orders below the 3-deg
    angle gate).
  - top-k vs masked-min sweeps: identical result except when >k points tie in
    angle at float32 exactness AND index order matters — parity tests pass.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .polar import (
    ANGLE_GAP_DEG,
    ANGLE_TOPK,
    NUM_CONTOUR_POINTS,
    NUM_RAYS,
    RAY_EPS,
    RAY_STEP_DEG,
)

_INF = 1e9


def _atan2(y, x):
    pi = math.pi
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.where(mx == 0.0, 1.0, mx)  # [0, 1]
    z2 = z * z
    a = z * (
        0.9998660
        + z2 * (-0.3302995 + z2 * (0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351)))
    )
    a = jnp.where(ay > ax, pi / 2 - a, a)
    a = jnp.where(x < 0.0, pi - a, a)
    a = jnp.where(y < 0.0, -a, a)
    return jnp.where(mx == 0.0, 0.0, a)


PAIRS_PER_PROG = 8  # block sublane constraint: multiples of 8


def _gt_rays_kernel(cx_ref, cy_ref, ctr_ref, out_ref):
    """Blocks: cx/cy (8, 360) VMEM, ctr (8, 2) SMEM, out (8, 36) VMEM.
    Statically-unrolled loop over the 8 pairs keeps every tensor 2D."""
    theta = (
        jax.lax.broadcasted_iota(jnp.int32, (NUM_RAYS, NUM_CONTOUR_POINTS), 0)
        .astype(jnp.float32)
        * RAY_STEP_DEG
    )
    for j in range(PAIRS_PER_PROG):
        vx = cx_ref[j : j + 1, :] - ctr_ref[j, 0]  # (1, 360)
        vy = cy_ref[j : j + 1, :] - ctr_ref[j, 1]
        ang = _atan2(vy, vx) * (180.0 / math.pi)
        ang = jnp.where(ang < 0, ang + 360.0, ang)
        dist = jnp.sqrt(vx * vx + vy * vy)

        diff = jnp.abs(jnp.broadcast_to(ang, (NUM_RAYS, NUM_CONTOUR_POINTS)) - theta)
        diff = jnp.where(diff > 180.0, 360.0 - diff, diff)
        dist_b = jnp.broadcast_to(dist, (NUM_RAYS, NUM_CONTOUR_POINTS))

        def sweep(k, carry):
            diff_m, best_dist, min_gap = carry
            mn = diff_m.min(axis=-1, keepdims=True)  # (36, 1)
            sel = diff_m <= mn
            best_dist = jnp.maximum(
                best_dist, jnp.where(sel, dist_b, -_INF).max(-1, keepdims=True)
            )
            min_gap = jnp.where(k == 0, mn, min_gap)
            diff_m = jnp.where(sel, _INF, diff_m)
            return diff_m, best_dist, min_gap

        init = (
            diff,
            jnp.full((NUM_RAYS, 1), -_INF, jnp.float32),
            jnp.zeros((NUM_RAYS, 1), jnp.float32),
        )
        _, best_dist, min_gap = jax.lax.fori_loop(0, ANGLE_TOPK, sweep, init)
        rays = jnp.where(min_gap > ANGLE_GAP_DEG, RAY_EPS, best_dist)  # (36, 1)
        out_ref[j, :] = jnp.clip(rays, RAY_EPS, None).reshape(NUM_RAYS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gt_rays_pallas(contour: jnp.ndarray, center: jnp.ndarray, interpret: bool = False):
    """(P, 360, 2), (P, 2) -> (P, 36). Same contract as
    ops/polar.py:gt_rays_from_contour."""
    P = contour.shape[0]
    pad = (-P) % PAIRS_PER_PROG
    contour_p = jnp.pad(contour.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    center_p = jnp.pad(center.astype(jnp.float32), ((0, pad), (0, 0)))
    cx = contour_p[..., 0]  # (P', 360)
    cy = contour_p[..., 1]
    out = pl.pallas_call(
        _gt_rays_kernel,
        out_shape=jax.ShapeDtypeStruct((P + pad, NUM_RAYS), jnp.float32),
        grid=((P + pad) // PAIRS_PER_PROG,),
        in_specs=[
            pl.BlockSpec((PAIRS_PER_PROG, NUM_CONTOUR_POINTS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIRS_PER_PROG, NUM_CONTOUR_POINTS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIRS_PER_PROG, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((PAIRS_PER_PROG, NUM_RAYS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cx, cy, center_p)
    return out[:P]


def gt_rays_fast(contour, center, chunk: int = 4096):
    """Dispatch: Pallas kernel on TPU, chunked jnp reference elsewhere."""
    if jax.default_backend() == "tpu":
        return gt_rays_pallas2(contour, center)
    from .polar import gt_rays_from_contour

    return gt_rays_from_contour(contour, center, chunk=chunk)


# --- v3: row-shared contours + block skipping --------------------------------
# The assigner's pairs are (gt row, candidate anchor) with K candidates per
# row sharing ONE contour. v2 takes per-pair contours, so the caller
# materializes a broadcast (B, N, K, 360, 2) tensor — 283 MB of HBM traffic
# at B=16, N=48, K=128. v3 fetches each row's contour once via the BlockSpec
# index map (i*8 // K) — K/8 x less input DMA — and takes a per-block
# validity flag: candidates are ranked in-box-first (tal.py cand_key), so
# valid pairs form a PREFIX of every K-row and whole 8-pair blocks of padding
# skip all compute via pl.when (this is what kills the n_max=48 train-step
# cliff: padded GT rows cost ~nothing).

PAIRS_PER_PROG3 = 8
_ROWS3 = PAIRS_PER_PROG3 * NUM_RAYS  # 288


def _gt_rays_kernel3(flag_ref, cx_ref, cy_ref, ctr_ref, out_ref, diff_ref,
                     dist_ref, *, pairs_per_row: int):
    """Blocks: flag (8, 1) SMEM per-pair validity; cx/cy (8, 360) VMEM — an
    ALIGNED 8-row window of contours (Mosaic requires 8-sublane tiles); the
    program's row is selected dynamically inside; ctr (8, 2) SMEM; out
    (288, 1) VMEM. The block is active when ANY of its 8 pairs is valid."""
    any_valid = sum(flag_ref[j, 0] for j in range(PAIRS_PER_PROG3))
    i = pl.program_id(0)
    row = (i * PAIRS_PER_PROG3) // pairs_per_row
    sub = row % 8  # position inside the aligned 8-row window

    @pl.when(any_valid > 0)
    def _active():
        # per-pair setup writes the WRAPPED angular difference directly
        # ((36, 360) slices) — one pass, vs storing raw angles and
        # re-walking the full (288, 360) matrix to wrap them
        theta36 = jax.lax.broadcasted_iota(
            jnp.int32, (NUM_RAYS, NUM_CONTOUR_POINTS), 0
        ).astype(jnp.float32) * RAY_STEP_DEG

        cx_row = cx_ref[pl.ds(sub, 1), :]  # (1, 360)
        cy_row = cy_ref[pl.ds(sub, 1), :]
        for j in range(PAIRS_PER_PROG3):
            vx = cx_row - ctr_ref[j, 0]  # (1, 360)
            vy = cy_row - ctr_ref[j, 1]
            ang = _atan2(vy, vx) * (180.0 / math.pi)
            ang = jnp.where(ang < 0, ang + 360.0, ang)
            d = jnp.sqrt(vx * vx + vy * vy)
            lo = j * NUM_RAYS
            dj = jnp.abs(
                jnp.broadcast_to(ang, (NUM_RAYS, NUM_CONTOUR_POINTS)) - theta36
            )
            diff_ref[lo : lo + NUM_RAYS, :] = jnp.where(dj > 180.0, 360.0 - dj, dj)
            dist_ref[lo : lo + NUM_RAYS, :] = jnp.broadcast_to(
                d, (NUM_RAYS, NUM_CONTOUR_POINTS)
            )

        diff = diff_ref[...]
        dist_b = dist_ref[...]

        def sweep(k, carry):
            diff_m, best_dist, min_gap = carry
            mn = diff_m.min(axis=-1, keepdims=True)
            sel = diff_m <= mn
            best_dist = jnp.maximum(
                best_dist, jnp.where(sel, dist_b, -_INF).max(-1, keepdims=True)
            )
            min_gap = jnp.where(k == 0, mn, min_gap)
            diff_m = jnp.where(sel, _INF, diff_m)
            return diff_m, best_dist, min_gap

        init = (
            diff,
            jnp.full((_ROWS3, 1), -_INF, jnp.float32),
            jnp.zeros((_ROWS3, 1), jnp.float32),
        )
        _, best_dist, min_gap = jax.lax.fori_loop(0, ANGLE_TOPK, sweep, init)
        rays = jnp.where(min_gap > ANGLE_GAP_DEG, RAY_EPS, best_dist)
        out_ref[...] = jnp.clip(rays, RAY_EPS, None)

    @pl.when(any_valid == 0)
    def _skip():
        # padding block: write the 'invisible ray' sentinel so downstream
        # masked math sees finite values (never garbage VMEM)
        out_ref[...] = jnp.full((_ROWS3, 1), RAY_EPS, jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gt_rays_pallas3(contour_rows: jnp.ndarray, centers: jnp.ndarray,
                    valid: jnp.ndarray, interpret: bool = False):
    """(R, 360, 2) row contours, (R, K, 2) per-pair centers, (R, K) validity
    -> (R, K, 36). K must be a multiple of 8 (caller pads; tal.py does)."""
    R, K = centers.shape[:2]
    assert K % PAIRS_PER_PROG3 == 0, f"K={K} not a multiple of {PAIRS_PER_PROG3}"
    nblocks = R * K // PAIRS_PER_PROG3
    # per-PAIR flags, (R*K, 1): SMEM blocks must be (8, 1)-tileable
    flags = valid.reshape(R * K, 1).astype(jnp.int32)
    padr = (-R) % 8  # contour rows padded so 8-row windows stay in bounds
    cxy = jnp.pad(contour_rows.astype(jnp.float32), ((0, padr), (0, 0), (0, 0)))
    cx = cxy[..., 0]  # (R8, 360)
    cy = cxy[..., 1]
    ctr = centers.reshape(R * K, 2).astype(jnp.float32)
    kpb = PAIRS_PER_PROG3

    out = pl.pallas_call(
        functools.partial(_gt_rays_kernel3, pairs_per_row=K),
        out_shape=jax.ShapeDtypeStruct((R * K * NUM_RAYS, 1), jnp.float32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((PAIRS_PER_PROG3, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, NUM_CONTOUR_POINTS), lambda i: ((i * kpb) // K // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NUM_CONTOUR_POINTS), lambda i: ((i * kpb) // K // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIRS_PER_PROG3, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS3, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_ROWS3, NUM_CONTOUR_POINTS), jnp.float32),
            pltpu.VMEM((_ROWS3, NUM_CONTOUR_POINTS), jnp.float32),
        ],
        interpret=interpret,
    )(flags, cx, cy, ctr)
    return out.reshape(R, K, NUM_RAYS)


def gt_rays_rows_fast(contour_rows, centers, valid, chunk: int = 4096,
                      interpret: bool = False):
    """Row-shared dispatch (assigner entry): TPU -> v3 kernel with padding
    skip; elsewhere -> dense reference math on the flattened pairs. Pads K up
    to a multiple of 8 internally."""
    R, K = centers.shape[:2]
    padk = (-K) % PAIRS_PER_PROG3
    if jax.default_backend() == "tpu" or interpret:
        if padk:
            centers = jnp.pad(centers, ((0, 0), (0, padk), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, padk)))
        return gt_rays_pallas3(contour_rows, centers, valid,
                               interpret=interpret)[:, :K]
    from .polar import gt_rays_from_contour

    pairs = jnp.broadcast_to(
        contour_rows[:, None], (R, K) + contour_rows.shape[1:]
    ).reshape(R * K, NUM_CONTOUR_POINTS, 2)
    return gt_rays_from_contour(
        pairs, centers.reshape(R * K, 2), chunk=chunk
    ).reshape(R, K, NUM_RAYS)


# --- v2: all pairs of a block swept as ONE (8*36, 360) matrix ----------------
# The v1 kernel unrolls 8 pairs x ANGLE_TOPK sweeps as ~200 small (36, 360)
# VPU ops per program; dispatch overhead dominates (measured 77 ms for the
# batch-16 train step's 98k pairs). v2 stacks the 8 pairs' (36, 360) working
# sets into one (288, 360) matrix in VMEM scratch, so each sweep is 1 big op:
# same numerics, ~3x faster end-to-end.

PAIRS_PER_PROG2 = 8  # block size: 8 measured faster than 16 (31.6 vs 33.0 ms)
_ROWS2 = PAIRS_PER_PROG2 * NUM_RAYS  # 288


def _gt_rays_kernel2(cx_ref, cy_ref, ctr_ref, out_ref, diff_ref, dist_ref):
    theta_row = (
        jax.lax.broadcasted_iota(jnp.int32, (_ROWS2, NUM_CONTOUR_POINTS), 0)
        % NUM_RAYS
    ).astype(jnp.float32) * RAY_STEP_DEG

    for j in range(PAIRS_PER_PROG2):  # cheap fill: stores of (36, 360)
        vx = cx_ref[j : j + 1, :] - ctr_ref[j, 0]  # (1, 360)
        vy = cy_ref[j : j + 1, :] - ctr_ref[j, 1]
        ang = _atan2(vy, vx) * (180.0 / math.pi)
        ang = jnp.where(ang < 0, ang + 360.0, ang)
        d = jnp.sqrt(vx * vx + vy * vy)
        lo = j * NUM_RAYS
        diff_ref[lo : lo + NUM_RAYS, :] = jnp.broadcast_to(
            ang, (NUM_RAYS, NUM_CONTOUR_POINTS)
        )
        dist_ref[lo : lo + NUM_RAYS, :] = jnp.broadcast_to(
            d, (NUM_RAYS, NUM_CONTOUR_POINTS)
        )

    diff = jnp.abs(diff_ref[...] - theta_row)
    diff = jnp.where(diff > 180.0, 360.0 - diff, diff)
    dist_b = dist_ref[...]

    def sweep(k, carry):
        diff_m, best_dist, min_gap = carry
        mn = diff_m.min(axis=-1, keepdims=True)  # (288, 1)
        sel = diff_m <= mn
        best_dist = jnp.maximum(
            best_dist, jnp.where(sel, dist_b, -_INF).max(-1, keepdims=True)
        )
        min_gap = jnp.where(k == 0, mn, min_gap)
        diff_m = jnp.where(sel, _INF, diff_m)
        return diff_m, best_dist, min_gap

    init = (
        diff,
        jnp.full((_ROWS2, 1), -_INF, jnp.float32),
        jnp.zeros((_ROWS2, 1), jnp.float32),
    )
    _, best_dist, min_gap = jax.lax.fori_loop(0, ANGLE_TOPK, sweep, init)
    rays = jnp.where(min_gap > ANGLE_GAP_DEG, RAY_EPS, best_dist)  # (288, 1)
    out_ref[...] = jnp.clip(rays, RAY_EPS, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gt_rays_pallas2(contour: jnp.ndarray, center: jnp.ndarray, interpret: bool = False):
    """(P, 360, 2), (P, 2) -> (P, 36). Same contract as gt_rays_pallas."""
    P = contour.shape[0]
    pad = (-P) % PAIRS_PER_PROG2
    contour_p = jnp.pad(contour.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    center_p = jnp.pad(center.astype(jnp.float32), ((0, pad), (0, 0)))
    cx = contour_p[..., 0]
    cy = contour_p[..., 1]
    Pp = P + pad
    out = pl.pallas_call(
        _gt_rays_kernel2,
        out_shape=jax.ShapeDtypeStruct((Pp * NUM_RAYS, 1), jnp.float32),
        grid=(Pp // PAIRS_PER_PROG2,),
        in_specs=[
            pl.BlockSpec((PAIRS_PER_PROG2, NUM_CONTOUR_POINTS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIRS_PER_PROG2, NUM_CONTOUR_POINTS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIRS_PER_PROG2, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS2, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_ROWS2, NUM_CONTOUR_POINTS), jnp.float32),
            pltpu.VMEM((_ROWS2, NUM_CONTOUR_POINTS), jnp.float32),
        ],
        interpret=interpret,
    )(cx, cy, center_p)
    return out.reshape(Pp, NUM_RAYS)[:P]
