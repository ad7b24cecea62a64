"""Device-side augmentation — the jitted train-time transform stage.

TPU-native replacement for the reference's dataloader-worker augmentation
(data/build.py:93 worker processes running augment.py:918 v8_transforms):
on a 1-CPU TPU host the cv2 pipeline peaks at ~50 img/s against a >500 img/s
train step, so training is input-bound (VERDICT r2 missing #2). Here the host
does ONLY JPEG decode + letterbox + label padding; mosaic-4, the affine/
perspective warp, MixUp, HSV jitter and flips run on device as one fused XLA
program folded into the train step.

Key design points (not a port of augment.py — a gather re-formulation):

* **Mosaic + affine = ONE gather.** The reference materializes a (2S, 2S)
  canvas (augment.py:155) then warps it back to (S, S) (augment.py:289).
  Fused: for every output pixel, the inverse warp gives canvas coordinates;
  the mosaic center (yc, xc) splits the canvas into 4 quadrants, each owned
  by one source tile with a fixed offset (content-corner alignment, matching
  the reference's corner-at-center placement); one bilinear gather from the
  (4, S, S, 3) tile stack produces the pixel. No canvas is ever materialized.
* **In-batch mosaic sourcing.** The reference samples mosaic partners from a
  dataset-wide buffer (base.py:23 buffer); here partners are drawn from the
  current batch (the loader already shuffles globally), so the device fn
  needs no extra image traffic.
* **Labels ride as fixed-shape tensors.** Contours (N, 360, 2) transform by
  a single matmul with the same 3x3 matrix; the 4-tile merge concatenates to
  4N candidates and caps back to N_out by validity+area priority.
* Skipped vs the host pipeline (documented cuts, all default-off in
  cfg/default.yaml): mosaic9 (`mosaic9: 0`), copy_paste (`copy_paste: 0`),
  and the p=0.01 pixel augs (Blur/MedianBlur/ToGray/CLAHE). The trainer
  falls back to the host pipeline when any of these is enabled.

Reference semantics covered: Mosaic4 augment.py:118-208, RandomPerspective
augment.py:289-508 (incl. box_candidates filter + segment-aware warp),
MixUp augment.py:270-286 (beta(32,32)), RandomHSV augment.py:511-534,
RandomFlip augment.py:536-568.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0  # letterbox / warp border gray (reference augment.py:586)

# axis-aligned warp implementation: "matmul" (scale_and_translate dense
# resample) or "taps" (2-tap axis gathers — same math, no dense weight
# matrix). Env-switchable for on-chip A/B (AUG_WARP=taps).
import os as _os

_SEPARABLE_IMPL = _os.environ.get("AUG_WARP", "matmul")


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------

def rgb_to_hsv(rgb):
    """rgb in [0,1] (..., 3) -> h in [0,1), s, v."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, -1)
    mn = jnp.min(rgb, -1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    ) / 6.0
    h = jnp.where(d > 0, h, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], -1)


def hsv_jitter(img, key, hgain, sgain, vgain):
    """Multiplicative HSV gains, hue wraps (reference augment.py:511: LUTs
    hue*r%180, clip(sat*r), clip(val*r)). img (..., 3) RGB in [0,1]."""
    r = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    # keep the whole-image math in the image's dtype (bf16 on the warp
    # path): a silent f32 promotion here doubles the HBM traffic of every
    # full-image pass
    r = (r * jnp.asarray([hgain, sgain, vgain]) + 1.0).astype(img.dtype)
    h, s, v = rgb_to_hsv(img)
    h = (h * r[0]) % 1.0
    s = jnp.clip(s * r[1], 0.0, 1.0)
    v = jnp.clip(v * r[2], 0.0, 1.0)
    return hsv_to_rgb(h, s, v)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _tile_offsets(yc, xc, content_hw, pads, S):
    """Canvas position of each tile's (0,0) pixel under the reference's
    corner-at-center placement (augment.py:163-186): tile q's content corner
    nearest the mosaic center lands exactly on (yc, xc). content_hw (4,2)
    (ch, cw); pads (4,2) (py, px). Returns (4,2) (oy, ox)."""
    ch, cw = content_hw[:, 0], content_hw[:, 1]
    py, px = pads[:, 0], pads[:, 1]
    oy = jnp.stack([yc - py[0] - ch[0], yc - py[1] - ch[1], yc - py[2], yc - py[3]])
    ox = jnp.stack([xc - px[0] - cw[0], xc - px[1], xc - px[2] - cw[2], xc - px[3]])
    return jnp.stack([oy, ox], -1)


def _warp_image_separable(tiles, M, yc, xc, offsets, use_mosaic, S,
                          dtype=jnp.bfloat16):
    """Fast path of ``_warp_image`` for axis-aligned affines (the DEFAULT
    hyp: degrees=shear=perspective=0, so M is diag(a, a) + translation).

    The gather version costs 4 bilinear taps x S^2 random-index gathers per
    image — the single worst op class on TPU (runs/e2e_diag.json). With a
    separable transform each tile's resample is two dense (S_in, S_out)
    weight matmuls (jax.image.scale_and_translate), pure MXU work, and the
    mosaic quadrant choice is an elementwise select of the 4 resampled
    planes. Border semantics match the gather version exactly: bilinear
    coverage c of in-tile taps is resampled from a ones-plane and the gray
    border folds in as ``st(tile) + PAD * (1 - c)``; out-of-canvas pixels
    are PAD. Equivalence is pinned by test_device_augment.

    ``dtype`` is the resample compute precision. The dense
    scale_and_translate weight matmuls are ~17 GFLOP per 640px image — more
    than the n-model forward — so they default to bf16 (4x the f32 MXU rate,
    half the HBM): uint8 pixel values up to 255 round to within 1 LSB in
    bf16, augmentation-grade noise. Pass f32 for the bit-exactness tests.
    """
    a = M[0, 0]  # == M[1, 1] on this path
    bx, by = M[0, 2], M[1, 2]
    L = jnp.where(use_mosaic, 2.0 * S, 1.0 * S)
    o = jnp.arange(S, dtype=jnp.float32)
    cx = (o - bx) / a  # canvas coord of each output column / row
    cy = (o - by) / a
    in_x = (cx >= 0) & (cx < L)
    in_y = (cy >= 0) & (cy < L)
    qx = (cx >= xc) & use_mosaic  # right half
    qy = (cy >= yc) & use_mosaic  # bottom half
    q = qy[:, None].astype(jnp.int32) * 2 + qx[None, :].astype(jnp.int32)

    scale = jnp.stack([a, a])
    # 1px PAD ring: scale_and_translate zeroes any output whose sample
    # center is outside [-0.5, S-0.5], but the gather version still blends
    # partial edge taps in the [-1, -0.5) ring — materializing the border
    # pixel makes the resample exact there (the coverage term below handles
    # everything further out)
    tiles_p = jnp.pad(
        tiles.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)),
        constant_values=PAD_VALUE,
    )
    # output o samples tile coord s = (o - b)/a - off, while
    # scale_and_translate samples i = (o + 0.5)/scale - 0.5 - t/scale
    # (half-pixel-center convention, probed empirically) — equate, then
    # shift by one source pixel for the PAD ring: t = b + a*(off - 1)
    # + 0.5*(1 - a)
    half = 0.5 * (1.0 - a)
    trs = jnp.stack([by + a * (offsets[:, 0] - 1.0) + half,
                     bx + a * (offsets[:, 1] - 1.0) + half], -1)  # (4, 2)

    def resample_tile(tile_p, tr):
        return jax.image.scale_and_translate(
            tile_p, (S, S, 3), (0, 1), scale, tr,
            method="linear", antialias=False,
        )

    st = jax.vmap(resample_tile)(tiles_p, trs)  # (4, S, S, 3)

    # coverage over the PADDED extent (the ring is materialized, so it
    # counts as covered; only weight falling beyond S+2 turns into PAD).
    # An axis-aligned resample of a ones-plane is rank-1 — the outer
    # product of the two 1-D axis coverages — so compute two (4, S)
    # vectors instead of a full (4, S, S) second resample (~25% of the
    # warp FLOPs for free; linear weights are per-axis, so this is exact
    # up to summation order).
    ones_1d = jnp.ones((S + 2, 1), dtype)

    def cov_axis(t1):
        return jax.image.scale_and_translate(
            ones_1d, (S, 1), (0,), scale[:1], t1[None],
            method="linear", antialias=False,
        )[:, 0]

    cov_y = jax.vmap(cov_axis)(trs[:, 0])  # (4, S)
    cov_x = jax.vmap(cov_axis)(trs[:, 1])  # (4, S)
    cov = cov_y[:, :, None] * cov_x[:, None, :]  # (4, S, S)
    stacked = st + PAD_VALUE * (1.0 - cov)[..., None]  # (4, S, S, 3)
    out = jnp.where((q == 0)[..., None], stacked[0],
          jnp.where((q == 1)[..., None], stacked[1],
          jnp.where((q == 2)[..., None], stacked[2], stacked[3])))
    ok = (in_y[:, None] & in_x[None, :])[..., None]
    return jnp.where(ok, out, PAD_VALUE)


def _warp_image_separable_taps(tiles, M, yc, xc, offsets, use_mosaic, S,
                               dtype=jnp.bfloat16):
    """``_warp_image_separable`` with the dense resample matmuls replaced by
    per-axis 2-tap gathers.

    A linear antialias=False resample has exactly two nonzero weights per
    output row/column, so the (S_out, S_in) scale_and_translate weight
    matrix is 99.7% zeros at S=640 — the matmul form burns ~17 GFLOP/img of
    MXU time moving zeros. Here each axis is two whole-row (or whole-column)
    gathers + a blend: indices depend only on the output coordinate, so the
    gathers are contiguous slices along the other axis (the fast TPU gather
    shape, unlike per-pixel 2-D gathers). Border semantics are identical:
    same 1px PAD ring, per-axis coverage from the in-range tap weights,
    PAD fold, quadrant select, canvas clip. Numerics match the matmul form
    to summation order (pinned by test_device_augment)."""
    a = M[0, 0]
    bx, by = M[0, 2], M[1, 2]
    L = jnp.where(use_mosaic, 2.0 * S, 1.0 * S)
    o = jnp.arange(S, dtype=jnp.float32)
    cx = (o - bx) / a
    cy = (o - by) / a
    in_x = (cx >= 0) & (cx < L)
    in_y = (cy >= 0) & (cy < L)
    qx = (cx >= xc) & use_mosaic
    qy = (cy >= yc) & use_mosaic
    q = qy[:, None].astype(jnp.int32) * 2 + qx[None, :].astype(jnp.int32)

    # gathers read the compact dtype; BLENDS run in f32 so the result sees
    # exactly one rounding to ``dtype`` (like the matmul form, whose MXU
    # accumulation is f32) — blending in bf16 compounds to ~2.5 uint8 LSB
    tiles_p = jnp.pad(
        tiles.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)),
        constant_values=PAD_VALUE,
    )  # (4, S+2, S+2, 3)
    half = 0.5 * (1.0 - a)
    trs = jnp.stack([by + a * (offsets[:, 0] - 1.0) + half,
                     bx + a * (offsets[:, 1] - 1.0) + half], -1)  # (4, 2)

    def taps(t1):
        # scale_and_translate sampling convention: i = (o + 0.5)/a - 0.5 - t/a
        i = (o + 0.5) / a - 0.5 - t1 / a
        i0 = jnp.floor(i)
        f = i - i0
        ok0 = (i0 >= 0) & (i0 <= S + 1)
        ok1 = (i0 + 1 >= 0) & (i0 + 1 <= S + 1)
        idx0 = jnp.clip(i0, 0, S + 1).astype(jnp.int32)
        idx1 = jnp.clip(i0 + 1, 0, S + 1).astype(jnp.int32)
        w0 = (1.0 - f) * ok0.astype(jnp.float32)
        w1 = f * ok1.astype(jnp.float32)
        return idx0, idx1, w0, w1

    def resample_tile(tile_p, tr):
        # axis 0 (rows): gather whole rows, blend in f32
        iy0, iy1, wy0, wy1 = taps(tr[0])
        r = (jnp.take(tile_p, iy0, axis=0).astype(jnp.float32)
             * wy0[:, None, None]
             + jnp.take(tile_p, iy1, axis=0).astype(jnp.float32)
             * wy1[:, None, None])
        # axis 1 (columns) on the (S, S+2, 3) f32 intermediate
        ix0, ix1, wx0, wx1 = taps(tr[1])
        out = (jnp.take(r, ix0, axis=1) * wx0[None, :, None]
               + jnp.take(r, ix1, axis=1) * wx1[None, :, None])
        cov = (wy0 + wy1)[:, None] * (wx0 + wx1)[None, :]  # (S, S)
        return out, cov

    st, cov = jax.vmap(resample_tile)(tiles_p, trs)  # (4, S, S, 3), (4, S, S)
    stacked = st + PAD_VALUE * (1.0 - cov)[..., None]
    out = jnp.where((q == 0)[..., None], stacked[0],
          jnp.where((q == 1)[..., None], stacked[1],
          jnp.where((q == 2)[..., None], stacked[2], stacked[3])))
    ok = (in_y[:, None] & in_x[None, :])[..., None]
    return jnp.where(ok, out, PAD_VALUE).astype(dtype)


def _warp_image(tiles, Minv, yc, xc, offsets, use_mosaic, S):
    """Fused mosaic+affine gather. tiles (4, S, S, 3) uint8 -> (S, S, 3) f32.

    For each output pixel: inverse-warp to canvas coords, pick the owning
    quadrant's tile (mosaic) or tile 0 (plain), bilinear-sample with gray
    border — one pass, no canvas."""
    # cv2.warpAffine convention: integer pixel grid, dst(x,y) = src(Minv @ (x,y,1))
    ys, xs = jnp.mgrid[0:S, 0:S]
    ones = jnp.ones_like(xs, jnp.float32)
    pts = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32), ones])
    c = jnp.einsum("ij,jhw->ihw", Minv, pts)
    cx = c[0] / c[2]
    cy = c[1] / c[2]

    L = jnp.where(use_mosaic, 2.0 * S, 1.0 * S)
    in_canvas = (cx >= 0) & (cx < L) & (cy >= 0) & (cy < L)

    q = jnp.where(use_mosaic, (cy >= yc).astype(jnp.int32) * 2 + (cx >= xc).astype(jnp.int32), 0)
    off = offsets[q]  # (S, S, 2) (oy, ox); identity (0) rows pre-set for plain
    sx = cx - off[..., 1]
    sy = cy - off[..., 0]

    # bilinear: 4 taps, out-of-tile taps read the gray border
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = tiles.reshape(-1, 3).astype(jnp.float32)  # (4*S*S, 3)

    def tap(yi, xi):
        ok = (xi >= 0) & (xi < S) & (yi >= 0) & (yi < S) & in_canvas
        idx = q * (S * S) + jnp.clip(yi, 0, S - 1) * S + jnp.clip(xi, 0, S - 1)
        v = flat[idx.reshape(-1)].reshape(S, S, 3)
        return jnp.where(ok[..., None], v, PAD_VALUE)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx[..., None]) + v01 * fx[..., None]
    bot = v10 * (1 - fx[..., None]) + v11 * fx[..., None]
    return top * (1 - fy[..., None]) + bot * fy[..., None]


def _warp_points(pts, M):
    """(..., 2) points through a 3x3 (perspective-safe)."""
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    p = jnp.concatenate([pts, ones], -1) @ M.T
    return p[..., :2] / jnp.where(jnp.abs(p[..., 2:3]) > 1e-9, p[..., 2:3], 1.0)


def _box_candidates(wh_before, wh_after, area_thr=0.01, wh_thr=2.0, ar_thr=100.0, eps=1e-16):
    """Keep filter after the warp (reference augment.py:489 box_candidates)."""
    w1, h1 = wh_before[..., 0], wh_before[..., 1]
    w2, h2 = wh_after[..., 0], wh_after[..., 1]
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (
        (w2 > wh_thr) & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)
    )


# ---------------------------------------------------------------------------
# the per-sample transform (vmapped over batch)
# ---------------------------------------------------------------------------

def _augment_one(key, tiles, t_cls, t_boxes, t_segs, t_mask, t_kpts,
                 content_hw, pads, hyp, S, n_out):
    """tiles (4,S,S,3) uint8; t_* stacked labels of the 4 tiles:
    cls (4,N), boxes (4,N,4) normalized xywh, segs (4,N,360,2) normalized,
    mask (4,N) bool, kpts (4,N,K,3) normalized or None.
    Returns dict with N=n_out instances, image f32 RGB-order-as-input."""
    k_mosaic, k_center, k_aff = jax.random.split(key, 3)
    p_mosaic = float(getattr(hyp, "mosaic", 1.0) or 0.0)
    use_mosaic = jax.random.uniform(k_mosaic) < p_mosaic

    cyx = jax.random.uniform(k_center, (2,), minval=0.5 * S, maxval=1.5 * S)
    yc = jnp.where(use_mosaic, cyx[0], 0.0)
    xc = jnp.where(use_mosaic, cyx[1], 0.0)

    in_size = jnp.where(use_mosaic, 2.0 * S, 1.0 * S)
    M, _sc = _affine_matrix_dyn(k_aff, S, in_size, hyp)

    offs = _tile_offsets(yc, xc, content_hw.astype(jnp.float32), pads.astype(jnp.float32), S)
    offs = jnp.where(use_mosaic, offs, jnp.zeros_like(offs))
    # axis-aligned affine (default hyp) -> separable matmul resample instead
    # of per-pixel gathers (see _warp_image_separable)
    separable = all(
        float(getattr(hyp, k, 0.0) or 0.0) == 0.0
        for k in ("degrees", "shear", "perspective")
    )
    if separable:
        warp = (_warp_image_separable_taps if _SEPARABLE_IMPL == "taps"
                else _warp_image_separable)
        img = warp(tiles, M, yc, xc, offs, use_mosaic, S)
    else:
        img = _warp_image(tiles, jnp.linalg.inv(M), yc, xc, offs, use_mosaic, S)

    # ---- labels: tile frame -> canvas -> output --------------------------
    N = t_cls.shape[1]
    tile_valid = t_mask & (use_mosaic | (jnp.arange(4) == 0)[:, None])  # plain: tile0 only

    segs_px = t_segs * S  # tile px
    segs_canvas = segs_px + offs[:, None, None, ::-1]  # (+ox on x, +oy on y)
    has_seg = jnp.abs(t_segs).sum((-1, -2)) > 1e-6  # (4, N)

    # pre-warp canvas-frame extent (for the candidates filter)
    seg_min = segs_canvas.min(-2)
    seg_max = segs_canvas.max(-2)
    bx_px = t_boxes * S  # xywh tile px
    corners = jnp.stack([
        bx_px[..., :2] - bx_px[..., 2:] / 2, bx_px[..., :2] + bx_px[..., 2:] / 2,
    ], -2)  # (4, N, 2, 2) [min, max]
    box_min = corners[..., 0, :] + offs[:, None, ::-1]
    box_max = corners[..., 1, :] + offs[:, None, ::-1]
    pre_min = jnp.where(has_seg[..., None], seg_min, box_min)
    pre_max = jnp.where(has_seg[..., None], seg_max, box_max)
    wh_before = pre_max - pre_min

    # warp segments
    segs_out = _warp_points(segs_canvas, M)
    segs_out = jnp.clip(segs_out, 0.0, S)
    # warp box corners for no-segment instances (reference augment.py:440)
    c4 = jnp.stack([
        box_min,
        jnp.stack([box_max[..., 0], box_min[..., 1]], -1),
        box_max,
        jnp.stack([box_min[..., 0], box_max[..., 1]], -1),
    ], -2)  # (4, N, 4, 2)
    c4w = _warp_points(c4, M)
    bmin_w = jnp.clip(c4w.min(-2), 0.0, S)
    bmax_w = jnp.clip(c4w.max(-2), 0.0, S)

    smin = segs_out.min(-2)
    smax = segs_out.max(-2)
    out_min = jnp.where(has_seg[..., None], smin, bmin_w)
    out_max = jnp.where(has_seg[..., None], smax, bmax_w)
    wh_after = out_max - out_min
    keep = tile_valid & _box_candidates(wh_before, wh_after)

    out_boxes = jnp.concatenate([(out_min + out_max) / 2, out_max - out_min], -1)

    if t_kpts is not None:
        kxy = t_kpts[..., :2] * S + offs[:, None, None, ::-1]
        kxy = _warp_points(kxy, M)
        out_of = (
            (kxy[..., 0] < 0) | (kxy[..., 0] > S) | (kxy[..., 1] < 0) | (kxy[..., 1] > S)
        )
        kvis = jnp.where(out_of, 0.0, t_kpts[..., 2])
        kpts_out = jnp.concatenate([kxy, kvis[..., None]], -1)  # px
    else:
        kpts_out = None

    # ---- merge 4N -> n_out by validity, then area ------------------------
    flat = lambda a: a.reshape((4 * N,) + a.shape[2:])
    keep_f = flat(keep)
    area = flat(wh_after[..., 0] * wh_after[..., 1])
    prio = jnp.where(keep_f, area + 1.0, -1.0)
    order = jnp.argsort(-prio)[:n_out]
    sel = lambda a: flat(a)[order]

    return {
        "img": img,
        "cls": sel(t_cls),
        "bboxes": sel(out_boxes) / S,
        "segments": sel(segs_out) / S,
        "mask_gt": keep_f[order],
        "keypoints": None if kpts_out is None
        else jnp.concatenate(
            [sel(kpts_out)[..., :2] / S, sel(kpts_out)[..., 2:]], -1
        ),
    }


def _affine_matrix_dyn(key, out_size, in_size, hyp):
    """_affine_matrix with a traced (per-sample) input size."""
    kp, ka, ks, ksh1, ksh2, ktx, kty = jax.random.split(key, 7)
    persp = float(getattr(hyp, "perspective", 0.0) or 0.0)
    deg = float(getattr(hyp, "degrees", 0.0) or 0.0)
    scl = float(getattr(hyp, "scale", 0.5) or 0.0)
    shr = float(getattr(hyp, "shear", 0.0) or 0.0)
    trn = float(getattr(hyp, "translate", 0.1) or 0.0)

    C = jnp.eye(3).at[0, 2].set(-in_size / 2.0).at[1, 2].set(-in_size / 2.0)
    pxy = jax.random.uniform(kp, (2,), minval=-persp, maxval=persp)
    P = jnp.eye(3).at[2, 0].set(pxy[0]).at[2, 1].set(pxy[1])
    a = jax.random.uniform(ka, (), minval=-deg, maxval=deg) * math.pi / 180.0
    sc = jax.random.uniform(ks, (), minval=1.0 - scl, maxval=1.0 + scl)
    ca, sa = jnp.cos(a) * sc, jnp.sin(a) * sc
    R = jnp.eye(3).at[0, 0].set(ca).at[0, 1].set(sa).at[1, 0].set(-sa).at[1, 1].set(ca)
    sh1 = jnp.tan(jax.random.uniform(ksh1, (), minval=-shr, maxval=shr) * math.pi / 180.0)
    sh2 = jnp.tan(jax.random.uniform(ksh2, (), minval=-shr, maxval=shr) * math.pi / 180.0)
    Sh = jnp.eye(3).at[0, 1].set(sh1).at[1, 0].set(sh2)
    tx = jax.random.uniform(ktx, (), minval=0.5 - trn, maxval=0.5 + trn) * out_size
    ty = jax.random.uniform(kty, (), minval=0.5 - trn, maxval=0.5 + trn) * out_size
    T = jnp.eye(3).at[0, 2].set(tx).at[1, 2].set(ty)
    return T @ Sh @ R @ P @ C, sc


# ---------------------------------------------------------------------------
# batch entry point
# ---------------------------------------------------------------------------

def augment_batch(key, batch: Dict[str, jnp.ndarray], hyp, imgsz: int,
                  n_out: int, bgr_input: bool = True) -> Dict[str, jnp.ndarray]:
    """The full device-side train transform. Call under jit.

    batch: raw letterboxed samples from the loader —
      img (B,S,S,3) uint8 (BGR as decoded), cls (B,N) i32,
      bboxes (B,N,4) xywh norm, segments (B,N,360,2) norm, mask_gt (B,N),
      content_hw (B,2), pad_tl (B,2), optional keypoints (B,N,K,3).
    Returns the train-batch dict the loss consumes (img f32 RGB [0,1],
    labels with N = n_out instances).
    """
    S = imgsz
    images = batch["img"]
    B = images.shape[0]
    k_sel, k_aug, k_mix, k_mixr, k_mixp, k_hsv, k_flr, k_fud = jax.random.split(key, 8)

    # in-batch mosaic partners: tile 0 is the sample itself
    part = jax.random.randint(k_sel, (B, 3), 0, B)
    sel = jnp.concatenate([jnp.arange(B)[:, None], part], 1)  # (B, 4)

    gather = lambda a: a[sel]  # (B, 4, ...)
    tiles = gather(images)
    t_cls = gather(batch["cls"])
    t_boxes = gather(batch["bboxes"])
    t_segs = gather(batch["segments"])
    t_mask = gather(batch["mask_gt"])
    t_kpts = gather(batch["keypoints"]) if "keypoints" in batch else None
    t_chw = gather(batch["content_hw"])
    t_pad = gather(batch["pad_tl"])

    keys = jax.random.split(k_aug, B)
    one = partial(_augment_one, hyp=hyp, S=S, n_out=n_out)
    out = jax.vmap(one)(keys, tiles, t_cls, t_boxes, t_segs, t_mask, t_kpts,
                        t_chw, t_pad)

    img = out["img"]
    if bgr_input:
        img = img[..., ::-1]
    img = img / 255.0

    # ---- MixUp (reference augment.py:270: beta(32,32) blend, labels union)
    p_mix = float(getattr(hyp, "mixup", 0.0) or 0.0)
    if p_mix > 0:
        do_mix = jax.random.uniform(k_mix, (B,)) < p_mix
        # img.dtype (bf16 on the warp path) — see hsv_jitter's cast note
        r = jax.random.beta(k_mixr, 32.0, 32.0, (B,)).astype(img.dtype)
        pidx = jax.random.randint(k_mixp, (B,), 0, B)
        img = jnp.where(
            do_mix[:, None, None, None],
            img * r[:, None, None, None] + img[pidx] * (1 - r[:, None, None, None]),
            img,
        )

        def union(a):
            return jnp.concatenate([a, a[pidx]], 1)

        m2 = jnp.concatenate(
            [out["mask_gt"], out["mask_gt"][pidx] & do_mix[:, None]], 1
        )
        ar2 = jnp.concatenate([
            out["bboxes"][..., 2] * out["bboxes"][..., 3],
            (out["bboxes"][..., 2] * out["bboxes"][..., 3])[pidx],
        ], 1)
        prio = jnp.where(m2, ar2 + 1.0, -1.0)
        order = jnp.argsort(-prio, axis=1)[:, :n_out]  # (B, n_out)
        take = lambda a: jnp.take_along_axis(
            union(a), order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
        )
        out["cls"] = take(out["cls"])
        out["bboxes"] = take(out["bboxes"])
        out["segments"] = take(out["segments"])
        out["mask_gt"] = jnp.take_along_axis(m2, order, axis=1)
        if out["keypoints"] is not None:
            out["keypoints"] = take(out["keypoints"])

    # ---- flips (reference augment.py:536) -------------------------------
    p_lr = float(getattr(hyp, "fliplr", 0.5) or 0.0)
    p_ud = float(getattr(hyp, "flipud", 0.0) or 0.0)
    if p_lr > 0:
        do = jax.random.uniform(k_flr, (B,)) < p_lr
        img = jnp.where(do[:, None, None, None], img[:, :, ::-1], img)
        m = do[:, None, None]
        out["bboxes"] = out["bboxes"].at[..., 0].set(
            jnp.where(do[:, None], 1.0 - out["bboxes"][..., 0], out["bboxes"][..., 0])
        )
        out["segments"] = out["segments"].at[..., 0].set(
            jnp.where(m, 1.0 - out["segments"][..., 0], out["segments"][..., 0])
        )
        if out["keypoints"] is not None:
            k = out["keypoints"]
            kx = jnp.where(do[:, None, None], 1.0 - k[..., 0], k[..., 0])
            k = k.at[..., 0].set(kx)
            flip_idx = getattr(hyp, "flip_idx", None)
            if flip_idx:
                kf = k[:, :, jnp.asarray(flip_idx, jnp.int32)]
                k = jnp.where(do[:, None, None, None], kf, k)
            out["keypoints"] = k
    if p_ud > 0:
        do = jax.random.uniform(k_fud, (B,)) < p_ud
        img = jnp.where(do[:, None, None, None], img[:, ::-1], img)
        m = do[:, None, None]
        out["bboxes"] = out["bboxes"].at[..., 1].set(
            jnp.where(do[:, None], 1.0 - out["bboxes"][..., 1], out["bboxes"][..., 1])
        )
        out["segments"] = out["segments"].at[..., 1].set(
            jnp.where(m, 1.0 - out["segments"][..., 1], out["segments"][..., 1])
        )
        if out["keypoints"] is not None:
            k = out["keypoints"]
            ky = jnp.where(do[:, None, None], 1.0 - k[..., 1], k[..., 1])
            out["keypoints"] = k.at[..., 1].set(ky)

    # ---- HSV (after mixup/flips, pixel-only) -----------------------------
    if any(float(getattr(hyp, f"hsv_{c}", 0) or 0) > 0 for c in "hsv"):
        hkeys = jax.random.split(k_hsv, B)
        img = jax.vmap(
            lambda im, k: hsv_jitter(
                im, k, float(getattr(hyp, "hsv_h", 0.015)),
                float(getattr(hyp, "hsv_s", 0.7)), float(getattr(hyp, "hsv_v", 0.4)),
            )
        )(img, hkeys)

    result = {
        "img": img.astype(jnp.float32),
        "cls": out["cls"].astype(jnp.int32),
        "bboxes": out["bboxes"],
        "segments": out["segments"],
        "mask_gt": out["mask_gt"],
    }
    if out["keypoints"] is not None:
        result["keypoints"] = out["keypoints"]
    return result


def make_augment_fn(hyp, imgsz: int, max_instances: int, mesh=None):
    """Build the (key, images_u8, labels) -> (images_f32, labels) transform
    the train step folds in (engine/step.py).

    With a multi-device batch mesh the transform runs under ``shard_map`` so
    in-batch mosaic/mixup partner gathers stay DEVICE-LOCAL — no all-gather
    of the image batch over ICI; each chip mosaics within its own batch
    shard (statistically equivalent: the loader already shuffles globally).
    """

    def local_fn(key, images, labels):
        n_in = labels["mask_gt"].shape[-1]
        # post-merge capacity: 4 tiles' worth of instances, capped
        n_out = min(4 * int(n_in), int(max_instances))
        full = dict(labels)
        full["img"] = images
        out = augment_batch(key, full, hyp, imgsz, n_out)
        imgs = out.pop("img")
        return imgs, out

    n_batch_devices = 1
    if mesh is not None and "batch" in mesh.axis_names:
        n_batch_devices = mesh.shape["batch"]
    if n_batch_devices <= 1:
        return local_fn

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def sharded_fn(key, images, labels):
        def body(k, im, lb):
            k = jax.random.fold_in(k, jax.lax.axis_index("batch"))
            return local_fn(k, im, lb)

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(), P("batch"), P("batch")),
            out_specs=(P("batch"), P("batch")),
        )(key, images, labels)

    return sharded_fn


def normalize_batch(images_u8, bgr_input: bool = True):
    """No-augmentation device preprocess: uint8 (B,S,S,3) -> f32 RGB [0,1]."""
    img = images_u8.astype(jnp.float32)
    if bgr_input:
        img = img[..., ::-1]
    return img / 255.0
