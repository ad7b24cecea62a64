"""Device-side augmentation stage (data/device_augment.py): geometry
consistency between the fused image gather and the label matmul, reference
semantics (mosaic/affine/mixup/HSV/flips), and the raw-batch plumbing."""
import math
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_contour_regression_tpu.data.device_augment import (
    augment_batch,
    hsv_to_rgb,
    make_augment_fn,
    rgb_to_hsv,
)

S = 96
N = 4


def _hyp(**kw):
    base = dict(
        mosaic=1.0, mixup=0.0, degrees=0.0, translate=0.1, scale=0.5,
        shear=0.0, perspective=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
        fliplr=0.0, flipud=0.0,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _square_contour(cx, cy, half, n=360):
    """360-pt contour tracing a square (axis-aligned), px coords."""
    t = np.linspace(0, 4, n, endpoint=False)
    side = t.astype(int) % 4
    f = t - np.floor(t)
    x = np.select(
        [side == 0, side == 1, side == 2, side == 3],
        [cx - half + 2 * half * f, cx + half, cx + half - 2 * half * f, cx - half],
    )
    y = np.select(
        [side == 0, side == 1, side == 2, side == 3],
        [cy - half, cy - half + 2 * half * f, cy + half, cy + half - 2 * half * f],
    )
    return np.stack([x, y], -1).astype(np.float32)


def _make_batch(B=4, colors=None):
    """Each image: gray bg + one filled square of a per-class color; one
    instance whose contour traces that square. Full-frame content (no pad)."""
    colors = colors or [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    imgs = np.full((B, S, S, 3), 114, np.uint8)
    cls = np.zeros((B, N), np.int32)
    boxes = np.zeros((B, N, 4), np.float32)
    segs = np.zeros((B, N, 360, 2), np.float32)
    mask = np.zeros((B, N), bool)
    for b in range(B):
        cx, cy, half = S // 2, S // 2, S // 4
        imgs[b, cy - half:cy + half, cx - half:cx + half] = colors[b % len(colors)]
        cls[b, 0] = b % len(colors)
        boxes[b, 0] = [cx / S, cy / S, 2 * half / S, 2 * half / S]
        segs[b, 0] = _square_contour(cx, cy, half) / S
        mask[b, 0] = True
    return {
        "img": jnp.asarray(imgs),
        "cls": jnp.asarray(cls),
        "bboxes": jnp.asarray(boxes),
        "segments": jnp.asarray(segs),
        "mask_gt": jnp.asarray(mask),
        "content_hw": jnp.full((B, 2), S, jnp.float32),
        "pad_tl": jnp.zeros((B, 2), jnp.float32),
    }, colors


def test_identity_transform_is_noop():
    """mosaic=0, no affine randomness -> output == input (BGR->RGB, /255)."""
    batch, _ = _make_batch()
    hyp = _hyp(mosaic=0.0, translate=0.0, scale=0.0)
    out = augment_batch(jax.random.PRNGKey(0), batch, hyp, S, n_out=N)
    want = np.asarray(batch["img"], np.float32)[..., ::-1] / 255.0
    # within half a uint8 LSB: the resample computes in bf16 by default
    np.testing.assert_allclose(np.asarray(out["img"]), want, atol=0.5 / 255)
    # labels preserved (possibly reordered; here 1 instance/image -> first)
    assert bool(out["mask_gt"][:, 0].all())
    np.testing.assert_allclose(
        np.asarray(out["segments"][:, 0]), np.asarray(batch["segments"][:, 0]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["bboxes"][:, 0]), np.asarray(batch["bboxes"][:, 0]), atol=1e-3
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mosaic_affine_image_label_consistency(seed):
    """The fused image gather and the label matmul must agree: each surviving
    instance's contour centroid samples ITS OWN color in the warped image."""
    batch, colors = _make_batch()
    hyp = _hyp(degrees=15.0, translate=0.2, scale=0.5, shear=2.0)
    out = augment_batch(jax.random.PRNGKey(seed), batch, hyp, S, n_out=2 * N)
    img = np.asarray(out["img"])  # RGB [0,1]
    segs = np.asarray(out["segments"]) * S
    mask = np.asarray(out["mask_gt"])
    boxes = np.asarray(out["bboxes"])
    cls = np.asarray(out["cls"])
    checked = 0
    for b in range(img.shape[0]):
        for n in range(segs.shape[1]):
            if not mask[b, n]:
                continue
            c = segs[b, n].mean(0)  # centroid px
            w, h = boxes[b, n, 2] * S, boxes[b, n, 3] * S
            if w < 12 or h < 12:
                continue  # clipped slivers: centroid may leave the square
            px = img[b, int(round(c[1])), int(round(c[0]))] * 255
            # raw buffer is BGR; the pipeline emits RGB
            want = np.asarray(colors[cls[b, n]][::-1], np.float32)
            assert np.abs(px - want).max() < 40, (b, n, px, want)
            checked += 1
            # bbox == contour extent
            smin, smax = segs[b, n].min(0), segs[b, n].max(0)
            np.testing.assert_allclose(
                boxes[b, n], np.concatenate([(smin + smax) / 2, smax - smin]) / S,
                atol=1e-3,
            )
    assert checked >= 4, f"only {checked} instances survived across the batch"


def test_fliplr_consistency():
    batch, colors = _make_batch()
    # move the square off-center so the flip is observable
    imgs = np.asarray(batch["img"]).copy()
    imgs[:] = 114
    cx, cy, half = S // 4, S // 2, S // 8
    for b in range(4):
        imgs[b, cy - half:cy + half, cx - half:cx + half] = colors[b % 4]
    batch["img"] = jnp.asarray(imgs)
    segs = np.zeros((4, N, 360, 2), np.float32)
    boxes = np.zeros((4, N, 4), np.float32)
    for b in range(4):
        segs[b, 0] = _square_contour(cx, cy, half) / S
        boxes[b, 0] = [cx / S, cy / S, 2 * half / S, 2 * half / S]
    batch["segments"] = jnp.asarray(segs)
    batch["bboxes"] = jnp.asarray(boxes)

    hyp = _hyp(mosaic=0.0, translate=0.0, scale=0.0, fliplr=1.0)
    out = augment_batch(jax.random.PRNGKey(3), batch, hyp, S, n_out=N)
    img = np.asarray(out["img"])
    sg = np.asarray(out["segments"])[:, 0] * S
    c = sg.mean(1)
    assert np.all(np.abs(c[:, 0] - (S - cx)) < 1.0), c[:, 0]  # mirrored x
    px = img[0, int(c[0, 1]), int(c[0, 0])] * 255
    assert np.abs(px - np.asarray(colors[0][::-1], np.float32)).max() < 40


def test_hsv_roundtrip_and_jitter_bounds():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    h, s, v = rgb_to_hsv(rgb)
    back = hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    batch, _ = _make_batch()
    hyp = _hyp(mosaic=0.0, translate=0.0, scale=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    out = augment_batch(jax.random.PRNGKey(1), batch, hyp, S, n_out=N)
    img = np.asarray(out["img"])
    assert img.min() >= 0.0 and img.max() <= 1.0
    base = np.asarray(batch["img"], np.float32)[..., ::-1] / 255.0
    assert not np.allclose(img, base)  # jitter did something


def test_mixup_blends_and_unions_labels():
    batch, _ = _make_batch()
    hyp = _hyp(mosaic=0.0, translate=0.0, scale=0.0, mixup=1.0)
    out = augment_batch(jax.random.PRNGKey(5), batch, hyp, S, n_out=N)
    img = np.asarray(out["img"])
    # beta(32,32) concentrates near 0.5: blended pixels lie strictly inside
    # the channel range of the two sources at the square's center
    assert img.min() >= 0.0 and img.max() <= 1.0
    # background stays gray regardless of partner (both bgs are 114)
    np.testing.assert_allclose(img[:, 2, 2] * 255, 114, atol=1.5)
    # at least one sample unions two instances (partner != self almost surely)
    assert int(np.asarray(out["mask_gt"]).sum()) >= 5


def test_make_augment_fn_single_device_and_trainstep_fold():
    """make_augment_fn output plugs into make_train_step and the loss runs."""
    from yolo_contour_regression_tpu.data.device_augment import make_augment_fn

    batch, _ = _make_batch()
    hyp = _hyp(degrees=5.0)
    fn = make_augment_fn(hyp, S, max_instances=8, mesh=None)
    labels = {k: v for k, v in batch.items() if k != "img"}
    imgs, out = jax.jit(fn)(jax.random.PRNGKey(0), batch["img"], labels)
    assert imgs.shape == (4, S, S, 3) and imgs.dtype == jnp.float32
    assert out["segments"].shape == (4, 8, 360, 2)  # min(4*4, 8)
    assert out["mask_gt"].shape == (4, 8)
    assert "content_hw" not in out and "pad_tl" not in out


def test_sharded_augment_matches_shapes():
    """shard_map path over an 8-device CPU mesh: shapes + finiteness (the
    mosaic partner gather stays shard-local by construction)."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("batch",))
    B = 16
    batch, _ = _make_batch(B=B)
    hyp = _hyp(degrees=5.0, mixup=0.5)
    fn = make_augment_fn(hyp, S, max_instances=8, mesh=mesh)
    labels = {k: v for k, v in batch.items() if k != "img"}
    imgs, out = jax.jit(fn)(jax.random.PRNGKey(0), batch["img"], labels)
    assert imgs.shape == (B, S, S, 3)
    assert bool(jnp.isfinite(imgs).all())
    assert out["mask_gt"].shape == (B, 8)


def test_separable_warp_matches_gather_warp():
    """The matmul-based fast warp (axis-aligned affines, the default hyp)
    is numerically identical to the gather warp across scales/translations,
    mosaic and plain, including the gray-border blend ring (1px PAD ring +
    coverage algebra)."""
    import jax
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.data import device_augment as da

    S = 32
    tiles = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, S, S, 3), dtype=np.uint8)
    )
    for trial in range(6):
        r = np.random.default_rng(trial)
        a = float(r.uniform(0.5, 1.5))
        bx, by = (float(v) for v in r.uniform(-12, 12, 2))
        M = jnp.asarray([[a, 0, bx], [0, a, by], [0, 0, 1.0]], jnp.float32)
        um = jnp.asarray(trial % 2 == 0)
        yc = jnp.asarray(float(r.uniform(0.5 * S, 1.5 * S)))
        xc = jnp.asarray(float(r.uniform(0.5 * S, 1.5 * S)))
        offs = jnp.asarray(r.uniform(-S / 2, S, (4, 2)).astype(np.float32))
        offs = jnp.where(um, offs, jnp.zeros_like(offs))
        g = np.asarray(da._warp_image(tiles, jnp.linalg.inv(M), yc, xc, offs, um, S))
        f = np.asarray(
            da._warp_image_separable(tiles, M, yc, xc, offs, um, S,
                                     dtype=jnp.float32)
        )
        np.testing.assert_allclose(f, g, atol=5e-3), trial
        # the default bf16 resample (17 GFLOP/img in f32 — costlier than the
        # model forward, so bf16 by default) stays within ~1 uint8 LSB
        fb = np.asarray(da._warp_image_separable(tiles, M, yc, xc, offs, um, S))
        assert np.abs(fb.astype(np.float32) - g).max() <= 1.5, trial
        # the 2-tap gather variant (AUG_WARP=taps) computes the same
        # resample without the dense weight matrix — f32 matches the gather
        # warp, bf16 within the same LSB bound
        ft = np.asarray(da._warp_image_separable_taps(
            tiles, M, yc, xc, offs, um, S, dtype=jnp.float32))
        np.testing.assert_allclose(ft, g, atol=5e-3), trial
        ftb = np.asarray(da._warp_image_separable_taps(tiles, M, yc, xc, offs, um, S))
        assert np.abs(ftb.astype(np.float32) - g).max() <= 1.5, trial
