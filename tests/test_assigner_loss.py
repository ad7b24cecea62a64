"""Assigner + loss behavior tests on tiny synthetic scenes."""
import math

import jax
import jax.numpy as jnp
import numpy as np
from types import SimpleNamespace

from yolo_contour_regression_tpu.ops import polar as P
from yolo_contour_regression_tpu.utils import loss as L
from yolo_contour_regression_tpu.utils.tal import (
    polar_task_aligned_assign,
    select_candidates_in_gts,
    task_aligned_assign,
)

HYP = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0)


def circle(cx, cy, r, n=360):
    t = np.linspace(0, 2 * math.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], -1).astype(np.float32)


def scene(imgsz=32, nc=3):
    """One circular instance centered at (16, 16), radius 8, class 1."""
    B, N = 2, 3
    gt_labels = np.zeros((B, N), np.int32)
    gt_bboxes = np.zeros((B, N, 4), np.float32)
    gt_contours = np.zeros((B, N, 360, 2), np.float32)
    mask_gt = np.zeros((B, N), bool)
    gt_labels[0, 0] = 1
    gt_bboxes[0, 0] = [8, 8, 24, 24]
    gt_contours[0, 0] = circle(16, 16, 8)
    mask_gt[0, 0] = True
    return gt_labels, gt_bboxes, gt_contours, mask_gt


def anchors(imgsz=32, strides=(8, 16, 32)):
    hw = [(imgsz // s, imgsz // s) for s in strides]
    return P.make_anchors(hw, strides)


def test_select_candidates_in_gts():
    pts, st = anchors()
    gt = jnp.asarray([[[8.0, 8, 24, 24]]])
    inside = select_candidates_in_gts(pts * st, gt)[0, 0]
    pts_px = np.asarray(pts * st)
    want = (
        (pts_px[:, 0] > 8) & (pts_px[:, 0] < 24) & (pts_px[:, 1] > 8) & (pts_px[:, 1] < 24)
    )
    np.testing.assert_array_equal(np.asarray(inside), want)


def test_polar_assign_picks_inbox_anchors_and_rays():
    gt_labels, gt_bboxes, gt_contours, mask_gt = scene()
    pts, st = anchors()
    A = pts.shape[0]
    B, nc = 2, 3
    rng = np.random.default_rng(0)
    pd_scores = jnp.asarray(rng.uniform(0.1, 0.9, (B, A, nc)).astype(np.float32))
    # predict near-perfect rays of 8px everywhere
    pd_rays = jnp.full((B, A, 36), 8.0)
    out = polar_task_aligned_assign(
        pd_scores, pd_rays, pts * st,
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(gt_contours),
        jnp.asarray(mask_gt), cand=16,
    )
    fg = np.asarray(out.fg_mask)
    assert fg[0].sum() > 0
    assert fg[1].sum() == 0  # image 1 has no GT
    # all fg anchors lie inside the gt box
    pts_px = np.asarray(pts * st)
    for a in np.where(fg[0])[0]:
        assert 8 < pts_px[a, 0] < 24 and 8 < pts_px[a, 1] < 24
        # target rays match the reference angle-binning formula at that anchor
        want = P.gt_rays_from_contour(
            jnp.asarray(gt_contours[0, 0])[None], jnp.asarray(pts_px[a])[None]
        )[0]
        np.testing.assert_allclose(np.asarray(out.target_rays[0, a]), np.asarray(want), rtol=1e-4)
    # labels assigned
    assert (np.asarray(out.target_labels)[0][fg[0]] == 1).all()
    # target scores only on fg, class 1
    ts = np.asarray(out.target_scores[0])
    assert (ts[~fg[0]] == 0).all()
    assert ts[fg[0], 1].max() > 0
    assert (ts[:, [0, 2]] == 0).all()
    # centerness in (0, 1]
    c = np.asarray(out.centerness[0])[fg[0]]
    assert (c > 0).all() and (c <= 1).all()


def test_polar_assign_dedupe_unique_gt_per_anchor():
    gt_labels, gt_bboxes, gt_contours, mask_gt = scene()
    # add an overlapping second instance
    gt_labels[0, 1] = 2
    gt_bboxes[0, 1] = [10, 10, 26, 26]
    gt_contours[0, 1] = circle(18, 18, 8)
    mask_gt[0, 1] = True
    pts, st = anchors()
    A = pts.shape[0]
    pd_scores = jnp.full((2, A, 3), 0.5)
    pd_rays = jnp.full((2, A, 36), 8.0)
    out = polar_task_aligned_assign(
        pd_scores, pd_rays, pts * st,
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(gt_contours),
        jnp.asarray(mask_gt), cand=16,
    )
    # every fg anchor has exactly one gt and consistent label
    fg = np.asarray(out.fg_mask[0])
    lab = np.asarray(out.target_labels[0])
    tgt = np.asarray(out.target_gt_idx[0])
    for a in np.where(fg)[0]:
        assert lab[a] == gt_labels[0, tgt[a]]


def batchify(gt_labels, gt_bboxes, gt_contours, mask_gt, imgsz=32):
    return {
        "cls": jnp.asarray(gt_labels),
        "bboxes": jnp.asarray(
            np.concatenate(
                [
                    (gt_bboxes[..., :2] + gt_bboxes[..., 2:]) / 2,
                    gt_bboxes[..., 2:] - gt_bboxes[..., :2],
                ],
                -1,
            )
            / imgsz
        ),
        "segments": jnp.asarray(gt_contours / imgsz),
        "mask_gt": jnp.asarray(mask_gt),
    }


def test_segmentation_loss_prefers_good_predictions():
    gt_labels, gt_bboxes, gt_contours, mask_gt = scene()
    batch = batchify(gt_labels, gt_bboxes, gt_contours, mask_gt)
    strides = (8, 16, 32)
    nc = 3
    hw = [(32 // s, 32 // s) for s in strides]

    def feats_with(ray_val, cls_logit):
        out = []
        for (h, w), s in zip(hw, strides):
            f = np.zeros((2, h, w, 36 + nc), np.float32)
            f[..., :36] = ray_val / s
            f[..., 36:] = -6.0
            f[..., 36 + 1] = cls_logit  # class 1 logit
            out.append(jnp.asarray(f))
        return out

    # identical class predictions, different ray quality: the polar-IoU term
    # must prefer rays matching the GT radius (8px)
    good = L.segmentation_loss(feats_with(8.0, 0.0), batch, strides, nc, HYP, cand=16)
    bad = L.segmentation_loss(feats_with(2.0, 0.0), batch, strides, nc, HYP, cand=16)
    assert float(good.items["seg_loss"]) < float(bad.items["seg_loss"])
    assert float(good.total) < float(bad.total)
    assert np.isfinite(float(good.total))
    assert set(good.items) == {"seg_loss", "cls_loss"}


def test_segmentation_loss_grads_finite():
    gt_labels, gt_bboxes, gt_contours, mask_gt = scene()
    batch = batchify(gt_labels, gt_bboxes, gt_contours, mask_gt)
    strides = (8, 16, 32)
    hw = [(32 // s, 32 // s) for s in strides]
    feats = [jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, h, w, 39)).astype(np.float32)) for h, w in hw]

    def f(feats):
        return L.segmentation_loss(feats, batch, strides, 3, HYP, cand=16).total

    grads = jax.grad(f)(feats)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


def test_detection_loss_and_grads():
    gt_labels, gt_bboxes, gt_contours, mask_gt = scene()
    batch = batchify(gt_labels, gt_bboxes, gt_contours, mask_gt)
    strides = (8, 16, 32)
    hw = [(32 // s, 32 // s) for s in strides]
    reg_max, nc = 16, 3
    feats = [
        jnp.asarray(
            np.random.default_rng(1).normal(0, 1, (2, h, w, 4 * reg_max + nc)).astype(np.float32)
        )
        for h, w in hw
    ]
    out = L.detection_loss(feats, batch, strides, nc, HYP, reg_max)
    assert np.isfinite(float(out.total))
    grads = jax.grad(lambda fs: L.detection_loss(fs, batch, strides, nc, HYP, reg_max).total)(feats)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_classification_loss():
    preds = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    batch = {"cls": jnp.asarray([0, 1])}
    out = L.classification_loss(preds, batch)
    assert float(out.total) > 0
    worse = L.classification_loss(jnp.asarray([[0.1, 0.9], [0.8, 0.2]]), batch)
    assert float(worse.total) > float(out.total)

def test_cand_cap_vs_exact_assignment_big_objects():
    """Quantify the cand-cap approximation (VERDICT r2 next-#4): on a batch
    of image-filling objects (thousands of in-box anchors), compare the
    capped assignment (cand=128) against the EXACT one (cand=A, reference
    tal.py:1134-1204 computes the polar metric on ALL in-box anchors).

    The cap keeps the highest-scored in-box anchors and can only drop a
    true top-10 anchor whose class score ranks below 128th — quantified
    here as fg agreement + target-ray deltas on shared anchors."""
    import numpy as np
    import jax.numpy as jnp

    from yolo_contour_regression_tpu.utils.tal import polar_task_aligned_assign
    from yolo_contour_regression_tpu.ops.polar import make_anchors

    imgsz, nc, B, N = 256, 3, 2, 3
    strides = (8, 16, 32)
    feat_hw = [(imgsz // s, imgsz // s) for s in strides]
    anc, stride_t = make_anchors(feat_hw, strides)
    anc = anc * stride_t  # px coords
    A = anc.shape[0]  # 1344 at 256px
    rng = np.random.RandomState(0)

    # image-filling objects: boxes covering 60-90% of the frame
    t = np.linspace(0, 2 * np.pi, 360, endpoint=False)
    gt_boxes = np.zeros((B, N, 4), np.float32)
    gt_contours = np.zeros((B, N, 360, 2), np.float32)
    for b in range(B):
        for n in range(N):
            cx, cy = imgsz / 2 + rng.uniform(-20, 20, 2)
            r = imgsz * rng.uniform(0.3, 0.45)
            gt_boxes[b, n] = [cx - r, cy - r, cx + r, cy + r]
            gt_contours[b, n] = np.stack(
                [cx + r * np.cos(t), cy + r * np.sin(t)], -1
            )
    gt_labels = rng.randint(0, nc, (B, N)).astype(np.int32)
    mask_gt = np.ones((B, N), bool)
    pd_scores = jnp.asarray(rng.uniform(0, 1, (B, A, nc)).astype(np.float32))
    pd_rays = jnp.asarray(rng.uniform(10, 80, (B, A, 36)).astype(np.float32))

    res = {}
    for cand in (128, A):
        res[cand] = polar_task_aligned_assign(
            pd_scores, pd_rays, jnp.asarray(anc), jnp.asarray(gt_labels),
            jnp.asarray(gt_boxes), jnp.asarray(gt_contours),
            jnp.asarray(mask_gt), cand=cand,
        )
    fg_c = np.asarray(res[128].fg_mask)
    fg_e = np.asarray(res[A].fg_mask)
    n_exact = int(fg_e.sum())
    agree = int((fg_c & fg_e).sum())
    # in-box anchors per GT (sanity: the cap is genuinely exceeded)
    from yolo_contour_regression_tpu.utils.tal import select_candidates_in_gts
    inbox = np.asarray(select_candidates_in_gts(jnp.asarray(anc), jnp.asarray(gt_boxes)))
    assert inbox.sum(-1).min() > 400, "test objects too small to stress the cap"

    # topk=10 per GT: both select 10 anchors/GT; with random scores the
    # capped set must still recover the bulk of the exact assignment
    recall = agree / max(n_exact, 1)
    print(f"\ncand cap: exact fg={n_exact}, agree={agree}, recall={recall:.3f}")
    assert n_exact > 0
    assert recall >= 0.5, f"cap recall collapsed: {recall}"

    # on agreeing anchors the targets must be identical (same GT rays)
    both = fg_c & fg_e
    tr_c = np.asarray(res[128].target_rays)[both]
    tr_e = np.asarray(res[A].target_rays)[both]
    same_gt = np.asarray(res[128].target_gt_idx)[both] == np.asarray(res[A].target_gt_idx)[both]
    np.testing.assert_allclose(tr_c[same_gt], tr_e[same_gt], rtol=1e-4, atol=1e-3)


def test_polar_assign_sparse_equals_dense():
    """The candidate-space dedupe (impl='sparse', the default) must reproduce
    the dense (B, N, A) scatter-back formulation exactly — including overlap
    ties (duplicate GTs -> lowest GT index wins, matching jnp.argmax
    first-occurrence order) and padded GT rows."""
    rng = np.random.default_rng(7)
    imgsz, nc = 64, 5
    pts, st = anchors(imgsz)
    A = pts.shape[0]
    B, N = 3, 6
    gt_labels = rng.integers(0, nc, (B, N)).astype(np.int32)
    mask_gt = rng.uniform(size=(B, N)) < 0.7
    mask_gt[2, :] = False  # one all-padding image
    ctr = rng.uniform(16, 48, (B, N, 2))
    rad = rng.uniform(6, 20, (B, N))
    gt_bboxes = np.concatenate([ctr - rad[..., None], ctr + rad[..., None]], -1)
    gt_contours = np.stack(
        [[circle(*ctr[b, n], rad[b, n]) for n in range(N)] for b in range(B)]
    )
    # exact-tie case: GT 1 duplicates GT 0 in image 0
    for arr in (gt_labels, gt_bboxes, gt_contours):
        arr[0, 1] = arr[0, 0]
    mask_gt[0, 0] = mask_gt[0, 1] = True
    pd_scores = rng.uniform(0, 1, (B, A, nc)).astype(np.float32)
    pd_rays = rng.uniform(1, 20, (B, A, 36)).astype(np.float32)

    args = (
        jnp.asarray(pd_scores), jnp.asarray(pd_rays), pts * st,
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes, jnp.float32),
        jnp.asarray(gt_contours, jnp.float32), jnp.asarray(mask_gt),
    )
    sp = polar_task_aligned_assign(*args, cand=32, impl="sparse")
    de = polar_task_aligned_assign(*args, cand=32, impl="dense")
    np.testing.assert_array_equal(np.asarray(sp.fg_mask), np.asarray(de.fg_mask))
    assert np.asarray(sp.fg_mask).any()
    np.testing.assert_array_equal(
        np.asarray(sp.target_gt_idx)[np.asarray(sp.fg_mask)],
        np.asarray(de.target_gt_idx)[np.asarray(de.fg_mask)],
    )
    np.testing.assert_array_equal(np.asarray(sp.target_labels * sp.fg_mask),
                                  np.asarray(de.target_labels * de.fg_mask))
    np.testing.assert_allclose(np.asarray(sp.target_scores),
                               np.asarray(de.target_scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.target_rays),
                               np.asarray(de.target_rays), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp.target_bboxes * sp.fg_mask[..., None]),
                               np.asarray(de.target_bboxes * de.fg_mask[..., None]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.centerness),
                               np.asarray(de.centerness), atol=1e-6)


def test_df_loss_onehot_equals_gather_form():
    """_df_loss picks DFL bins via one-hot multiply-reduce (the
    take_along_axis gather along the minor reg_max axis was the hottest op
    of the detect train step on TPU — docs/PERF_NOTES.md). Pin bit-equality
    with the reference gather form, values AND gradients, including the
    reg_max-1 clip edge."""
    import jax

    from yolo_contour_regression_tpu.utils.loss import _df_loss

    def ref(pred_dist, target, reg_max):
        tl = jnp.floor(target).astype(jnp.int32)
        tr = tl + 1
        wl = tr.astype(target.dtype) - target
        wr = 1.0 - wl
        logp = jax.nn.log_softmax(pred_dist, axis=-1)
        ce_l = -jnp.take_along_axis(
            logp, jnp.clip(tl, 0, reg_max - 1)[..., None], -1)[..., 0]
        ce_r = -jnp.take_along_axis(
            logp, jnp.clip(tr, 0, reg_max - 1)[..., None], -1)[..., 0]
        return (ce_l * wl + ce_r * wr).mean(-1)

    r = np.random.default_rng(0)
    pd = jnp.asarray(r.normal(size=(3, 57, 4, 16)).astype(np.float32))
    tg = jnp.asarray(r.uniform(0, 15, size=(3, 57, 4)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(_df_loss(pd, tg, 16)),
                                  np.asarray(ref(pd, tg, 16)))
    ga = jax.grad(lambda p: _df_loss(p, tg, 16).sum())(pd)
    gb = jax.grad(lambda p: ref(p, tg, 16).sum())(pd)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    # edge: target exactly reg_max-1 (tr clips onto tl's bin)
    tg2 = jnp.full((2, 5, 4), 15.0)
    np.testing.assert_array_equal(
        np.asarray(_df_loss(pd[:2, :5], tg2, 16)),
        np.asarray(ref(pd[:2, :5], tg2, 16)),
    )
