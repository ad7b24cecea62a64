"""Predictor — streaming inference over images/dirs/videos/streams.

Re-implementation of the reference BasePredictor (engine/predictor.py:59-365)
+ SegmentationPredictor (models/yolo/segment/predict.py). The device part —
letterboxed batch -> forward -> in-graph decode -> NMS (-> contour raster on
demand) — is one jitted call; loading/saving stays host-side cv2.

Deliberate fix vs reference: the reference segment predictor still runs the
stock proto-mask postprocess against polar outputs and so returns zero masks
(predict.py:10-46 + ops.py:768 — SURVEY.md §2.1); here predictions carry the
decoded polar contours, and masks are rasterized from them.
"""
from __future__ import annotations

import glob
import os
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg
from ..data.augment import letterbox
from ..ops.boxes import xywh2xyxy as np_unused  # noqa: F401 (doc parity)
from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from .results import Results

VID_FORMATS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v", ".wmv")
IMG_FORMATS = (".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp")


def iter_source(source) -> Iterator:
    """Yield (path, BGR image) from file/dir/glob/array/list/video
    (reference data/loaders.py LoadImages/LoadPilAndNumpy)."""
    if isinstance(source, np.ndarray):
        yield "array", source
        return
    if isinstance(source, (list, tuple)):
        for i, s in enumerate(source):
            if isinstance(s, np.ndarray):
                yield f"array{i}", s
            else:
                yield from iter_source(s)
        return
    p = str(source)
    if p.startswith("screen"):
        # screenshot stream (reference data/loaders.py:119 LoadScreenshots):
        # "screen", "screen <N>", or "screen <N> <left> <top> <w> <h>"
        # (also "<left> <top> <w> <h>" on screen 0); gated on mss
        try:
            import mss
        except ImportError as e:
            raise ImportError(
                "screenshot source needs the 'mss' package (not in this image)"
            ) from e
        params = p.replace("screen", "", 1).replace(",", " ").split()
        mon_idx, left, top, width, height = 0, None, None, None, None
        if len(params) == 1:
            mon_idx = int(params[0])
        elif len(params) == 4:
            left, top, width, height = (int(x) for x in params)
        elif len(params) == 5:
            mon_idx, left, top, width, height = (int(x) for x in params)
        with mss.mss() as sct:
            mon = sct.monitors[mon_idx]
            region = {
                "left": mon["left"] + (left or 0),
                "top": mon["top"] + (top or 0),
                "width": width or mon["width"],
                "height": height or mon["height"],
            }
            i = 0
            while True:
                frame = np.asarray(sct.grab(region))[:, :, :3]  # BGRA -> BGR
                yield f"screen{mon_idx}#frame{i}", np.ascontiguousarray(frame)
                i += 1
        return
    if os.path.isdir(p):
        files = sorted(
            f for f in glob.glob(os.path.join(p, "**", "*"), recursive=True)
            if Path(f).suffix.lower() in IMG_FORMATS + VID_FORMATS
        )
        for f in files:
            yield from iter_source(f)
        return
    suffix = Path(p).suffix.lower()
    if suffix in VID_FORMATS or p.isdigit() or p.startswith(("rtsp://", "http://", "https://")):
        cap = cv2.VideoCapture(int(p) if p.isdigit() else p)
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"{p}#frame{i}", frame
            i += 1
        cap.release()
        return
    img = cv2.imread(p)
    if img is None:
        raise FileNotFoundError(f"cannot read {p}")
    yield p, img


def _is_live_spec(s) -> bool:
    """True for sources that are live streams (webcam index / RTSP / HTTP),
    i.e. candidates for concurrent threaded ingestion (reference
    data/loaders.py:31 LoadStreams)."""
    p = str(s)
    return p.isdigit() or p.startswith(("rtsp://", "rtmp://", "http://", "https://"))


def _as_float(images):
    """uint8 -> [0,1] f32 in-graph. All eval programs accept uint8 batches:
    the host ships 1 byte/px over the (possibly tunneled) link and XLA fuses
    the normalize into the first conv — 4x less H2D than the f32 path."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


class BasePredictor:
    task = "detect"

    def __init__(self, args=None):
        self.args = args if args is not None else get_cfg()
        if self.args.conf is None:
            self.args.conf = 0.25
        self._eval_fn = None

    def preprocess(self, img: np.ndarray, imgsz: int):
        lb, gain, pad = letterbox(img, (imgsz, imgsz), scaleup=True)
        x = cv2.cvtColor(lb, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return x, gain, pad

    def preprocess_u8(self, img: np.ndarray, imgsz: int):
        """Like ``preprocess`` but keeps uint8 — normalization happens on
        device (``_as_float``), so H2D ships a quarter of the bytes."""
        lb, gain, pad = letterbox(img, (imgsz, imgsz), scaleup=True)
        return cv2.cvtColor(lb, cv2.COLOR_BGR2RGB), gain, pad

    def _build_eval(self, model):
        nc = model.nc
        args = self.args

        parts = self.task == "segment" and hasattr(model, "predict_parts")
        tta = bool(getattr(args, "augment", False))
        if tta and not hasattr(model, "predict_augmented"):
            # reference parity: only DetectionModel supports TTA; other tasks
            # warn and run single-scale (reference tasks.py _predict_augment
            # fallbacks)
            LOGGER.warning(
                f"task={self.task} does not support augment=True inference — "
                "running single-scale"
            )
            tta = False

        @jax.jit
        def eval_fn(variables, images):
            images = _as_float(images)
            nms_kw = dict(
                conf_thres=args.conf, iou_thres=args.iou,
                pre_nms=getattr(args, "pre_nms", 1024),
                max_det=args.max_det, agnostic=args.agnostic_nms,
            )
            if not tta and parts:
                # polar hot path: unconcatenated decode straight into
                # parts-NMS (head.py decode_polar_parts), contour points
                # reconstructed for survivors only — bit-identical to the
                # reference-layout path (test_nms.py)
                from ..nn.modules.head import finalize_polar_extras
                from ..ops.nms import non_max_suppression_parts

                boxes_p, logits_p, extras_p = model.predict_parts(
                    variables, images, sigmoid=False
                )
                out = non_max_suppression_parts(
                    boxes_p, logits_p, extras_p, scores_are_logits=True, **nms_kw
                )
                out["extras"] = finalize_polar_extras(out["extras"])
                return out
            if tta:
                # multi-scale + flip TTA (nn/tasks.py predict_augmented)
                pred = model.predict_augmented(variables, images)
            else:
                pred = model.predict(variables, images)
            # decode_detect emits xywh (polar decode emits xyxy directly)
            if self.task in ("detect", "pose"):
                from ..ops.boxes import xywh2xyxy

                boxes = jnp.transpose(pred[:, :4], (0, 2, 1))
                pred = pred.at[:, :4].set(jnp.transpose(xywh2xyxy(boxes), (0, 2, 1)))
            return non_max_suppression(
                pred.astype(jnp.float32), nc=nc, **nms_kw
            )

        return eval_fn

    def postprocess(self, out: Dict[str, np.ndarray], bi: int, orig, path, gain, pad, names):
        keep = out["valid"][bi]
        boxes = out["boxes"][bi][keep]
        boxes = (boxes - np.array([pad[0], pad[1], pad[0], pad[1]])) / gain
        h, w = orig.shape[:2]
        boxes = np.clip(boxes, 0, [w, h, w, h])
        data = np.concatenate(
            [boxes, out["scores"][bi][keep][:, None], out["classes"][bi][keep][:, None]], -1
        )
        return Results(orig, path, names, boxes=data)

    def __call__(self, model, variables, source, names=None, stream: bool = False):
        gen = self._stream(model, variables, source, names or getattr(model, "names", {}))
        return gen if stream else list(gen)

    def _visualize_features(self, model, variables, x, path):
        """Dump per-layer feature-map grids (reference predictor
        visualize=True -> plotting.py:573 feature_visualization)."""
        from ..utils.plotting import feature_visualization

        stem = Path(path).stem if isinstance(path, str) else "frame"
        vdir = Path(self.args.project or "runs") / "predict" / "features" / stem
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        feats = model.forward_features(variables, x[None])
        for name, fm in feats.items():
            feature_visualization(np.asarray(fm, np.float32), name, save_dir=vdir)

    def _stream(self, model, variables, source, names):
        if self._eval_fn is None:
            self._eval_fn = self._build_eval(model)
        # Concurrent multi-stream ingestion (reference data/loaders.py:31):
        # a LoadStreams instance, a "*.streams" list file, or a list of >=2
        # live specs runs thread-per-stream readers and batches the freshest
        # frame of every stream into ONE fixed-shape dispatch per step.
        from ..data.streams import LoadStreams

        multi = isinstance(source, LoadStreams)
        if not multi and isinstance(source, (str, Path)) and str(source).endswith(".streams"):
            source = LoadStreams(source, vid_stride=getattr(self.args, "vid_stride", 1))
            multi = True
        elif not multi and (
            isinstance(source, (list, tuple))
            and len(source) > 1
            and all(_is_live_spec(s) for s in source)
        ):
            source = LoadStreams(source, vid_stride=getattr(self.args, "vid_stride", 1))
            multi = True
        if multi:
            yield from self._stream_batched(model, variables, source, names)
            return
        imgsz = self.args.imgsz
        for path, orig in iter_source(source):
            t0 = time.perf_counter()
            x, gain, pad = self.preprocess_u8(orig, imgsz)
            t1 = time.perf_counter()
            out = self._eval_fn(variables, jnp.asarray(x)[None])
            out = {k: np.asarray(v) for k, v in out.items()}
            if getattr(self.args, "visualize", False):
                self._visualize_features(model, variables, x, path)
            t2 = time.perf_counter()
            res = self.postprocess(out, 0, orig, path, gain, pad, names)
            res.speed = {
                "preprocess": (t1 - t0) * 1e3,
                "inference": (t2 - t1) * 1e3,
                "postprocess": (time.perf_counter() - t2) * 1e3,
            }
            named = isinstance(path, str) and Path(path).suffix.lower() in IMG_FORMATS
            if named and (self.args.save or self.args.save_txt or self.args.save_crop):
                save_dir = Path(self.args.project or "runs") / "predict"
                save_dir.mkdir(parents=True, exist_ok=True)
                if self.args.save:
                    res.save(str(save_dir / Path(path).name))
                if self.args.save_txt:
                    res.save_txt(
                        str(save_dir / "labels" / (Path(path).stem + ".txt")),
                        save_conf=self.args.save_conf,
                    )
                if self.args.save_crop:
                    res.save_crop(save_dir / "crops", Path(path).stem)
            yield res

    def _stream_batched(self, model, variables, loader, names):
        """N live streams -> one batch-N dispatch per step, results demuxed
        per stream (reference LoadStreams + predictor batch semantics).

        The eval program compiles ONCE at batch=len(loader) and the shape
        never changes (ended streams re-serve their last frame), so the whole
        run is a single XLA executable — on TPU, N concurrent streams cost
        barely more than one (throughput is batch-bound, see
        data/streams.py docstring). Results are yielded flattened, one per
        stream per step, tagged with the stream's path id (reference
        stream_inference yields per-image results the same way)."""
        if self._eval_fn is None:
            self._eval_fn = self._build_eval(model)
        imgsz = self.args.imgsz
        try:
            for paths, frames in loader:
                t0 = time.perf_counter()
                xs, gains, pads = [], [], []
                for f in frames:
                    x, gain, pad = self.preprocess_u8(f, imgsz)
                    xs.append(x)
                    gains.append(gain)
                    pads.append(pad)
                batch = jnp.asarray(np.stack(xs))
                t1 = time.perf_counter()
                out = self._eval_fn(variables, batch)
                out = {k: np.asarray(v) for k, v in out.items()}
                t2 = time.perf_counter()
                n = len(frames)
                speed = {
                    "preprocess": (t1 - t0) * 1e3 / n,
                    "inference": (t2 - t1) * 1e3 / n,
                    "postprocess": 0.0,
                }
                for bi in range(n):
                    t3 = time.perf_counter()
                    res = self.postprocess(
                        out, bi, frames[bi], paths[bi], gains[bi], pads[bi], names
                    )
                    res.speed = dict(speed, postprocess=(time.perf_counter() - t3) * 1e3)
                    yield res
        finally:
            loader.close()


class SegmentationPredictor(BasePredictor):
    task = "segment"

    def postprocess(self, out, bi, orig, path, gain, pad, names):
        keep = out["valid"][bi]
        boxes = out["boxes"][bi][keep]
        ex = out["extras"][bi][keep]  # (n, 108)
        h, w = orig.shape[:2]
        boxes = (boxes - np.array([pad[0], pad[1], pad[0], pad[1]])) / gain
        boxes = np.clip(boxes, 0, [w, h, w, h])
        pts = np.stack([ex[:, :36], ex[:, 36:72]], -1)
        pts = (pts - np.array(pad)) / gain
        pts[..., 0] = pts[..., 0].clip(0, w)
        pts[..., 1] = pts[..., 1].clip(0, h)
        valid_rays = ex[:, 72:108] > 0.5
        data = np.concatenate(
            [boxes, out["scores"][bi][keep][:, None], out["classes"][bi][keep][:, None]], -1
        )
        # masks are LAZY: rasterized on the host the first time .masks is
        # read (results.contours_to_masks_host). The old eager device
        # rasterize was one extra dispatch PER REQUEST — on a tunneled TPU a
        # full link round-trip each, which dominated serving latency.
        return Results(
            orig, path, names, boxes=data, contours=(pts, valid_rays),
            lazy_masks=bool(self.args.retina_masks or self.args.boxes),
        )


class ClassificationPredictor(BasePredictor):
    task = "classify"

    def _build_eval(self, model):
        @jax.jit
        def eval_fn(variables, images):
            return model.predict(variables, _as_float(images))

        return eval_fn

    def preprocess(self, img, imgsz):
        from ..data.augment import classify_transform_eval

        return classify_transform_eval(img, imgsz), 1.0, (0.0, 0.0)

    def preprocess_u8(self, img, imgsz):
        # classify's eval transform normalizes on host; no u8 fast path
        # (a letterboxed u8 batch would skip the center-crop semantics)
        return self.preprocess(img, imgsz)

    def _stream(self, model, variables, source, names):
        if self._eval_fn is None:
            self._eval_fn = self._build_eval(model)
        for path, orig in iter_source(source):
            x, _, _ = self.preprocess(orig, self.args.imgsz)
            probs = np.asarray(self._eval_fn(variables, jnp.asarray(x)[None]))[0]
            yield Results(orig, path, names, probs=probs)


class SegmentationOriPredictor(BasePredictor):
    """Stock prototype-mask segmentation predictor (reference
    models/yolo/segment_ori/predict.py): NMS carries mask coefficients,
    masks = sigmoid(coeffs @ proto) cropped to each box, upsampled to the
    native image and thresholded (reference process_mask + scale_image)."""

    task = "segment_ori"

    def _build_eval(self, model):
        nc = model.nc
        args = self.args

        @jax.jit
        def eval_fn(variables, images):
            from ..ops.boxes import xywh2xyxy

            pred, proto = model.predict(variables, _as_float(images))
            boxes = jnp.transpose(pred[:, :4], (0, 2, 1))
            pred = pred.at[:, :4].set(jnp.transpose(xywh2xyxy(boxes), (0, 2, 1)))
            out = non_max_suppression(
                pred.astype(jnp.float32), nc=nc, conf_thres=args.conf,
                iou_thres=args.iou, pre_nms=getattr(args, "pre_nms", 1024),
                max_det=args.max_det, agnostic=args.agnostic_nms,
            )
            return {**out, "proto": proto.astype(jnp.float32)}

        return eval_fn

    def postprocess(self, out, bi, orig, path, gain, pad, names):
        keep = out["valid"][bi]
        boxes_lb = out["boxes"][bi][keep]  # letterbox px, for the proto crop
        h, w = orig.shape[:2]
        boxes = (boxes_lb - np.array([pad[0], pad[1], pad[0], pad[1]])) / gain
        boxes = np.clip(boxes, 0, [w, h, w, h])
        data = np.concatenate(
            [boxes, out["scores"][bi][keep][:, None], out["classes"][bi][keep][:, None]], -1
        )
        masks = None
        coeffs = out["extras"][bi][keep]  # (n, nm)
        if coeffs.shape[0]:
            proto = out["proto"][bi]  # (hp, wp, nm)
            hp, wp = proto.shape[:2]
            pm = 1.0 / (1.0 + np.exp(-(coeffs @ proto.reshape(-1, proto.shape[-1]).T)))
            pm = pm.reshape(-1, hp, wp)
            imgsz = self.args.imgsz
            r = hp / imgsz
            bx = boxes_lb * r
            py = np.arange(hp)[None, :, None]
            px = np.arange(wp)[None, None, :]
            inbox = (
                (px >= bx[:, 0, None, None]) & (px < bx[:, 2, None, None])
                & (py >= bx[:, 1, None, None]) & (py < bx[:, 3, None, None])
            )
            pm = np.where(inbox, pm, 0.0)
            # proto grid -> letterbox px -> strip pad -> native resolution
            masks = np.zeros((pm.shape[0], h, w), bool)
            x0, y0 = int(round(pad[0] * r)), int(round(pad[1] * r))
            x1 = wp - x0 if x0 else wp
            y1 = hp - y0 if y0 else hp
            for i in range(pm.shape[0]):
                crop = pm[i, y0:y1, x0:x1]
                masks[i] = cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR) > 0.5
        return Results(orig, path, names, boxes=data, masks=masks)


class PosePredictor(BasePredictor):
    task = "pose"

    def postprocess(self, out, bi, orig, path, gain, pad, names):
        res = super().postprocess(out, bi, orig, path, gain, pad, names)
        keep = out["valid"][bi]
        ex = out["extras"][bi][keep]  # (n, nk) raw kpts
        if ex.shape[1] % 3 == 0:
            k = ex.reshape(ex.shape[0], -1, 3).copy()
            k[..., :2] = (k[..., :2] - np.array(pad)) / gain
            res.keypoints = k
        return res
