"""SAM model assembly + promptable predictor.

Re-implementation of the reference ``models/sam/`` surface: ``Sam``
(modules/sam.py: encoder + prompt encoder + mask decoder with pre/post),
``build_sam`` size variants (build.py), and the prompt ``Predictor``
(predict.py): set_image once, then point/box prompts produce masks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import LOGGER
from .modules import ImageEncoderViT, MaskDecoder, PromptEncoder

SAM_VARIANTS = {
    # embed_dim, depth, num_heads, global_attn_indexes
    "sam_b": (768, 12, 12, (2, 5, 8, 11)),
    "sam_l": (1024, 24, 16, (5, 11, 17, 23)),
    "sam_h": (1280, 32, 16, (7, 15, 23, 31)),
}
# TinyViT-encoder variants (reference build.py:build_mobile_sam)
MOBILE_VARIANTS = ("mobile_sam", "sam_t")


class Sam:
    """Functional SAM: variables pytree + pure apply fns."""

    mask_threshold: float = 0.0
    # official SAM input normalization ((x_255 - mean) / std, zero-padded
    # AFTER normalize) — required for converted pretrained checkpoints
    pixel_mean = np.array([123.675, 116.28, 103.53], np.float32)
    pixel_std = np.array([58.395, 57.12, 57.375], np.float32)

    def __init__(self, variant: str = "sam_b", img_size: int = 1024, dtype=jnp.float32):
        self.img_size = img_size
        if variant in MOBILE_VARIANTS:  # MobileSAM: TinyViT-5M encoder
            from .tinyvit import TinyViT

            self.encoder = TinyViT(img_size=img_size, dtype=dtype)
        else:
            ed, depth, nh, gai = SAM_VARIANTS[variant]
            self.encoder = ImageEncoderViT(
                img_size=img_size, embed_dim=ed, depth=depth, num_heads=nh,
                global_attn_indexes=gai, dtype=dtype,
            )
        emb_hw = img_size // 16
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(emb_hw, emb_hw),
            input_image_size=(img_size, img_size), dtype=dtype,
        )
        self.decoder = MaskDecoder(dtype=dtype)
        self.variables: Optional[Dict] = None

    def init(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, self.img_size, self.img_size, 3))
        enc_v = self.encoder.init(k1, dummy)
        pts = jnp.zeros((1, 2, 2))
        labs = jnp.zeros((1, 2), jnp.int32)
        pe_v = self.prompt_encoder.init(k2, pts, labs)
        sparse, dense, image_pe = self.prompt_encoder.apply(pe_v, pts, labs)
        emb_hw = self.img_size // 16
        dummy_emb = jnp.zeros((1, emb_hw, emb_hw, 256))
        dec_v = self.decoder.init(k3, dummy_emb, image_pe, sparse, dense)
        self.variables = {"encoder": enc_v, "prompt": pe_v, "decoder": dec_v}
        return self.variables

    # -- pure fns -------------------------------------------------------------
    def encode_image(self, variables, image):
        """image (B, S, S, 3) float, normalized per ``pixel_mean``/``std``
        -> embeddings (B, S/16, S/16, 256)."""
        return self.encoder.apply(variables["encoder"], image)

    def load_torch_weights(self, source, strict: bool = True):
        """Load an official SAM checkpoint (``sam_vit_b/l/h .pth`` state
        dict, reference models/sam/build.py:133 attempt_download + load) —
        ``source`` is a path or an already-extracted name->numpy dict."""
        from ...utils.torch_convert import (
            convert_sam_state_dict,
            extract_state_dict,
            load_torch_checkpoint,
        )

        if not isinstance(source, dict):
            source = extract_state_dict(load_torch_checkpoint(source))
        if self.variables is None:
            self.init()
        self.variables, report = convert_sam_state_dict(
            source, self.variables, strict=strict
        )
        return report

    def decode_prompts(self, variables, embeddings, points, labels, multimask=True):
        sparse, dense, image_pe = self.prompt_encoder.apply(
            variables["prompt"], points, labels
        )
        return self.decoder.apply(
            variables["decoder"], embeddings, image_pe, sparse, dense,
            multimask_output=multimask,
        )

    @property
    def num_params(self):
        if self.variables is None:
            self.init()
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(self.variables))


class Predictor:
    """Promptable predictor (reference models/sam/predict.py Predictor)."""

    def __init__(self, model: Optional[Sam] = None, img_size: int = 1024):
        self.model = model or Sam(img_size=img_size)
        if self.model.variables is None:
            self.model.init()
        self._emb = None
        self._scale = 1.0
        self._orig_hw = None
        self._encode = jax.jit(self.model.encode_image)
        self._decode = jax.jit(
            lambda v, e, p, l: self.model.decode_prompts(v, e, p, l)
        )

    def set_image(self, image: np.ndarray):
        """BGR uint8 image -> cached embeddings."""
        import cv2

        self._orig_hw = image.shape[:2]
        s = self.model.img_size
        r = min(s / image.shape[0], s / image.shape[1])
        nh, nw = round(image.shape[0] * r), round(image.shape[1] * r)
        resized = cv2.resize(image, (nw, nh))
        rgb = cv2.cvtColor(resized, cv2.COLOR_BGR2RGB).astype(np.float32)
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = (rgb - self.model.pixel_mean) / self.model.pixel_std
        self._scale = r
        self._emb = self._encode(self.model.variables, jnp.asarray(canvas)[None])

    def predict(self, point_coords=None, point_labels=None, box=None, multimask_output=True):
        """Points (P, 2) px + labels (P,), and/or box (4,) xyxy px ->
        (masks (T, H, W) bool, iou_pred (T,))."""
        assert self._emb is not None, "call set_image first"
        pts, labs = [], []
        if point_coords is not None:
            pts.extend(np.asarray(point_coords, np.float32) * self._scale)
            labs.extend(np.asarray(point_labels, np.int32))
        if box is not None:
            b = np.asarray(box, np.float32) * self._scale
            pts.extend([b[:2], b[2:]])
            labs.extend([2, 3])
        else:
            # official _embed_points pads a (0,0)/-1 point whenever no box
            # prompt is present — checkpoint numerics depend on it
            pts.append([0.0, 0.0])
            labs.append(-1)
        if not pts:
            pts, labs = [[0.0, 0.0]], [-1]
        p = jnp.asarray(np.asarray(pts, np.float32))[None]
        l = jnp.asarray(np.asarray(labs, np.int32))[None]
        masks, iou = self._decode(self.model.variables, self._emb, p, l)
        masks = np.asarray(masks)[0]  # (T, s/4, s/4)
        import cv2

        h, w = self._orig_hw
        s = self.model.img_size
        out = []
        for m in masks:
            full = cv2.resize(m, (s, s), interpolation=cv2.INTER_LINEAR)
            crop = full[: round(h * self._scale), : round(w * self._scale)]
            out.append(cv2.resize(crop, (w, h)) > self.model.mask_threshold)
        return np.stack(out), np.asarray(iou)[0]


def build_sam(variant: str = "sam_b", img_size: int = 1024) -> Sam:
    """(reference models/sam/build.py build_sam): NOTE pretrained SAM weights
    cannot be fetched in this zero-egress environment; the architecture is
    fully functional for training/fine-tuning and for loading converted
    weights via the variables pytree."""
    if variant not in SAM_VARIANTS and variant not in MOBILE_VARIANTS:
        raise ValueError(
            f"variant '{variant}' not in {list(SAM_VARIANTS) + list(MOBILE_VARIANTS)}"
        )
    return Sam(variant=variant, img_size=img_size)


class SAM:
    """User-facing handle (reference models/sam/model.py SAM)."""

    def __init__(self, model: str = "sam_b", img_size: int = 1024):
        if str(model).endswith((".pt", ".pth")):
            # checkpoint path: infer the variant from the filename
            # (sam_b.pt / sam_vit_l.pth / mobile_sam.pt ...), build, convert
            stem = str(model).rsplit("/", 1)[-1]
            variant = next(
                (v for v in ("sam_h", "sam_l", "sam_b", "mobile_sam", "sam_t")
                 if v in stem or v.replace("sam_", "vit_") in stem),
                "sam_b",
            )
            self.model = build_sam(variant, img_size)
            self.model.init()
            self.model.load_torch_weights(model)
        else:
            self.model = build_sam(model, img_size)
        self.predictor: Optional[Predictor] = None

    def predict(self, source, points=None, labels=None, bboxes=None, **kw):
        import cv2

        if self.predictor is None:
            self.predictor = Predictor(self.model)
        img = cv2.imread(source) if isinstance(source, str) else np.asarray(source)
        self.predictor.set_image(img)
        masks, iou = self.predictor.predict(points, labels, bboxes)
        return masks, iou

    def info(self):
        n = self.model.num_params
        LOGGER.info(f"SAM: {n:,} params @ {self.model.img_size}px")
        return {"parameters": n}
