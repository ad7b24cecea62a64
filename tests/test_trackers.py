"""Tracker behavior tests: identity persistence across frames, occlusion
recovery, BYTE low-score rescue (reference has no tracker tests)."""
import numpy as np

from yolo_contour_regression_tpu.trackers import BOTSORT, BYTETracker


def moving_box(t, speed=5.0):
    x = 50 + speed * t
    return np.array([[x, 50, x + 40, 100]], np.float32)


def test_bytetracker_identity_persists():
    tk = BYTETracker(new_track_thresh=0.5)
    ids = []
    for t in range(10):
        out = tk.update(moving_box(t), np.array([0.9]), np.array([0]))
        if out.shape[0]:
            ids.append(int(out[0, 4]))
    assert len(ids) >= 9
    assert len(set(ids)) == 1  # one stable identity


def test_bytetracker_two_objects():
    tk = BYTETracker(new_track_thresh=0.5)
    for t in range(8):
        boxes = np.concatenate([moving_box(t), moving_box(t) + 200])
        out = tk.update(boxes, np.array([0.9, 0.8]), np.array([0, 1]))
    assert out.shape[0] == 2
    assert len(set(out[:, 4].astype(int))) == 2


def test_bytetracker_low_score_rescue():
    tk = BYTETracker(new_track_thresh=0.5, track_low_thresh=0.1)
    for t in range(5):
        tk.update(moving_box(t), np.array([0.9]), np.array([0]))
    # confidence drops below high thresh: BYTE stage-2 keeps the track alive
    out = tk.update(moving_box(5), np.array([0.3]), np.array([0]))
    assert out.shape[0] == 1


def test_bytetracker_occlusion_recovery():
    tk = BYTETracker(new_track_thresh=0.5, track_buffer=30)
    tid = None
    for t in range(5):
        out = tk.update(moving_box(t), np.array([0.9]), np.array([0]))
        tid = int(out[0, 4])
    # 3 empty frames (occlusion)
    for t in range(5, 8):
        tk.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0))
    out = tk.update(moving_box(8), np.array([0.9]), np.array([0]))
    assert out.shape[0] == 1
    assert int(out[0, 4]) == tid  # same identity recovered


def test_botsort_with_frames():
    tk = BOTSORT(new_track_thresh=0.5)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (200, 400, 3), dtype=np.uint8)
    for t in range(6):
        out = tk.update(moving_box(t), np.array([0.9]), np.array([0]), frame=frame)
    assert out.shape[0] == 1

def test_gmc_methods_recover_translation():
    """Every GMC estimator recovers a synthetic camera shift (reference
    trackers/utils/gmc.py orb/sift/ecc/sparseOptFlow selector)."""
    import cv2
    import numpy as np

    from yolo_contour_regression_tpu.trackers.bot_sort import GMC

    rng = np.random.RandomState(7)
    base = (rng.rand(240, 320) * 255).astype(np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 3)  # smooth texture -> trackable
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    dx, dy = 6.0, -4.0
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    shifted = cv2.warpAffine(base, M, (320, 240))

    for method in ("sparseOptFlow", "orb", "sift", "ecc"):
        g = GMC(method=method, downscale=1)
        first = g.apply(base)
        assert np.allclose(first, np.eye(2, 3), atol=1e-5)  # no prior frame
        H = g.apply(shifted)
        # interior crop avoids border effects; tolerate ~1px estimator noise
        assert abs(H[0, 2] - dx) < 1.5 and abs(H[1, 2] - dy) < 1.5, (method, H)

    g = GMC(method="none")
    assert np.allclose(g.apply(base), np.eye(2, 3))

    import pytest

    with pytest.raises(ValueError):
        GMC(method="bogus")
