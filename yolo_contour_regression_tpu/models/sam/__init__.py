"""SAM (Segment Anything) family (reference models/sam/, 2739 LoC)."""
from .amg import generate_crop_boxes, point_grid, stability_score
from .model import SAM, Predictor, Sam, build_sam

__all__ = ["SAM", "Sam", "Predictor", "build_sam", "point_grid",
           "generate_crop_boxes", "stability_score"]
