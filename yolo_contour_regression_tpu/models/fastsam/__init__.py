"""FastSAM: everything-segmentation via the seg model + prompt post-hoc
(reference models/fastsam/, 809 LoC)."""
from .model import FastSAM
from .prompt import FastSAMPrompt

__all__ = ["FastSAM", "FastSAMPrompt"]
