from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker
from .track import build_tracker, track_results

__all__ = ["BOTSORT", "BYTETracker", "build_tracker", "track_results"]
