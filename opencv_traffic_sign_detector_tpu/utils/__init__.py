from .serialization import write_results_file, detections_to_lines
from .annotate import draw_boxes_bgr

__all__ = ["write_results_file", "detections_to_lines", "draw_boxes_bgr"]
