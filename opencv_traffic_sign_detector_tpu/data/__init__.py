from .gt import GroundTruthBox, load_ground_truth, load_results_file
from .images import load_image_bgr, load_directory_images, list_frame_files

__all__ = [
    "GroundTruthBox",
    "load_ground_truth",
    "load_results_file",
    "load_image_bgr",
    "load_directory_images",
    "list_frame_files",
]
