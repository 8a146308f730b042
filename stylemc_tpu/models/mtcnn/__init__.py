from .visualize import show_bboxes  # noqa: F401
