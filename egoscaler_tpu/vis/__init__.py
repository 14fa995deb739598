"""Visualization: headless mp4 renderers + self-contained interactive
HTML viewers (vis/video.py, vis/interactive.py, Hot3DVisualizer
equivalents)."""
from egoscaler_tpu.vis.interactive import (
    export_hot3d_html,
    export_interactive_html,
)
from egoscaler_tpu.vis.render import (
    load_trajectory,
    render_demo,
    render_trajectory_frames,
    write_video,
)

__all__ = [
    "export_hot3d_html",
    "export_interactive_html",
    "load_trajectory",
    "render_demo",
    "render_trajectory_frames",
    "write_video",
]
