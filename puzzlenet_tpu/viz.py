"""Point-cloud writers.

Capability parity with /root/reference/SavePly.py: ``save_ply`` writes an
ascii PLY with per-vertex color (fixed gray by default, matching
SavePly.py:19-49 which hardcodes "128 128 128"); ``save_pts`` writes the
bare xyz text format (SavePly.py:51-57). Pure numpy — no open3d dependency.
"""

import numpy as np


def save_ply(path, points, colors=None):
    """points [N, 3]; colors [N, 3] uint8 or a single RGB triple
    (default gray 128,128,128)."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if colors is None:
        colors = np.full((n, 3), 128, np.uint8)
    else:
        colors = np.asarray(colors, np.uint8)
        if colors.ndim == 1:
            colors = np.tile(colors, (n, 1))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {n}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p, c in zip(pts, colors):
            f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")


def save_pts(path, points):
    """Bare 'x y z ' lines (SavePTSnumpy format)."""
    pts = np.asarray(points)
    with open(path, "w") as f:
        for c in pts:
            f.write(f"{c[0]} {c[1]} {c[2]} \n")


# reference-style aliases
SavePLY = save_ply
SavePTSnumpy = save_pts
