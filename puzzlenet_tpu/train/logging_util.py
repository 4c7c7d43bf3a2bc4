"""Observability: TensorBoard scalars/meshes/figures, optional profiler.

Capability parity with the reference's Lightning logging (SURVEY.md §5):
same scalar tags (train/loss_re, train/loss_g, train/loss_emd, lr, val/*,
train/fpc_iou, ...), point-cloud pairs via add_mesh (model5_b.py:897-902),
attention heatmaps via add_figure (1385-1407), run metadata via add_text
(904-910). Degrades to a no-op writer when tensorboard isn't importable.
"""

import numpy as np

_COLOR1 = np.array([1, 0.706, 0]) * 255       # model5_b.py:899
_COLOR2 = np.array([0, 0.651, 0.929]) * 255   # model5_b.py:900


class TBLogger:
    def __init__(self, logdir):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(logdir)
        except Exception:
            self._w = None

    def scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, metrics, step):
        for tag, v in metrics.items():
            self.scalar(tag, v, step)

    def text(self, tag, value):
        if self._w is not None:
            self._w.add_text(tag, str(value))

    def mesh_pair(self, tag, pc1, pc2, step):
        """Two-color point-cloud pair (vis, model5_b.py:897-902)."""
        if self._w is None:
            return
        import torch
        pc = np.concatenate([np.asarray(pc1), np.asarray(pc2)], axis=0)
        colors = np.concatenate([
            np.tile(_COLOR1, (len(pc1), 1)), np.tile(_COLOR2, (len(pc2), 1))])
        self._w.add_mesh(tag, torch.from_numpy(pc[None]).float(),
                         torch.from_numpy(colors[None]).int(),
                         global_step=step)

    def attention_figure(self, tag, x2, attention, step):
        """3-D scatter colored by mean attention (vis_attention,
        model5_b.py:1385-1407)."""
        if self._w is None:
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from matplotlib import cm
        except Exception:
            return
        coords = np.asarray(x2)
        a = np.asarray(attention).mean(axis=0)
        a = (a - a.min()) / max(a.max() - a.min(), 1e-12)
        fig = plt.figure(dpi=100, frameon=False)
        ax = fig.add_subplot(projection="3d")
        ax.scatter(coords[:, 0], coords[:, 1], coords[:, 2],
                   c=cm.cividis(a), marker="o", s=10)
        colmap = cm.ScalarMappable(cmap=cm.cividis)
        colmap.set_array(a)
        fig.colorbar(colmap, ax=ax)
        self._w.add_figure(tag, fig, global_step=step)

    def flush(self):
        if self._w is not None:
            self._w.flush()
