"""Runtime loader for the PyTorch reference implementation (parity tests).

The reference at ``$PUZZLENET_REFERENCE`` (default /root/reference) is not
importable as shipped: model5_b.py imports nonexistent modules ``pct`` and
``pointtransformer_partseg`` (model5_b.py:30,45), pulls in
pytorch_lightning/open3d/matplotlib-pylab (absent in this environment), and
uses ``math`` without importing it (model5_b.py:70). This module makes the
*paper network* runnable anyway, for the BASELINE.md 1%-MSE parity contract:

* ``load_pointnet_util()`` imports the reference's real pointnet_util.py
  (clean imports), with ``farthest_point_sample`` wrapped so its random
  seed point (pointnet_util.py:65 ``torch.randint``) becomes the
  deterministic index-0 seed our ``ops.pointops.farthest_point_sample``
  defaults to — the only way two FPS implementations can be compared.
* ``load_model_classes()`` extracts the source blocks of
  ``scaled_dot_production`` (model5_b.py:67-75), ``layerAttention``
  (model5_b.py:83-101) and ``PCTransformer_nonsort`` (model5_b.py:411-478)
  from the reference file and exec's them in a namespace with the broken
  imports fixed. The classes that run are the reference's own code, read
  from /root/reference at call time — nothing is copied into this repo.
* ``ReferencePredict5`` is a minimal torch module holding the reference
  head stack (widths transcribed from model5_b.py:559-599 — architecture
  schema, not code) whose ``predict5`` replays the dataflow of
  model5_b.py:672-759 including the asymmetric-global quirk at
  model5_b.py:741-744 (both seg "globals" come from the mrpc branch).

Everything degrades to ``available() == False`` when the reference tree is
absent, so parity tests skip cleanly elsewhere.
"""

import importlib.util
import os
import sys
import types

_REF_ENV = "PUZZLENET_REFERENCE"
_DEFAULT_REF = "/root/reference"


def reference_root():
    return os.environ.get(_REF_ENV, _DEFAULT_REF)


def available():
    root = reference_root()
    return (os.path.isfile(os.path.join(root, "model5_b.py"))
            and os.path.isfile(os.path.join(root, "pointnet_util.py")))


def load_pointnet_util(deterministic_fps=True):
    """Import the reference pointnet_util.py from the reference tree.

    With ``deterministic_fps`` the module's ``farthest_point_sample`` is
    wrapped to seed from index 0 (matching ops/pointops.py's default
    ``start_idx=None``) by intercepting the ``torch.randint`` draw at
    pointnet_util.py:65; the max-min loop itself is untouched reference code.
    """
    import torch

    path = os.path.join(reference_root(), "pointnet_util.py")
    spec = importlib.util.spec_from_file_location("_pzl_ref_pointnet_util",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    if deterministic_fps:
        orig_fps = mod.farthest_point_sample

        def fps_seed0(xyz, npoint):
            real_randint = torch.randint

            def zero_randint(low, high, size, **kw):
                kw.setdefault("dtype", torch.long)
                return torch.zeros(size, **kw)

            torch.randint = zero_randint
            try:
                return orig_fps(xyz, npoint)
            finally:
                torch.randint = real_randint

        mod.farthest_point_sample = fps_seed0
    return mod


def _stub_module(name, **attrs):
    """Register an import placeholder so reference modules whose heavy deps
    (plyfile, open3d) are absent here can still import; any actual use of
    the stub fails loudly."""
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def load_reference_modules():
    """Import the reference's ``se_math`` package and ``metrics`` module.

    se_math/__init__.py pulls in mesh.py which needs plyfile + open3d
    (se_math/mesh.py:10-11) — stubbed, since the parity path
    (se3.exp/transform, metrics.py's error suite) never touches them.
    Returns (se3, metrics) — the reference's own modules.
    """
    _stub_module("plyfile", PlyData=None)
    _stub_module("open3d")
    root = reference_root()
    sys.path.insert(0, root)
    try:
        import se_math.se3 as ref_se3  # noqa: F401
    finally:
        sys.path.remove(root)

    spec = importlib.util.spec_from_file_location(
        "_pzl_ref_metrics", os.path.join(root, "metrics.py"))
    ref_metrics = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_metrics)
    return ref_se3, ref_metrics


def _extract_top_level_block(lines, header):
    """Source lines of the top-level def/class starting with ``header``
    (up to, excluding, the next top-level statement)."""
    start = None
    for i, line in enumerate(lines):
        if line.startswith(header):
            start = i
            break
    if start is None:
        raise LookupError(header)
    end = start + 1
    while end < len(lines):
        line = lines[end]
        if line.strip() and not line[0].isspace():
            break
        end += 1
    return "\n".join(lines[start:end])


def load_model_classes(pu=None):
    """Exec the reference's network-class sources; returns the namespace.

    Keys: ``scaled_dot_production``, ``layerAttention``,
    ``PCTransformer_nonsort`` — the reference's own class objects.
    """
    import math

    import numpy as np
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if pu is None:
        pu = load_pointnet_util()
    with open(os.path.join(reference_root(), "model5_b.py")) as f:
        lines = f.read().splitlines()

    ns = {"torch": torch, "nn": nn, "F": F, "np": np, "math": math,
          "pu": pu}
    for header in ("def scaled_dot_production",
                   "class layerAttention",
                   "class PCTransformer_nonsort"):
        exec(compile(_extract_top_level_block(lines, header),  # noqa: S102
                     "<reference model5_b.py>", "exec"), ns)
    return ns


def build_reference_predict5(num_points=1024, ns=None, quirk=True):
    """A runnable torch module equivalent to TouchedRegraster's predict5
    network path (encoders are the reference's exec'd classes).

    ``quirk=True`` is the reference's literal behavior (both seg globals
    from the mrpc branch, model5_b.py:741-744). ``quirk=False`` is the
    symmetric cross-swap (the architecture figure's intent, our model's
    default) — use it to evaluate checkpoints trained with
    ``asymmetric_global_quirk=False``.
    """
    import torch
    import torch.nn as nn

    if ns is None:
        ns = load_model_classes()
    PCT = ns["PCTransformer_nonsort"]
    cfg = types.SimpleNamespace()

    class ReferencePredict5(nn.Module):
        """predict5 (model5_b.py:672-759) with only the members that path
        touches. Head layouts from model5_b.py:559-599; member names match
        the reference state_dict so core/torch_compat.py applies directly.
        """

        def __init__(self):
            super().__init__()
            self.Encoder = PCT(cfg, num_points)
            self.Encoder2 = PCT(cfg, num_points)
            self.tfMLP = nn.Sequential(
                nn.Linear(2048, 1024), nn.ReLU(),
                nn.Linear(1024, 512), nn.ReLU(),
                nn.Linear(512, 512), nn.ReLU(),
                nn.Linear(512, 256), nn.ReLU(),
                nn.Linear(256, 6))

            def _pre():
                return nn.Sequential(nn.Linear(64, 64), nn.ReLU(),
                                     nn.Linear(64, 64), nn.ReLU(),
                                     nn.Linear(64, 64))

            def _head():
                return nn.Sequential(nn.Linear(128, 64), nn.ReLU(),
                                     nn.Linear(64, 32), nn.ReLU(),
                                     nn.Linear(32, 2))

            self.MLPLocalPreFpc = _pre()
            self.MLPLocalPreRpc = _pre()
            self.MLPFpcb = _head()
            self.MLPRpcb = _head()

        def predict5(self, fpc, mrpc):
            """model5_b.py:710-759 dataflow. Returns
            (twist [B,6], fpcb_logits [B,2,N], mrpcb_logits [B,2,N])."""
            n = fpc.shape[1]
            ffpcs = self.Encoder(fpc)
            fmrpcs = self.Encoder2(mrpc)
            out = self.tfMLP(torch.cat([ffpcs[0], fmrpcs[0]], dim=-1))

            non_sg_ffpc = self.MLPLocalPreFpc(ffpcs[4])
            non_sg_fmrpc = self.MLPLocalPreRpc(fmrpcs[4])
            # reference quirk (model5_b.py:741-744): BOTH seg globals are
            # max-pooled from the mrpc branch; quirk=False restores the
            # symmetric cross-swap (each piece gets the OTHER's global)
            gm = non_sg_fmrpc.max(dim=1, keepdim=True).values
            gm = gm.repeat(1, n, 1)
            if quirk:
                gf = gm
            else:
                gf = non_sg_ffpc.max(dim=1, keepdim=True).values
                gf = gf.repeat(1, n, 1)
            fpc_seg = torch.cat([gm, non_sg_ffpc], dim=-1)
            mrpc_seg = torch.cat([gf, non_sg_fmrpc], dim=-1)
            de_fpcb = self.MLPFpcb(fpc_seg).permute(0, 2, 1)
            de_mrpcb = self.MLPRpcb(mrpc_seg).permute(0, 2, 1)
            return out, de_fpcb, de_mrpcb

        forward = predict5

    return ReferencePredict5()
