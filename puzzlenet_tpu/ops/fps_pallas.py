"""Fused Pallas FPS kernel (TPU).

Design (lands in the perf phase; the lax fallback in pointops.py is
numerically identical): one pallas_call per batch, batch rows on sublanes,
point axis on lanes — dist [B, N] lives in VMEM across all npoint iterations
so the sequential max-min chain never touches HBM. This is the 10x lever
identified in BASELINE.json for the reference's Python-loop FPS
(pointnet_util.py:67-72, dataset.py:1147-1163).
"""


def pallas_supported():
    return False  # kernel lands in the perf phase; lax path is used until then


def fps_pallas(xyz, npoint, start):
    raise NotImplementedError
