"""Benchmark: piece-pairs/sec on the flagship inference path.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

value        — jitted PuzzleNet forward (pose twist + boundary logits) at
               batch 64, 1024 points/piece, pairs/sec on the current JAX
               default device (the real TPU chip under the driver).
vs_baseline  — value / (PyTorch-CPU pairs/sec of an equivalent forward),
               i.e. the BASELINE.md target ratio (goal: >= 10x). The torch
               baseline is an independent reimplementation of the same
               architecture (NOT reference code), measured once and cached
               in .bench_cpu_baseline.json.
"""

import json
import os
import time

BATCH = 64
NPOINTS = 1024
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".bench_cpu_baseline.json")


def measure_tpu(batch=BATCH, n=NPOINTS, iters=20, warmup=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from puzzlenet_tpu.models import PuzzleNet

    rng = np.random.default_rng(0)
    fpc = jnp.asarray(rng.normal(size=(batch, n, 3)).astype(np.float32))
    mrpc = jnp.asarray(rng.normal(size=(batch, n, 3)).astype(np.float32))
    model = PuzzleNet(num_points=n)
    variables = model.init(jax.random.PRNGKey(0), fpc, mrpc, train=False)

    @jax.jit
    def forward(variables, fpc, mrpc):
        out = model.apply(variables, fpc, mrpc, train=False)
        return out.twist, out.fpcb_logits, out.mrpcb_logits

    def sync(r):
        # block_until_ready does not synchronize over the remote-TPU
        # tunnel; a host readback of one element does
        np.asarray(r[0].ravel()[0])

    for _ in range(warmup):
        r = forward(variables, fpc, mrpc)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = forward(variables, fpc, mrpc)
    sync(r)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def _torch_model(n):
    """Equivalent PyTorch-CPU forward (independent reimplementation of the
    same architecture for baseline measurement)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def fps(xyz, npoint):
        B, N, _ = xyz.shape
        dist = torch.full((B, N), 1e10)
        far = torch.zeros(B, dtype=torch.long)
        idx = torch.zeros(B, npoint, dtype=torch.long)
        ar = torch.arange(B)
        for i in range(npoint):
            idx[:, i] = far
            c = xyz[ar, far][:, None]
            d = ((xyz - c) ** 2).sum(-1)
            dist = torch.minimum(dist, d)
            far = dist.argmax(-1)
        return idx

    def gather(pts, idx):
        if idx.dim() == 2:
            return torch.gather(pts, 1,
                                idx[..., None].expand(-1, -1, pts.shape[-1]))
        b, s, k = idx.shape
        flat = torch.gather(
            pts, 1,
            idx.reshape(b, s * k)[..., None].expand(-1, -1, pts.shape[-1]))
        return flat.reshape(b, s, k, pts.shape[-1])

    def sg(npoint, k, xyz, feats):
        fidx = fps(xyz, npoint)
        new_xyz = gather(xyz, fidx)
        d = torch.cdist(new_xyz, xyz) ** 2
        idx = d.topk(k, largest=False).indices
        g = gather(xyz, idx) - new_xyz[:, :, None]
        return new_xyz, torch.cat([g, gather(feats, idx)], -1)

    class Attn(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.q, self.k = nn.Linear(d, d // 4), nn.Linear(d, d // 4)
            self.v, self.o = nn.Linear(d, d), nn.Linear(d, d)

        def forward(self, x):
            a = torch.softmax(
                self.q(x) @ self.k(x).transpose(1, 2)
                / (x.shape[-1] // 4) ** 0.5, -1)
            return x + F.relu(self.o(x - a @ self.v(x)))

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.m1, self.m2 = nn.Linear(3, 64), nn.Linear(64, 64)
            self.b1, self.b2 = nn.BatchNorm1d(n), nn.BatchNorm1d(n)
            self.m3, self.m4 = nn.Linear(67, 128), nn.Linear(128, 128)
            self.m5, self.m6 = nn.Linear(131, 256), nn.Linear(256, 256)
            self.at = nn.ModuleList([Attn(256) for _ in range(4)])
            self.out = nn.Linear(1280, 1024)

        def forward(self, xyz):
            xf = F.relu(self.b1(self.m1(xyz)))
            xf = F.relu(self.b2(self.m2(xf)))
            x1, f1 = sg(512, 32, xyz, xf)
            f1 = F.relu(self.m4(F.relu(self.m3(f1)))).max(-2).values
            _, f2 = sg(256, 32, x1, f1)
            f2 = F.relu(self.m6(F.relu(self.m5(f2)))).max(-2).values
            hs, h = [], f2
            for a in self.at:
                h = a(h)
                hs.append(h)
            att = torch.cat(hs + [f2], -1)
            return self.out(att).max(1).values, xf

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.e1, self.e2 = Enc(), Enc()
            self.pose = nn.Sequential(
                nn.Linear(2048, 1024), nn.ReLU(), nn.Linear(1024, 512),
                nn.ReLU(), nn.Linear(512, 512), nn.ReLU(),
                nn.Linear(512, 256), nn.ReLU(), nn.Linear(256, 6))
            mk = lambda: nn.Sequential(  # noqa: E731
                nn.Linear(64, 64), nn.ReLU(), nn.Linear(64, 64), nn.ReLU(),
                nn.Linear(64, 64))
            self.pf, self.pm = mk(), mk()
            mk2 = lambda: nn.Sequential(  # noqa: E731
                nn.Linear(128, 64), nn.ReLU(), nn.Linear(64, 32), nn.ReLU(),
                nn.Linear(32, 2))
            self.hf, self.hm = mk2(), mk2()

        def forward(self, fpc, mrpc):
            gf, xff = self.e1(fpc)
            gm, xfm = self.e2(mrpc)
            twist = self.pose(torch.cat([gf, gm], -1))
            nf, nm = self.pf(xff), self.pm(xfm)
            fg = nf.max(1, keepdim=True).values.expand(-1, n, -1)
            mg = nm.max(1, keepdim=True).values.expand(-1, n, -1)
            lf = self.hf(torch.cat([mg, nf], -1)).permute(0, 2, 1)
            lm = self.hm(torch.cat([fg, nm], -1)).permute(0, 2, 1)
            return twist, lf, lm

    return Net().eval()


def measure_torch_cpu(batch=4, n=NPOINTS, iters=3):
    import numpy as np
    import torch

    model = _torch_model(n)
    rng = np.random.default_rng(0)
    fpc = torch.from_numpy(rng.normal(size=(batch, n, 3)).astype("float32"))
    mrpc = torch.from_numpy(rng.normal(size=(batch, n, 3)).astype("float32"))
    with torch.no_grad():
        model(fpc, mrpc)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(fpc, mrpc)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def cpu_baseline():
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            return json.load(f)["pairs_per_sec"]
    pps = measure_torch_cpu()
    with open(_CACHE, "w") as f:
        json.dump({"pairs_per_sec": pps, "batch": 4, "n": NPOINTS}, f)
    return pps


def main():
    value = measure_tpu()
    baseline = cpu_baseline()
    print(json.dumps({
        "metric": "inference_pairs_per_sec_1024pts",
        "value": round(value, 2),
        "unit": "piece-pairs/s/chip",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
