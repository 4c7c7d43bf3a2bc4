"""Hardware A/B: _LAYOUT_TS hybrid SG selection layout vs row-major.

Times the fused stage-1 set-abstraction forward (B=64, N=1024, S=512,
k=32, MLP 67->128->128) in both layouts on the real chip, checks
bit-identity, and reports ms/iter. Run AFTER any training job (one TPU
process at a time). Timing uses a host readback (block_until_ready is a
no-op over the tunnel)."""
import os, sys, time, json

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from puzzlenet_tpu.ops import sg_pallas

B, N, S, K = 64, 1024, 512, 32
C, CH, CO = 64, 128, 128

rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.standard_normal((B, N, 3), dtype=np.float32))
new_xyz = xyz[:, :S]
feats = jnp.asarray(rng.standard_normal((B, N, C), dtype=np.float32))
w1 = jnp.asarray(rng.standard_normal((C + 3, CH), dtype=np.float32) * 0.05)
b1 = jnp.zeros((CH,), jnp.float32)
w2 = jnp.asarray(rng.standard_normal((CH, CO), dtype=np.float32) * 0.05)
b2 = jnp.zeros((CO,), jnp.float32)


def run(iters=30):
    fn = jax.jit(lambda q, x, f: sg_pallas.fused_set_abstraction(
        q, x, f, w1, b1, w2, b2, K))
    out = fn(new_xyz, xyz, feats)
    _ = np.asarray(out.ravel()[0])          # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(new_xyz, xyz, feats)
    _ = np.asarray(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, np.asarray(out)


res = {}
assert not sg_pallas._LAYOUT_T and not sg_pallas._LAYOUT_TS
# fail loudly if the TS kernel would silently fall back to row-major
# (CPU, or a pipeline/top-k gate miss) — a fallback A/B prints a
# plausible-looking speedup ~1.0 / bit_identical=true null result
assert sg_pallas.pallas_supported(), "not on TPU: TS path unreachable"
assert sg_pallas._PIPELINE, "_PIPELINE off: TS path unreachable"
assert sg_pallas.sorted_topk_supported(N), \
    f"sorted_topk gate fails at N={N}: TS path unreachable"
ms_row, out_row = run()
res["row_major_ms"] = ms_row

sg_pallas._LAYOUT_TS = True
ms_ts, out_ts = run()
res["layout_ts_ms"] = ms_ts
sg_pallas._LAYOUT_TS = False

res["bit_identical"] = bool((out_row == out_ts).all())
res["speedup"] = ms_row / ms_ts
print(json.dumps(res))
with open("/root/repo/TRG/sg_ab_ts.json", "w") as f:
    json.dump(res, f)
