"""Hardware A/B: _EXTRACT2 pair extraction vs serial in the fused SG.

Times the fused stage-1 set-abstraction forward (B=64, N=1024, S=512,
k=32, MLP 67->128->128) with serial and pair extraction on the real
chip, checks bit-identity, and reports ms/iter. Run AFTER any training
job (one TPU process at a time). Timing uses a host readback
(block_until_ready is a no-op over the tunnel)."""
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
assert not sg_pallas._EXTRACT2 and not sg_pallas._LAYOUT_TS
# fail loudly if the pair path would silently fall back (a fallback A/B
# prints a plausible-looking speedup ~1.0 / bit_identical=true null)
assert sg_pallas.pallas_supported(), "not on TPU: kernel path unreachable"
assert sg_pallas._PIPELINE, "_PIPELINE off: stream path unreachable"
assert sg_pallas.sorted_topk_supported(N), \
    f"sorted_topk gate fails at N={N}: stream path unreachable"

outs = {}
for name, (ts, x2) in {"row": (False, False), "row_x2": (False, True),
                       "ts": (True, False), "ts_x2": (True, True)}.items():
    sg_pallas._LAYOUT_TS, sg_pallas._EXTRACT2 = ts, x2
    ms, out = run()
    res[f"{name}_ms"] = ms
    outs[name] = out
sg_pallas._LAYOUT_TS = sg_pallas._EXTRACT2 = False

res["bit_identical"] = bool(all((outs["row"] == o).all()
                                for o in outs.values()))
res["best"] = min(("row", "row_x2", "ts", "ts_x2"),
                  key=lambda n: res[f"{n}_ms"])
res["speedup_best_vs_row"] = res["row_ms"] / res[f"{res['best']}_ms"]
print(json.dumps(res))
with open("/root/repo/TRG/sg_ab_x2.json", "w") as f:
    json.dump(res, f)
