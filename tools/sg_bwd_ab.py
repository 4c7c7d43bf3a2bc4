"""Hardware A/B: collapsed-algebra SG backward (_BWD_COLLAPSED) vs the
straightforward per-term backward.

Times the fused set-abstraction fwd+bwd at both encoder stage shapes
(stage 1: B=64, N=1024, S=512, MLP 67->128->128; stage 2: B=64, N=512,
S=256, MLP 131->256->256), f32 and bf16_mm, old vs collapsed kernel, and
checks gradient agreement on hardware (scale-aware, the mixed-precision
value-noise contract of tests/test_sg_fused.py::TestCollapsedBackward).
Run AFTER any training job (one TPU process at a time). Timing chains
``iters`` grad calls into the device queue with ONE host-readback sync at
the end (dispatch overlaps execution; the per-call number is the device
rate, not the relay), plus a measured empty-queue dispatch floor
subtraction on the reported per-iter time."""
import os, sys, time, json

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from puzzlenet_tpu.ops import sg_pallas

STAGES = {
    "stage1": dict(B=64, N=1024, S=512, K=32, C=64, CH=128, CO=128),
    "stage2": dict(B=64, N=512, S=256, K=32, C=128, CH=256, CO=256),
}


def make_args(cfg, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.standard_normal((cfg["B"], cfg["N"], 3),
                                          dtype=np.float32))
    q = xyz[:, :cfg["S"]]
    feats = jnp.asarray(rng.standard_normal((cfg["B"], cfg["N"], cfg["C"]),
                                            dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((cfg["C"] + 3, cfg["CH"]),
                                         dtype=np.float32) * 0.05)
    b1 = jnp.zeros((cfg["CH"],), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((cfg["CH"], cfg["CO"]),
                                         dtype=np.float32) * 0.05)
    b2 = jnp.zeros((cfg["CO"],), jnp.float32)
    return q, xyz, feats, w1, b1, w2, b2


def grad_fn(cfg, bf16_mm):
    K = cfg["K"]

    @jax.jit
    def f(q, xyz, feats, w1, b1, w2, b2):
        def loss(q, xyz, feats, w1, b1, w2, b2):
            out = sg_pallas.fused_set_abstraction(q, xyz, feats, w1, b1,
                                                  w2, b2, K, bf16_mm)
            return jnp.sum(out * out)
        return jax.grad(loss, argnums=(0, 2, 3, 4, 5, 6))(
            q, xyz, feats, w1, b1, w2, b2)
    return f


def timed(fn, args, iters=30):
    g = fn(*args)
    _ = np.asarray(g[0].ravel()[0])          # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        g = fn(*args)
    _ = np.asarray(g[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, g


def dispatch_floor_ms(reps=20):
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(f(x).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
    _ = np.asarray(y.ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def fwd_fn(cfg):
    K = cfg["K"]

    @jax.jit
    def f(q, xyz, feats, w1, b1, w2, b2):
        return sg_pallas.fused_set_abstraction(q, xyz, feats, w1, b1,
                                               w2, b2, K, True)
    return f


def timed_fwd(fn, args, iters=30):
    out = fn(*args)
    _ = np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3, np.asarray(out)


def main():
    assert sg_pallas.pallas_supported() and \
        jax.default_backend() == "tpu", "not on TPU: A/B meaningless"
    assert sg_pallas._PIPELINE
    assert not sg_pallas._LAYOUT_T and not sg_pallas._LAYOUT_TS
    res = {"dispatch_floor_ms": dispatch_floor_ms()}
    for stage, cfg in STAGES.items():
        assert sg_pallas.sorted_topk_supported(cfg["N"])
        args = make_args(cfg)
        # -- backward collapse: fwd+bwd timing + grad parity ------------
        for bf16_mm in (False, True):
            grads = {}
            for collapsed in (False, True):
                sg_pallas._BWD_COLLAPSED = collapsed
                # fresh jit per flag state: jit caches the first trace by
                # function identity + shapes, NOT module globals
                ms, g = timed(grad_fn(cfg, bf16_mm), args)
                key = f"{stage}_{'bf16' if bf16_mm else 'f32'}"
                res[f"{key}_{'new' if collapsed else 'old'}_ms"] = ms
                grads[collapsed] = [np.asarray(x) for x in g]
            sg_pallas._BWD_COLLAPSED = False
            # f32 collapsed backward carries hi/lo-bf16 value precision
            # (~2^-16) in its wide matmuls — not f32-exact
            tol = 2e-2 if bf16_mm else 1e-3
            worst = 0.0
            for a, b in zip(grads[False], grads[True]):
                scale = max(1.0, float(np.abs(a).max()))
                worst = max(worst, float(np.abs(a - b).max()) / scale)
            key = f"{stage}_{'bf16' if bf16_mm else 'f32'}"
            res[f"{key}_grad_rel_err"] = worst
            res[f"{key}_grad_ok"] = bool(worst <= tol)
            res[f"{key}_speedup"] = (res[f"{key}_old_ms"]
                                     / res[f"{key}_new_ms"])
        # -- forward collapse (bf16 serving primal) + value parity ------
        sg_pallas._FWD_COLLAPSED = False
        ms_old, out_old = timed_fwd(fwd_fn(cfg), args)
        sg_pallas._FWD_COLLAPSED = True
        ms_new, out_new = timed_fwd(fwd_fn(cfg), args)
        sg_pallas._FWD_COLLAPSED = False
        scale = max(1.0, float(np.abs(out_old).max()))
        res[f"{stage}_fwd_bf16_old_ms"] = ms_old
        res[f"{stage}_fwd_bf16_new_ms"] = ms_new
        res[f"{stage}_fwd_bf16_speedup"] = ms_old / ms_new
        res[f"{stage}_fwd_bf16_rel_err"] = (
            float(np.abs(out_old - out_new).max()) / scale)
        # -- both collapses together (bf16 train config) ----------------
        sg_pallas._FWD_COLLAPSED = True
        sg_pallas._BWD_COLLAPSED = True
        ms_both, _ = timed(grad_fn(cfg, True), args)
        sg_pallas._FWD_COLLAPSED = False
        sg_pallas._BWD_COLLAPSED = False
        res[f"{stage}_bf16_both_ms"] = ms_both
        res[f"{stage}_bf16_both_speedup"] = (res[f"{stage}_bf16_old_ms"]
                                             / ms_both)
    print(json.dumps(res, indent=1))
    with open("/root/repo/TRG/sg_bwd_ab.json", "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
