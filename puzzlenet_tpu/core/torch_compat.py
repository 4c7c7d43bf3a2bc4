"""Reference-checkpoint conversion: torch/Lightning state_dict -> flax trees.

The parity contract (BASELINE.md) requires running reference checkpoints
through this framework within fp32 tolerance. This module maps the
reference TouchedRegraster state_dict naming (model5_b.py:519-599) onto the
PuzzleNet param/batch_stats pytrees:

  Encoder.*   -> encoder_fpc.*         Encoder2.*  -> encoder_mrpc.*
  mlpN.weight -> Dense kernel (transposed [out,in] -> [in,out])
  bnN.{weight,bias,running_mean,running_var}
              -> bn N scale/bias + batch_stats mean/var
  mlp3/mlp4   -> mlp34a/mlp34b fused set-abstraction params (same for 5/6)
  attenN.{mlpq,mlpk,mlpv,out} -> attenN.{q,k,v,out}
  tfMLP.{0,2,4,6,8}           -> pose_mlp.Dense_{0..4}
  MLPLocalPreFpc/Rpc.{0,2,4}  -> local_pre_fpc/rpc.Dense_{0..2}
  MLPFpcb/Rpcb.{0,2,4}        -> head_fpcb/rpcb.Dense_{0..2}

Lightning checkpoints prefix keys with "model." or nothing and carry
hyper_parameters; both raw state_dicts and full Lightning checkpoint dicts
are accepted. Unused reference members (fpc_decoder/rpc_decoder — the
BiDecoderNoneCross modules predict5 never calls — and the `dt` Jacobian
step parameter, model5_b.py:541-543) are skipped.

Set ``asymmetric_global_quirk=True`` on the PuzzleNet when evaluating
converted reference checkpoints (PARITY.md deviation 4).
"""

import numpy as np

_ENC = {"Encoder": "encoder_fpc", "Encoder2": "encoder_mrpc"}
_ATT = {"mlpq": "q", "mlpk": "k", "mlpv": "v", "out": "out"}
_SEQ = {
    "tfMLP": ("pose_mlp", 5),
    "MLPLocalPreFpc": ("local_pre_fpc", 3),
    "MLPLocalPreRpc": ("local_pre_rpc", 3),
    "MLPFpcb": ("head_fpcb", 3),
    "MLPRpcb": ("head_rpcb", 3),
}
_SG = {"mlp3": "mlp34a", "mlp4": "mlp34b", "mlp5": "mlp56a",
       "mlp6": "mlp56b"}
_SKIP_PREFIXES = ("fpc_decoder", "rpc_decoder", "Decoder", "mrpcbDecoder",
                  "dt", "sort")


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value, np.float32)


def convert_state_dict(state_dict):
    """torch state_dict (str -> array-like) -> (params, batch_stats) dicts
    matching PuzzleNet.init's tree structure."""
    params, stats = {}, {}
    for key, val in state_dict.items():
        if key.startswith("model."):
            key = key[len("model."):]
        parts = key.split(".")
        if parts[0] in _SKIP_PREFIXES:
            continue
        val = np.asarray(
            val.detach().cpu().numpy() if hasattr(val, "detach") else val)

        if parts[0] in _ENC:
            enc = _ENC[parts[0]]
            sub, leaf = parts[1], parts[-1]
            if sub in ("mlp1", "mlp2", "out"):
                _set(params, (enc, sub,
                              "kernel" if leaf == "weight" else "bias"),
                     val.T if leaf == "weight" else val)
            elif sub in _SG:
                base = _SG[sub]
                suffix = "_kernel" if leaf == "weight" else "_bias"
                _set(params, (enc, base + suffix),
                     val.T if leaf == "weight" else val)
            elif sub.startswith("atten"):
                proj = _ATT[parts[2]]
                _set(params, (enc, sub, proj,
                              "kernel" if leaf == "weight" else "bias"),
                     val.T if leaf == "weight" else val)
            elif sub in ("bn1", "bn2"):
                if leaf == "weight":
                    _set(params, (enc, sub, "BatchNorm_0", "scale"), val)
                elif leaf == "bias":
                    _set(params, (enc, sub, "BatchNorm_0", "bias"), val)
                elif leaf == "running_mean":
                    _set(stats, (enc, sub, "BatchNorm_0", "mean"), val)
                elif leaf == "running_var":
                    _set(stats, (enc, sub, "BatchNorm_0", "var"), val)
                # num_batches_tracked: no flax equivalent, dropped
            continue

        if parts[0] in _SEQ:
            mod, n_layers = _SEQ[parts[0]]
            seq_idx = int(parts[1])
            assert seq_idx % 2 == 0 and seq_idx // 2 < n_layers, key
            leaf = parts[-1]
            _set(params, (mod, f"Dense_{seq_idx // 2}",
                          "kernel" if leaf == "weight" else "bias"),
                 val.T if leaf == "weight" else val)
            continue
        # anything else (optimizer buffers etc.) is ignored

    return params, stats


def convert_lightning_checkpoint(path_or_dict):
    """Load a Lightning .ckpt (torch.load) and convert; returns
    (params, batch_stats, hparams)."""
    if isinstance(path_or_dict, (str, bytes)):
        import torch
        ckpt = torch.load(path_or_dict, map_location="cpu",
                          weights_only=False)
    else:
        ckpt = path_or_dict
    sd = ckpt.get("state_dict", ckpt)
    hparams = ckpt.get("hyper_parameters", {})
    params, stats = convert_state_dict(sd)
    return params, stats, hparams


def export_state_dict(params, batch_stats):
    """Inverse mapping: our trees -> a reference-named torch-style
    state_dict of numpy arrays (for roundtrip tests and for exporting
    checkpoints back to the reference)."""
    out = {}
    inv_enc = {v: k for k, v in _ENC.items()}
    inv_att = {v: k for k, v in _ATT.items()}
    inv_sg = {v: k for k, v in _SG.items()}
    inv_seq = {v[0]: k for k, v in _SEQ.items()}

    for enc_flax, enc_t in ((k, inv_enc[k]) for k in inv_enc):
        sub = params[enc_flax]
        for name in ("mlp1", "mlp2", "out"):
            out[f"{enc_t}.{name}.weight"] = np.asarray(sub[name]["kernel"]).T
            out[f"{enc_t}.{name}.bias"] = np.asarray(sub[name]["bias"])
        for base, tname in inv_sg.items():
            out[f"{enc_t}.{tname}.weight"] = np.asarray(
                sub[base + "_kernel"]).T
            out[f"{enc_t}.{tname}.bias"] = np.asarray(sub[base + "_bias"])
        for i in range(1, 5):
            for proj, tproj in inv_att.items():
                out[f"{enc_t}.atten{i}.{tproj}.weight"] = np.asarray(
                    sub[f"atten{i}"][proj]["kernel"]).T
                out[f"{enc_t}.atten{i}.{tproj}.bias"] = np.asarray(
                    sub[f"atten{i}"][proj]["bias"])
        for bn in ("bn1", "bn2"):
            out[f"{enc_t}.{bn}.weight"] = np.asarray(
                sub[bn]["BatchNorm_0"]["scale"])
            out[f"{enc_t}.{bn}.bias"] = np.asarray(
                sub[bn]["BatchNorm_0"]["bias"])
            st = batch_stats[enc_flax][bn]["BatchNorm_0"]
            out[f"{enc_t}.{bn}.running_mean"] = np.asarray(st["mean"])
            out[f"{enc_t}.{bn}.running_var"] = np.asarray(st["var"])

    for mod, tname in inv_seq.items():
        dense_keys = sorted(params[mod].keys(),
                            key=lambda s: int(s.split("_")[1]))
        for i, dk in enumerate(dense_keys):
            out[f"{tname}.{2 * i}.weight"] = np.asarray(
                params[mod][dk]["kernel"]).T
            out[f"{tname}.{2 * i}.bias"] = np.asarray(params[mod][dk]["bias"])
    return out
