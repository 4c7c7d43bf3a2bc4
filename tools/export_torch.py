"""Export a training run's checkpoint as a reference-format torch file.

Closes the interop loop in the reverse direction of test_reference_parity:
weights trained here load into the reference's own network
(model5_b.py:519-599 module names) via ``torch.load`` /
``load_state_dict``. Forced to CPU so it runs alongside TPU training.

    python tools/export_torch.py --run_dir TRG/<stamp> [--step N]
                                 [--out weights.ckpt]

Writes a Lightning-style dict {"state_dict": <reference-named tensors>,
"hyper_parameters": <run config>} — the shape test.py's
load_from_checkpoint consumes.
"""

import argparse
import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("export_torch")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", default=None,
                   help="output path (default <run_dir>/export_torch.ckpt)")
    ns = p.parse_args(argv)

    import numpy as np
    import torch

    from puzzlenet_tpu.core.torch_compat import export_state_dict
    from puzzlenet_tpu.infer import Session

    with open(os.path.join(ns.run_dir, "config.json")) as f:
        if json.load(f).get("boundary_fp"):
            raise SystemExit(
                "this run was trained with --boundary_fp (widened boundary "
                "heads); the reference network has no matching modules, so "
                "a reference-format export is not possible. Re-train "
                "without --boundary_fp for torch interop.")
    sess = Session.from_run(ns.run_dir, step=ns.step, batch_size=1)
    sd = export_state_dict(sess.variables["params"],
                           sess.variables["batch_stats"])
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}

    with open(os.path.join(ns.run_dir, "config.json")) as f:
        hparams = json.load(f)

    out = ns.out or os.path.join(ns.run_dir, "export_torch.ckpt")
    torch.save({"state_dict": tensors, "hyper_parameters": hparams}, out)
    print(f"exported {len(tensors)} tensors -> {out}")
    return out


if __name__ == "__main__":
    # CPU-only as a script so exports run alongside TPU training; NOT done
    # at import (tests import main() from their own configured backend).
    jax.config.update("jax_platforms", "cpu")
    main()
