"""Single-source-of-truth configuration.

Capability parity with the reference's argparse flags, which are duplicated
across train.py:26-62, test.py:27-60 and model5_b.py:1522-1556; here one
dataclass + one argparse shim keeps the README command lines working
(``--batch_size --lr --loss_mode --dataset --pretrain_epochs --use_emd2
--use_cd2 --use_emd3 --random --random_slice --loss_sum --alpha --beta
--epochs --save_on_epochs -m`` ...). ``per_parse``'s timestamped TRG/<date>
output dir and swap_axis flag (train.py:64-71) are reproduced in
``finalize``.
"""

import argparse
import dataclasses
import datetime
import json
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    # reference flags (train.py:26-62)
    output_path: str = "TRG"
    device: int = 0
    dim_k: int = 1024
    epochs: int = 100000
    max_iter: int = 50
    dt: str = "fr"
    mode: str = "train"
    batch_size: int = 2
    save_on_epochs: int = 1
    loss_mode: int = 0
    valp: int = 0
    m: str = "default string"
    loss_sum: bool = False
    pretrain_epochs: int = 700
    alpha: float = 1.0
    beta: float = 1.0
    lr: float = 1e-3
    dataset: str = "fr"
    look: bool = False
    random: bool = False
    use_emd2: bool = False
    use_cd2: bool = False
    use_emd3: bool = False
    random_slice: bool = False
    verbose: bool = False
    swap_axis: bool = True  # set by per_parse in the reference

    # framework extensions (TPU-native behavior)
    seed: int = 0
    num_points: int = 1024
    num_workers: int = 8
    loader_processes: bool = False    # process workers (fork) in Loader
    check_val_every_n_epoch: int = 10
    max_steps: Optional[int] = None          # cap steps (CI/smoke)
    data_dir: Optional[str] = None           # overrides $PUZZLENET_DATA_DIR
    synth_count: int = 64                    # synthetic fallback dataset size
    resume: Optional[str] = None             # checkpoint dir to resume from
    mesh_data: int = -1                      # -1: all devices on data axis
    mesh_model: int = 1                      # tensor-parallel axis size
    multihost: bool = False                  # jax.distributed.initialize
                                             # (DCN pod scale-out; see
                                             # core/sharding.py)
    profile_dir: Optional[str] = None        # jax.profiler trace output
    debug_nans: bool = False
    asymmetric_global_quirk: bool = False    # reproduce model5_b.py:741
    log_all_losses: bool = False             # compute+log losses outside the
                                             # active loss_mode (reference
                                             # always computes everything)
    early_stop_threshold: float = 7.0        # stop.txt marker threshold
    bf16: bool = False                       # bfloat16 activations
    device_data: Optional[bool] = None       # train via the on-device data
                                             # pipeline (fit_device_data).
                                             # None = auto: ON for synthetic
                                             # slicer categories (the README
                                             # recipe), OFF for host-payload
                                             # datasets. --host_data forces
                                             # the host Loader path.
    boundary_fp: bool = False                # beyond-reference boundary-head
                                             # enrichment: 3-NN feature
                                             # propagation of stage-1 SG
                                             # features into the heads
                                             # (models/puzzlenet.py); changes
                                             # the param tree, stored in the
                                             # run config for eval reload
    bnd_ce_w: float = 1.0                    # boundary-CE positive-class
                                             # weight (128/1024 imbalance)
    bnd_cd_w: float = 1.0                    # boundary-chamfer/EMD weight
    bnd_w: float = 1.0                       # whole-boundary-branch weight
                                             # vs the pose losses (1.0 =
                                             # reference; lower it where
                                             # boundary gradients crowd out
                                             # pose — train/losses.py)
    frag_cuts: int = 0                       # device-data path: pre-restrict
                                             # each cloud to a random
                                             # sub-fragment via r ~ U{0..n}
                                             # keep-one-side cuts before the
                                             # pair cut — trains at K-piece
                                             # assembly fragment sizes
                                             # (data/device_pipeline.py)
    postcut: float = 0.0                     # device-data path: probability
                                             # of re-cutting ONE side of the
                                             # training pair and keeping the
                                             # half nearer the other piece —
                                             # non-SIBLING adjacent pairs
                                             # (partial shared interface),
                                             # the K >= 6 assembly pair
                                             # geometry frag_cuts alone
                                             # never produces
                                             # (data/device_pipeline.py::
                                             # _postcut_sides)
    mag: float = 0.8                         # training twist magnitude
                                             # (RandomTransformSE3's 0.8,
                                             # transforms.py:151-197;
                                             # device-data path only).
                                             # Assembly-time relative
                                             # poses are COMPOSITIONS of
                                             # two scatter twists (norm up
                                             # to ~1.6), so assembly
                                             # checkpoints train with
                                             # --mag 1.7 --random; val and
                                             # the host test sets stay at
                                             # the reference's 0.8 for
                                             # comparability
    global_pose: float = 0.0                 # > 0: rigidly move the whole
                                             # training pair (both pieces +
                                             # boundaries) by a shared
                                             # U[0,1)-scaled twist of this
                                             # magnitude before the igt
                                             # twist — trains away the
                                             # canonical-fpc anchor so
                                             # assembly-time scattered
                                             # fixed pieces are
                                             # in-distribution
                                             # (data/device_pipeline.py)
    log_every: int = 50                      # scalar-log cadence (steps)
    save_every: int = 1000                   # device-data ckpt cadence
    viz_every: int = 500                     # TB mesh/attention cadence
                                             # (reference logs every step,
                                             # model5_b.py:972-982; 0 = off)

    def finalize(self):
        """per_parse equivalent (train.py:64-71): timestamped output dir."""
        if self.output_path == "TRG":
            stamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
            self.output_path = os.path.join("TRG", stamp)
        if self.data_dir:
            os.environ["PUZZLENET_DATA_DIR"] = self.data_dir
        self.swap_axis = True
        return self

    def save(self, path):
        """setting.txt dump (train.py:81-87 format) + machine-readable json."""
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "setting.txt"), "w") as f:
            f.write("-----------starting---------------\n")
            f.write(__file__ + "\n")
            f.write(datetime.datetime.now().ctime() + "\n")
            for k, v in dataclasses.asdict(self).items():
                f.write(f"{k}{' ' * 8}{v}\n")
            f.write("---------------ending-------------\n")
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path):
        with open(os.path.join(path, "config.json")) as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def parse_args(argv=None, **overrides):
    """argparse shim exposing the reference flag names."""
    p = argparse.ArgumentParser("puzzlenet-tpu")
    for f in dataclasses.fields(Config):
        flag = f"--{f.name}"
        if f.name == "device_data":
            p.add_argument(flag, dest="device_data", action="store_true",
                           default=None)
            p.add_argument("--host_data", dest="device_data",
                           action="store_false",
                           help="force the host Loader data path")
        elif f.type == bool or isinstance(f.default, bool):
            p.add_argument(flag, action="store_true", default=f.default)
        elif f.name == "m":
            p.add_argument("-m", "--m", type=str, default=f.default,
                           help="message for this run")
        else:
            # Optional fields: argparse needs the concrete element type
            optional_types = {"max_steps": int, "data_dir": str,
                              "resume": str, "profile_dir": str}
            typ = (optional_types.get(f.name, str) if f.default is None
                   else type(f.default))
            p.add_argument(flag, type=typ, default=f.default)
    ns = p.parse_args(argv)
    cfg = Config(**vars(ns))
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg.finalize()
