"""Train CLI.

Capability parity with /root/reference/train.py: same flags (via
core.config), the setting.txt/model.txt dumps, dataset registry lookup,
fit + final test. Usage mirrors the README recipe:

    python -m puzzlenet_tpu.cli.train --batch_size 64 --lr 0.9e-3 \
        --loss_mode 1 --dataset vaser --pretrain_epochs 0
"""

from ..core.config import parse_args
from ..data import get_dataset
from ..train.evaluator import evaluate
from ..train.trainer import Trainer


def main(argv=None):
    cfg = parse_args(argv)
    from ..core.sharding import maybe_initialize_distributed
    maybe_initialize_distributed(cfg)
    print("************************************")
    print("     ", cfg.output_path)
    print("************************************")

    train_ds, val_ds, test_ds = get_dataset(
        cfg.dataset, random=cfg.random, random_slice=cfg.random_slice,
        synth_count=cfg.synth_count, num_points=cfg.num_points)
    print(f"train={len(train_ds)} val={len(val_ds)} test={len(test_ds)}")

    trainer = Trainer(cfg)
    from ..data.registry import supports_device_pairs
    use_device_pairs = (cfg.device_data is not False
                        and supports_device_pairs(cfg.dataset))
    use_device_data = cfg.device_data
    if use_device_data is None and not use_device_pairs:
        # auto: the on-device pipeline is the fast path (one dispatch per
        # step, ~18 ms/batch vs ~135 ms/item host generation) — default to
        # it wherever the category supports it; --host_data opts out
        from ..data.registry import supports_device_pipeline
        use_device_data = supports_device_pipeline(cfg.dataset)
        if use_device_data:
            print("data path: on-device pipeline (use --host_data for the "
                  "host Loader)")
    if use_device_pairs:
        # fragment-pair categories: geometry precomputed once on the host
        # (the registry's cached datasets), per-draw twist augmentation on
        # device — no host Loader in the step loop (~100 ms/item saved)
        from ..data.registry import category_pairs
        print("data path: device-resident precomputed pairs "
              "(use --host_data for the host Loader)")
        pairs = category_pairs(cfg.dataset)
        steps = cfg.max_steps or cfg.epochs * max(
            1, len(train_ds) // cfg.batch_size)
        state = trainer.fit_device_pairs(pairs, steps,
                                         log_every=cfg.log_every,
                                         save_every=cfg.save_every)
    elif use_device_data:
        # on-device data path: the whole-cloud stack lives on the TPU and
        # every batch (cut + FPS + boundary + twist) is generated under jit
        from ..data.registry import category_clouds
        clouds = category_clouds(cfg.dataset, synth_count=cfg.synth_count)
        steps = cfg.max_steps or cfg.epochs * max(
            1, len(train_ds) // cfg.batch_size)
        state = trainer.fit_device_data(clouds, steps,
                                        log_every=cfg.log_every,
                                        save_every=cfg.save_every)
    else:
        state = trainer.fit(train_ds, val_ds)

    result = evaluate(trainer.model, state.params, state.batch_stats,
                      test_ds, output_path=cfg.output_path,
                      batch_size=1, num_workers=cfg.num_workers)
    print(result)
    return result


if __name__ == "__main__":
    main()
