#!/usr/bin/env python
"""Reference-compatible entry: `python train.py --batch_size 64 --lr 0.9e-3
--loss_mode 1 --dataset vaser ...` (same flags as the reference train.py;
delegates to puzzlenet_tpu.cli.train)."""

from puzzlenet_tpu.cli.train import main

if __name__ == "__main__":
    main()
