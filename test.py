#!/usr/bin/env python
"""Reference-compatible entry: evaluate a trained run and write the
10-metric metrics.txt (delegates to puzzlenet_tpu.cli.test)."""

from puzzlenet_tpu.cli.test import main

if __name__ == "__main__":
    main()
