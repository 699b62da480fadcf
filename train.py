#!/usr/bin/env python3
"""Meta-train or fine-tune (thin shim; see latentpose_tpu/cli/train.py)."""
from latentpose_tpu.cli.train import main

if __name__ == "__main__":
    main()
