#!/usr/bin/env python3
"""Drive an avatar with a driver sequence (see latentpose_tpu/cli/drive.py)."""
from latentpose_tpu.cli.drive import main

if __name__ == "__main__":
    main()
