#!/usr/bin/env python3
from latentpose_tpu.cli.batched_finetune import main

if __name__ == "__main__":
    main()
