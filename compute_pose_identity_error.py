#!/usr/bin/env python3
from latentpose_tpu.cli.compute_pose_identity_error import main

if __name__ == "__main__":
    main()
