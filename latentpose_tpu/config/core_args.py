"""Core (non-plugin) CLI arguments shared by all entry points.

Parity with reference ``train.py:22-91``, adapted to TPU: ``--num_gpus``
becomes ``--num_devices`` (size of the data-parallel mesh axis); NCCL/horovod
knobs are dropped (JAX collectives over ICI/DCN replace them); precision knobs
are added (``--compute_dtype``).
"""

from __future__ import annotations

from pathlib import Path

from latentpose_tpu.config.argparse_utils import MyArgumentParser


def build_core_parser() -> MyArgumentParser:
    parser = MyArgumentParser(conflict_handler="resolve")

    # "--config" is the reference spelling (reference train.py:25); both
    # land on args.config_name.
    parser.add("--config_name", "--config", type=str, default="")

    # Plugin selection (reference train.py:27-34)
    parser.add("--generator", type=str, default="")
    parser.add("--embedder", type=str, default="")
    parser.add("--discriminator", type=str, default="")
    parser.add("--criterions", type=str, default="")
    parser.add("--metrics", type=str, default="")
    parser.add("--dataloader", type=str, default="")
    parser.add("--runner", type=str, default="")

    parser.add("--args-to-ignore", type=str,
               default="checkpoint,splits_dir,experiments_dir,extension,"
                       "experiment_name,rank,local_rank,world_size")
    parser.add("--experiments_dir", type=Path, default="data/experiments")
    parser.add("--experiment_name", type=str, default="")
    parser.add("--train_split_path", type=Path, default="data/splits/train.csv")
    parser.add("--val_split_path", type=Path, default="data/splits/val.csv")

    # Directory with converted VGG / VGGFace weights for perceptual losses
    # (reference train.py:49; ours expects .npz conversions, see
    # tools/convert_torch_weights.py)
    parser.add("--vgg_weights_dir", type=str, default="data/weights")
    # Degraded-mode opt-in: without converted VGG/VGGFace weights the
    # perceptual losses hard-error (the reference fails loudly too — its
    # .pth files are load-bearing downloads).  Synthetic/test configs set
    # this; real training must never silently run random towers.
    parser.add("--allow_random_vgg", action="store_bool", default=False)

    # Training process
    parser.add("--num_epochs", type=int, default=10 ** 9)
    parser.add("--set_eval_mode_in_train", action="store_bool", default=False)
    parser.add("--set_eval_mode_in_test", action="store_bool", default=True)
    parser.add("--save_frequency", type=int, default=1)
    parser.add("--logging", action="store_bool", default=True)
    parser.add("--skip_eval", action="store_bool", default=True)
    parser.add("--weights_running_average", action="store_bool", default=True)
    parser.add("--finetune", action="store_bool", default=False)
    parser.add("--inference", action="store_bool", default=False)

    # Model
    parser.add("--in_channels", type=int, default=3)
    parser.add("--out_channels", type=int, default=3)
    parser.add("--num_channels", type=int, default=64)
    parser.add("--max_num_channels", type=int, default=512)
    parser.add("--embed_channels", type=int, default=512)
    parser.add("--pose_embedding_size", type=int, default=136)
    parser.add("--image_size", type=int, default=256)

    # Optimizer (reference train.py:74-76)
    parser.add("--optimizer", default="Adam", type=str,
               choices=["Adam", "RAdam"])
    parser.add("--lr_gen", default=5e-5, type=float)
    parser.add("--beta1", default=0.0, type=float)

    # Data
    parser.add("--batch_size", type=int, default=8,
               help="Global batch size (split across the data mesh axis)")
    parser.add("--num_workers", type=int, default=4)
    parser.add("--prefetch_size", type=int, default=16)
    parser.add("--data_root", type=str, default="")
    parser.add("--img_dir", type=str, default="images-cropped")
    parser.add("--kp_dir", type=str, default="keypoints-cropped")
    parser.add("--segm_dir", type=str, default="segmentation-cropped")
    parser.add("--bboxes_dir", type=str, default="/non/existent/file")
    parser.add("--num_labels", type=int, default=0,
               help="Height of the discriminator identity-embedding matrix; "
                    "0 = infer from the dataset")

    # Hardware / parallelism (TPU-native replacement of --num_gpus)
    parser.add("--num_devices", type=int, default=0,
               help="Data-parallel mesh size; 0 = all visible devices")
    parser.add("--param_sharding", type=str, default="replicated",
               choices=["replicated", "fsdp"],
               help="Training-state placement on the mesh: 'replicated' = "
                    "pure DP (reference parity); 'fsdp' shards params/EMA/"
                    "optimizer moments over the data axis (ZeRO-3-style, "
                    "XLA inserts the gathers) — cuts per-chip state memory "
                    "~Nx for larger-than-reference models")
    parser.add("--compute_dtype", type=str, default="float32",
               choices=["float32", "bfloat16"])

    # Profiling (SURVEY.md §5: jax.profiler replaces the reference's dead
    # --profile_flops flag)
    parser.add("--profile_dir", type=str, default="",
               help="Write a jax.profiler trace of a few steps here")
    parser.add("--profile_steps", type=int, default=5)

    # Misc
    parser.add("--random_seed", type=int, default=123)
    parser.add("--checkpoint_path", type=str, default="")
    parser.add("--saver", type=str, default="")
    return parser
