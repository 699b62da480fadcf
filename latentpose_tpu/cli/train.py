"""Meta-training / fine-tuning entry point — parity with reference
``train.py``, TPU-native:

- 5-level arg resolution with plugin arg registration;
- one process drives the whole mesh (no torch.distributed.launch); data
  parallelism via jit over a Mesh with the batch sharded on 'data';
- checkpoint-on-SIGINT/SIGTERM (reference ``train.py:176-194``);
- fine-tune setup: averaged identity embedding ê + pure re-parameterization
  + optimizer re-init (reference ``train.py:218-279``).
"""

from __future__ import annotations

import logging
import os
import signal
import sys
from pathlib import Path

import jax
import numpy as np

from latentpose_tpu import checkpoint as ckpt_lib
from latentpose_tpu.config import build_core_parser, get_args_and_modules
from latentpose_tpu.parallel.mesh import (create_mesh, shard_state,
                                          state_shardings)
from latentpose_tpu.runners import build, finetune as ft, holycow, loop
from latentpose_tpu.utils.logging_writer import setup_logging

logger = logging.getLogger(f"train(PID{os.getpid()})")


def setup(args):
    logging.basicConfig(
        level=logging.INFO,
        format=f"%(asctime)s %(levelname)s PID{os.getpid()} "
               "%(name)s: %(message)s")
    from latentpose_tpu.utils.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    np.random.seed(args.random_seed)


def main(argv=None):
    parser = build_core_parser()
    args, default_args, modules, checkpoint_args = get_args_and_modules(
        parser, argv=argv)
    setup(args)

    num_devices = args.num_devices or len(jax.devices())
    mesh = create_mesh(num_devices) if num_devices > 1 else None
    logger.info("Devices: %d (%s); mesh: %s", num_devices,
                jax.devices()[0].platform, mesh)

    if args.finetune and not args.checkpoint_path:
        logger.error("`--finetune` is set, but `--checkpoint_path` isn't. "
                     "This has to be a mistake.")

    from latentpose_tpu.data.dataloader import Dataloader
    dataloader_train = Dataloader(args.dataloader).get_dataloader(
        args, part="train", phase="train")
    # Validation part (the reference declares --skip_eval and then raises
    # NotImplementedError("NYI: validation") when it is off — reference
    # train.py:130-133,293-302; implemented here).
    dataloader_val = None
    if not args.skip_eval:
        dataloader_val = Dataloader(args.dataloader).get_dataloader(
            args, part="val", phase="val")

    # num_labels: dataset-derived unless pinned by checkpoint args
    # (reference voxceleb.py:101-115: resume truncates to checkpoint's).
    if not args.num_labels:
        args.num_labels = getattr(dataloader_train, "num_labels", 1)

    rng = jax.random.PRNGKey(args.random_seed)
    opt_g, opt_d = build.build_optimizers(args, modules)

    # Was the checkpoint written by a fine-tuning run?  (Its state structure
    # then already contains finetune_embedding + 1-row discriminator W.)
    ckpt_meta_finetune = False
    if args.checkpoint_path:
        meta_path = os.path.join(args.checkpoint_path, "meta.json")
        if not os.path.exists(meta_path):
            raise FileNotFoundError(
                f"Checkpoint `{args.checkpoint_path}` not found")
        import json
        with open(meta_path) as f:
            ckpt_meta_finetune = bool(json.load(f).get("finetune", False))

    if args.checkpoint_path:
        logger.info("Starting from checkpoint %s", args.checkpoint_path)
        # Build models matching the checkpoint's structure, then restore.
        models = build.build_models(args, modules)
        finetune_leaves = None
        if ckpt_meta_finetune:
            models["discriminator"] = ft.make_finetune_discriminator(
                modules["discriminators"].Wrapper, args)
            # skeleton leaf names must match the checkpoint's actual avatar
            # trainables (finetune_embedding, or FSTH's finetune_affine) in
            # BOTH params and ema_params — from_state_dict silently drops
            # saved leaves the skeleton doesn't have
            saved_params = ckpt_lib.load_arrays(
                args.checkpoint_path).get("params", {})
            finetune_leaves = {k: v for k, v in saved_params.items()
                               if k.startswith("finetune_")} or None
        skeleton = build.init_train_state(
            args, models, opt_g, opt_d, rng, finetune=ckpt_meta_finetune,
            finetune_leaves=finetune_leaves)
        state = ckpt_lib.restore_state(args.checkpoint_path, skeleton)
        logger.info("Restored iteration #%d", int(state.step))
        args.iteration = int(state.step)
    else:
        models = build.build_models(args, modules)
        state = build.init_train_state(args, models, opt_g, opt_d, rng)

    criteria = build.build_criteria(args, modules)

    # X2Face "fine-tuning": the frozen model just stores the avatar's
    # identity images and exits (reference train.py:222-243).
    if args.finetune and getattr(models["generator"], "FINETUNE_PARAM",
                                 "embedding") == "none":
        max_imgs = int(getattr(args, "X2Face_num_identity_images", 8) or 8)
        collected = []
        for data_dict, _ in dataloader_train:
            data_dict = loop.dequantize_batch_host(data_dict)  # uint8 wire
            collected.append(np.asarray(data_dict["pose_input_rgbs"][:, 0]))
            if sum(len(c) for c in collected) >= max_imgs:
                break
        identity_images = np.concatenate(collected)[:max_imgs]
        logger.info("Saving X2Face model with %d identity images",
                    len(identity_images))
        state = state.replace(params={
            **state.params,
            "finetune_identity_images": identity_images[None]})
        args.experiment_dir = str(
            Path(args.experiments_dir) / (args.experiment_name or "x2face"))
        ckpt_lib.save_checkpoint(args.experiment_dir, state, args)
        return state

    # Fine-tune re-parameterization (skip if resuming a fine-tuned ckpt).
    if args.finetune and not ckpt_meta_finetune:
        logger.info("Fine-tuning: computing averaged identity embedding "
                    "from the avatar's frames")
        e_hat = ft.compute_averaged_identity_embedding(
            models, state, dataloader_train, args)
        models, state = ft.enable_finetuning(
            state, models, modules["discriminators"].Wrapper, args,
            e_hat, opt_g, opt_d, rng,
            gen_wrapper=modules["generators"].Wrapper)
        args.num_labels = 1

    metrics = [m.Wrapper.get_net(args)
               for m in (modules.get("metrics") or [])]

    writer = None
    if args.logging and jax.process_index() == 0:
        args_to_ignore = args.args_to_ignore.split(",")
        experiment_dir, writer = setup_logging(args, default_args,
                                               args_to_ignore)
        args.experiment_dir = experiment_dir
    else:
        args.experiment_dir = str(args.experiments_dir)

    shardings = None
    if mesh is not None:
        mode = getattr(args, "param_sharding", "replicated")
        state = shard_state(state, mesh, mode)
        if mode == "fsdp":
            # pin the step's output placement so the state STAYS sharded
            shardings = state_shardings(state, mesh, mode)

    step_fn = holycow.make_train_step(models, criteria, args, opt_g, opt_d,
                                      donate=True, state_shardings=shardings,
                                      mesh=mesh)
    eval_forward = loop.make_eval_forward(models, args)

    # Save-on-kill (reference train.py:176-194), parent-PID-guarded.
    holder = {"state": state, "saved": False}
    parent_pid = os.getpid()

    def save_last_model_and_exit(_sig, _frm):
        if holder["saved"] or os.getpid() != parent_pid:
            return
        holder["saved"] = True
        logger.info("Interrupted, saving the current model")
        ckpt_lib.save_checkpoint(args.experiment_dir, holder["state"], args)
        if writer is not None:
            writer.close()
        sys.exit(0)

    if jax.process_index() == 0:
        signal.signal(signal.SIGINT, save_last_model_and_exit)
        signal.signal(signal.SIGTERM, save_last_model_and_exit)

    saver = None
    if args.saver and jax.process_index() == 0:
        from latentpose_tpu.utils.saver import Saver
        saver = Saver(os.path.join(args.experiment_dir,
                                   "validation_results"), args.saver)

    logger.info("Entering training loop")
    for epoch in range(args.num_epochs):
        state = loop.run_epoch(dataloader_train, step_fn, state, args,
                               epoch, rng, mesh=mesh, writer=writer,
                               eval_forward=eval_forward, metrics=metrics,
                               saver=saver, state_holder=holder)
        holder["state"] = state

        if dataloader_val is not None and jax.process_index() == 0:
            loop.run_validation(dataloader_val, eval_forward, state, args,
                                epoch, writer=writer, metrics=metrics,
                                saver=saver)

        if jax.process_index() == 0:
            will_save = epoch == args.num_epochs - 1
            if args.save_frequency != 0:
                will_save |= epoch % args.save_frequency == 0
            if will_save:
                ckpt_lib.save_checkpoint(args.experiment_dir, state, args)

    if writer is not None:
        writer.flush()
    return state


if __name__ == "__main__":
    main()
