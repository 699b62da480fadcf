"""Mid-training resume-continuation equivalence (VERDICT r3 item 2).

Reference resume semantics (``utils/utils.py:298-398`` + ``train.py:144``):
a checkpoint restores params, BOTH optimizer states, EMA copies, spectral
(u, v), and the iteration counter, and training continues as if never
interrupted.  Here we prove it end-to-end through the production CLI: N
steps -> save -> restore -> M steps must produce EXACTLY the same TrainState
as N+M uninterrupted steps (params, EMA, optimizer moments, spectral state,
step counter — all leaves bit-exact on CPU).

The synthetic loader is pinned to its deterministic mode so the batch at
in-epoch iteration i is identical across runs/epochs; the per-step RNG is
``fold_in(PRNGKey(seed), iteration)`` with the restored iteration counter,
so augmentation/GAN noise also line up across the interruption.

Also covered: the SIGTERM save path itself (``cli/train.py:169-181``,
reference ``train.py:176-194``) — the handler's checkpoint must feed the
same equivalence.
"""

import signal

import numpy as np
import pytest
from flax import serialization


@pytest.fixture(autouse=True)
def _restore_signal_handlers():
    """cli/train.py registers SIGINT/SIGTERM handlers; don't leak them."""
    old_int = signal.getsignal(signal.SIGINT)
    old_term = signal.getsignal(signal.SIGTERM)
    yield
    signal.signal(signal.SIGINT, old_int)
    signal.signal(signal.SIGTERM, old_term)


@pytest.fixture(autouse=True)
def _deterministic_synthetic(monkeypatch):
    """Pin the synthetic loader to per-iteration-deterministic batches so
    epoch k and a resumed epoch 0 see identical data."""
    from latentpose_tpu.data import synthetic

    orig_init = synthetic.SyntheticDataLoader.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        self.deterministic = True

    monkeypatch.setattr(synthetic.SyntheticDataLoader, "__init__", patched)


def base_argv(exp_dir, num_epochs):
    return [
        "--embedder", "simple_conv",
        "--generator", "vector_pose_unsupervised_segmentation_noBottleneck",
        "--discriminator", "no_landmarks",
        "--criterions", "adversarial, featmat, dice",
        "--dataloader", "synthetic", "--runner", "holycow",
        "--synthetic_num_labels", "4", "--num_enc_frames", "2",
        "--image_size", "32", "--num_channels", "4",
        "--max_num_channels", "16", "--embed_channels", "16",
        "--pose_embedding_size", "8", "--dis_num_blocks", "3",
        "--batch_size", "2", "--num_devices", "1",
        "--num_epochs", str(num_epochs),
        "--no-logging",
        "--experiments_dir", str(exp_dir),
    ]
    # 4 labels / batch 2 -> 2 steps per epoch


def leaves_with_paths(state):
    from latentpose_tpu.checkpoint import _flatten
    return _flatten(serialization.to_state_dict(state))


def assert_states_identical(state_a, state_b):
    flat_a = leaves_with_paths(state_a)
    flat_b = leaves_with_paths(state_b)
    assert flat_a.keys() == flat_b.keys()
    for key in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[key]), np.asarray(flat_b[key]),
            err_msg=f"resume-continuation mismatch at {key}")


@pytest.fixture(scope="module")
def uninterrupted_state(tmp_path_factory):
    """2 epochs (4 steps) in one go — the ground truth.

    Runs with the same deterministic-loader pin as the tests (the autouse
    fixture is function-scoped, so re-pin locally)."""
    from latentpose_tpu.cli.train import main
    from latentpose_tpu.data import synthetic

    orig_init = synthetic.SyntheticDataLoader.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        self.deterministic = True

    synthetic.SyntheticDataLoader.__init__ = patched
    try:
        state = main(base_argv(tmp_path_factory.mktemp("uninterrupted"), 2))
    finally:
        synthetic.SyntheticDataLoader.__init__ = orig_init
    assert int(state.step) == 4
    return state


def test_resume_continuation_equivalence(tmp_path, uninterrupted_state):
    """N=2 steps -> end-of-epoch save -> restore -> M=2 steps == N+M."""
    from latentpose_tpu.checkpoint import latest_checkpoint
    from latentpose_tpu.cli.train import main

    part1_dir = tmp_path / "part1"
    state1 = main(base_argv(part1_dir, 1))
    assert int(state1.step) == 2
    ckpt = latest_checkpoint(part1_dir)
    assert ckpt is not None and ckpt.name == "model_00000002.ckpt"

    state2 = main(base_argv(tmp_path / "part2", 1)
                  + ["--checkpoint_path", str(ckpt)])
    assert int(state2.step) == 4
    assert_states_identical(uninterrupted_state, state2)


@pytest.mark.slow  # a fourth full CLI run + compile on the 1-vCPU host
def test_sigterm_save_then_resume_equivalence(tmp_path, monkeypatch,
                                              uninterrupted_state):
    """SIGTERM mid-run triggers the PID-guarded save handler
    (cli/train.py:169-181); resuming from ITS checkpoint must continue
    exactly like the uninterrupted run."""
    from latentpose_tpu.checkpoint import latest_checkpoint
    from latentpose_tpu.cli import train as train_cli
    from latentpose_tpu.cli.train import main
    from latentpose_tpu.runners import loop

    orig_run_epoch = loop.run_epoch

    def run_epoch_then_kill(dataloader, step_fn, state, args, epoch, rng,
                            **kwargs):
        if epoch == 1:
            # deliver SIGTERM to ourselves exactly at the epoch boundary;
            # the handler saves the held state and sys.exit(0)s
            signal.raise_signal(signal.SIGTERM)
            raise AssertionError("SIGTERM handler should have exited")
        return orig_run_epoch(dataloader, step_fn, state, args, epoch, rng,
                              **kwargs)

    monkeypatch.setattr(train_cli.loop, "run_epoch", run_epoch_then_kill)

    killed_dir = tmp_path / "killed"
    with pytest.raises(SystemExit):
        main(base_argv(killed_dir, 5))

    monkeypatch.setattr(train_cli.loop, "run_epoch", orig_run_epoch)

    ckpt = latest_checkpoint(killed_dir)
    assert ckpt is not None, "SIGTERM handler should have saved a checkpoint"
    # 1 full epoch survived; the end-of-epoch save already wrote
    # model_00000002.ckpt, so the handler's copy gets the collision suffix
    # (checkpoint.py:79-81, reference utils/utils.py:277-284)
    assert ckpt.name.startswith("model_00000002.ckpt")

    state2 = main(base_argv(tmp_path / "resumed", 1)
                  + ["--checkpoint_path", str(ckpt)])
    assert int(state2.step) == 4
    assert_states_identical(uninterrupted_state, state2)


@pytest.mark.slow
def test_finetune_resume_continuation_equivalence(tmp_path):
    """Resuming a FINE-TUNED checkpoint (cli/train.py's ckpt_meta_finetune
    branch: rebuild the 1-row-W discriminator + finetune_embedding skeleton,
    restore, continue) must equal uninterrupted fine-tuning: N+M epochs in
    one run == N epochs -> save -> restore -> M epochs, every state leaf."""
    from latentpose_tpu.checkpoint import latest_checkpoint
    from latentpose_tpu.cli.train import main

    meta_dir = tmp_path / "meta"
    main(base_argv(meta_dir, 1))
    meta_ckpt = str(latest_checkpoint(meta_dir))

    ft_args = [
        "--dataloader", "synthetic",
        "--criterions", "adversarial, featmat, dice",
        "--finetune", "--optimizer", "RAdam",
        "--lr_gen", "5e-4", "--lr_dis", "8e-4",
        "--synthetic_num_labels", "4", "--num_enc_frames", "2",
        "--image_size", "32", "--num_channels", "4",
        "--max_num_channels", "16", "--embed_channels", "16",
        "--pose_embedding_size", "8", "--dis_num_blocks", "3",
        "--batch_size", "2", "--num_devices", "1", "--no-logging",
    ]

    state_full = main(ft_args + [
        "--checkpoint_path", meta_ckpt, "--num_epochs", "2",
        "--experiments_dir", str(tmp_path / "ft_full")])
    assert "finetune_embedding" in state_full.params

    part1 = main(ft_args + [
        "--checkpoint_path", meta_ckpt, "--num_epochs", "1",
        "--experiments_dir", str(tmp_path / "ft_part1")])
    ft_ckpt = latest_checkpoint(tmp_path / "ft_part1")
    assert ft_ckpt is not None
    state_resumed = main(ft_args + [
        "--checkpoint_path", str(ft_ckpt), "--num_epochs", "1",
        "--experiments_dir", str(tmp_path / "ft_part2")])

    assert int(state_resumed.step) == int(state_full.step)
    assert int(part1.step) < int(state_full.step)
    assert_states_identical(state_full, state_resumed)
