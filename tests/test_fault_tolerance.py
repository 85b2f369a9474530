"""Restart-based recovery: step-cadence checkpoints + supervisor relaunch.

The reference has no failure recovery (SURVEY §5: data-level retries
only). Here: the CLI checkpoints the full TrainState every
`train.ckpt_every_steps`, a fault kills the process mid-epoch
(SMIRK_FAULT_INJECT_STEP), and tools/train_supervisor.py relaunches with
`resume_state=...` for an exact continuation (step counter + optimizer
moments restored).

Runs the CLI in subprocesses (crash semantics can't be faked in-process),
with tiny arch tables injected via a sitecustomize-style snippet.
"""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny archs + forwarding to the CLI, for subprocess runs
_RUNNER = """
import sys
from smirk_tpu.models import mobilenetv3 as mnv3
TINY_SMALL = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
TINY_LARGE = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]
mnv3.ARCHS["tf_mobilenetv3_small_minimal_100"] = (TINY_SMALL, 40)
mnv3.ARCHS["tf_mobilenetv3_large_minimal_100"] = (TINY_LARGE, 48)
from smirk_tpu.cli import train as train_cli
train_cli.main(sys.argv[1:])
"""


def _base_args(log):
    return [
        "--synthetic",
        "image_size=32",
        "arch.num_expression=10",
        "arch.num_shape=30",
        "train.batch_size=8",
        "train.num_workers=0",
        "train.samples_per_epoch=16",
        "train.num_epochs=2",
        "train.save_every=10",
        "train.visualize_every=100000",
        "train.log_losses_every=1",
        "train.mask_dilation_radius=3",
        "train.ckpt_every_steps=1",
        "train.loss_weights.cycle_loss=0",
        "train.loss_weights.perceptual_vgg_loss=0",
        f"train.log_path={log}",
    ]


def _env(fault_step=0):
    env = dict(os.environ, JAX_PLATFORMS="cpu", SMIRK_PLATFORM="cpu",
               XLA_FLAGS="")
    if fault_step:
        env["SMIRK_FAULT_INJECT_STEP"] = str(fault_step)
    else:
        env.pop("SMIRK_FAULT_INJECT_STEP", None)
    return env


def test_crash_checkpoint_and_supervised_resume(tmp_path):
    from tools.train_supervisor import supervise

    log = str(tmp_path / "logs")
    cmd = [sys.executable, "-c", _RUNNER] + _base_args(log)

    # synthetic train split is max(64, bs*4)=64 samples -> 8 steps/epoch,
    # 16 train steps over 2 epochs; fault after step 3 (mid-epoch 0)
    proc = subprocess.run(cmd, env=_env(fault_step=3), capture_output=True,
                          text=True, cwd=REPO, timeout=900)
    assert proc.returncode != 0
    assert "SMIRK_FAULT_INJECT_STEP" in proc.stderr
    ckpt_path = os.path.join(log, "last_state.npz")
    assert os.path.exists(ckpt_path)
    saved = np.load(ckpt_path)
    assert int(saved[".step"]) == 3  # ckpt_every_steps=1 caught step 3

    # supervisor relaunches with resume_state and completes the run
    rc = supervise(cmd, log, max_restarts=2, backoff=0.1,
                   env=_env(fault_step=0))
    assert rc == 0
    final = np.load(ckpt_path)
    # resumed at epoch 0 (step 3 // 8), replaying the interrupted epoch:
    # 16 steps over epochs 0-1 on top of the restored 3
    assert int(final[".step"]) == 19
    # metrics stream shows a post-resume train step
    lines = [json.loads(line) for line in
             open(os.path.join(log, "metrics.jsonl"))]
    assert any(r["phase"] == "train" for r in lines)


def test_prestep_crash_preserves_previous_checkpoint(tmp_path):
    """A crash before any step completes must NOT clobber an existing
    last_state.npz (there is nothing to salvage — an empty save would
    overwrite the previous good checkpoint)."""
    log = str(tmp_path / "logs")
    os.makedirs(log)
    sentinel = b"sentinel-prev-ckpt"
    ckpt_path = os.path.join(log, "last_state.npz")
    with open(ckpt_path, "wb") as f:
        f.write(sentinel)

    cmd = [sys.executable, "-c", _RUNNER] + _base_args(log)
    proc = subprocess.run(cmd, env=_env(fault_step=-1), capture_output=True,
                          text=True, cwd=REPO, timeout=900)
    assert proc.returncode != 0
    assert "no completed step to salvage" in proc.stderr
    assert open(ckpt_path, "rb").read() == sentinel


def test_resume_state_restores_exactly(tmp_path):
    """restore_state round-trips the full TrainState (params + opt moments
    + step) through the CLI checkpoint file."""
    jax = __import__("jax")
    from smirk_tpu import assets
    from smirk_tpu.config import load_config
    from smirk_tpu.train import SmirkSystem
    from smirk_tpu.utils import checkpoint as ckpt

    config = load_config(None, (
        "image_size=32", "arch.num_expression=10", "arch.num_shape=30",
        "train.batch_size=2",
    ))
    system = SmirkSystem(config, assets.load_all(), steps_per_epoch=4,
                         use_pallas=False)
    state = system.init_state(jax.random.PRNGKey(0))
    state = state.replace(step=state.step + 5)
    path = str(tmp_path / "s.npz")
    ckpt.save_state(state, path)
    fresh = system.init_state(jax.random.PRNGKey(1))
    restored = ckpt.restore_state(fresh, path)
    assert int(np.asarray(restored.step)) == 5
    a = jax.tree_util.tree_leaves(state.encoder)[0]
    b = jax.tree_util.tree_leaves(restored.encoder)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_supervisor_escalates_to_split_mode(tmp_path):
    """From the second restart on, the supervisor sets
    SMIRK_STEP_MODE=split (the measured mitigation for fused-program
    worker crashes)."""
    from tools.train_supervisor import supervise

    log = str(tmp_path)
    probe = (
        "import os, sys\n"
        "sys.exit(0 if os.environ.get('SMIRK_STEP_MODE') == 'split' else 1)\n"
    )
    cmd = [sys.executable, "-c", probe]
    rc = supervise(cmd, log, max_restarts=3, backoff=0.01,
                   env={"PATH": os.environ.get("PATH", "")})
    assert rc == 0
