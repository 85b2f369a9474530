"""CI coverage for tools/check_parity.py (VERDICT r2 item 5).

The checkpoint-parity harness is the runner of the BASELINE.json gate
(vertex RMSE < 1e-3 vs SMIRK_em1.pt, reference demo.py:55-66), but until
round 2's fix log it had crashed on every real comparison because nothing
executed it in CI. This test runs the harness END-TO-END as a subprocess on
its --ref_fixture path, with a fixture built from the framework's own
deterministic outputs:

* the stored fixture input image must be picked up (not random input);
* landmarks_mp is stored RAW 3D so the projected-2D-vs-raw-3D branch (the
  round-2 crash) executes;
* all RMSEs must print ~0 and the process must exit 0 with PARITY PASS.

A fixture with perturbed vertices must conversely FAIL with exit 1 — the
gate actually gates.
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _subprocess_env():
    env = dict(os.environ)
    env["SMIRK_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _make_fixture(path):
    """Reference-output fixture from OUR pipeline at check_parity's exact
    configuration (Config() defaults, init_state(PRNGKey(0)) weights)."""
    from smirk_tpu import assets
    from smirk_tpu.config import Config
    from smirk_tpu.train import SmirkSystem

    bundle = assets.load_all()
    system = SmirkSystem(Config(), bundle, steps_per_epoch=1)
    state = system.init_state(jax.random.PRNGKey(0))
    img = np.random.default_rng(3).random((1, 224, 224, 3), np.float32)
    enc_out = system.encoder.apply(state.encoder, jnp.asarray(img),
                                   train=False)
    flame_out = system.flame(enc_out)
    fix = {
        "img": img,
        "expression_params": np.asarray(enc_out["expression_params"]),
        "pose_params": np.asarray(enc_out["pose_params"]),
        "cam": np.asarray(enc_out["cam"]),
        "shape_params": np.asarray(enc_out["shape_params"]),
        "vertices": np.asarray(flame_out["vertices"]),
        # RAW 3D, as the reference torch stack emits them: check_parity
        # must project with the orthographic convention before comparing
        "landmarks_mp": np.asarray(flame_out["landmarks_mp"]),
    }
    np.savez(path, **fix)
    return fix


def _run_harness(fixture_path):
    return subprocess.run(
        [sys.executable, os.path.join("tools", "check_parity.py"),
         "--ref_fixture", str(fixture_path),
         "--checkpoint", "/nonexistent/SMIRK_em1.pt"],
        capture_output=True, text=True, cwd=REPO, env=_subprocess_env(),
        timeout=1800,
    )


def test_check_parity_fixture_path_passes(tmp_path):
    fix = tmp_path / "ref_fixture.npz"
    fixture = _make_fixture(fix)
    assert fixture["landmarks_mp"].shape[-1] == 3  # the crash-branch input
    proc = _run_harness(fix)
    out = proc.stdout + proc.stderr
    assert "using the fixture's stored input image" in out, out
    assert "vertex_rmse" in out, out
    assert "PARITY PASS" in out, out
    assert proc.returncode == 0, out


def test_check_parity_fixture_path_fails_on_mismatch(tmp_path):
    fix = tmp_path / "ref_fixture_bad.npz"
    fixture = _make_fixture(fix)
    fixture["vertices"] = fixture["vertices"] + 0.01  # >> 1e-3 RMSE
    np.savez(fix, **fixture)
    proc = _run_harness(fix)
    out = proc.stdout + proc.stderr
    assert "PARITY FAIL" in out, out
    assert proc.returncode == 1, out
