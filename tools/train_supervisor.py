"""Restart-based recovery supervisor for train.py (SURVEY §5 failure
detection / elastic recovery; the reference has none).

Runs the training CLI as a child process; on a nonzero exit it relaunches
with `resume_state=<log_path>/last_state.npz` (the full-TrainState
checkpoint the CLI writes at `train.ckpt_every_steps` cadence, at epoch
ends, and best-effort on crash), with bounded retries and backoff. Pair
with `train.ckpt_every_steps` so a remote-worker crash loses at most N
steps.

Usage:
  python tools/train_supervisor.py [--max-restarts N] [--backoff SEC] \
      <train.py args...>
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _extract_log_path(args) -> str:
    """Resolve the child's log path the same way the CLI will: dotted CLI
    override first, else the YAML config's train.log_path, else the default
    (watching the wrong path would mean cold restarts that lose progress)."""
    for a in args:
        if a.startswith("train.log_path="):
            return a.split("=", 1)[1]
    yamls = [a for a in args if a.endswith((".yaml", ".yml"))]
    if yamls:
        try:
            sys.path.insert(0, REPO)
            from smirk_tpu.config import load_config

            return load_config(yamls[0]).train.log_path
        except Exception as e:  # noqa: BLE001 — the child will report it
            print(f"[supervisor] could not read {yamls[0]}: {e}", flush=True)
    return "logs/1"


_PROBE = ("import jax, jax.numpy as jnp\n"
          "x = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))\n"
          "print('probe ok', float(x))\n")


def wait_device_healthy(env=None, attempts: int = 12,
                        probe_timeout: float = 240.0,
                        sleep_s: float = 120.0) -> bool:
    """Block until a trivial jitted program runs (the remote TPU worker
    takes 10-40 min to restart after a crash; relaunching training into a
    dead worker just burns a restart)."""
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE], env=env,
                               timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[supervisor] device probe {i} failed; retry in {sleep_s:.0f}s",
              flush=True)
        time.sleep(sleep_s)
    return False


def supervise(cmd, log_path: str, max_restarts: int = 10,
              backoff: float = 120.0, env=None, probe: bool = False) -> int:
    """Run `cmd` (argv list); relaunch with resume_state on failure.
    From the second restart on, escalates to SMIRK_STEP_MODE=split (two
    smaller jitted programs, identical math) — the measured mitigation for
    remote-worker crashes on the largest fused train-step programs.
    Returns the final exit code (0 on eventual success)."""
    resume = os.path.join(log_path, "last_state.npz")
    if probe and not wait_device_healthy(env):
        print("[supervisor] device not healthy at launch; aborting",
              flush=True)
        return 1
    attempt = 0
    while True:
        argv = list(cmd)
        # resume whenever a checkpoint exists (also on the first attempt:
        # relaunching the supervisor after its own death must be idempotent).
        # A user-supplied resume_state= is a deliberate rollback — never
        # silently override it (overrides apply in argv order, so appending
        # ours would win).
        user_resume = any(str(a).startswith("resume_state=") for a in argv)
        if user_resume:
            if attempt == 0:
                print("[supervisor] honoring user resume_state (auto-resume "
                      "from last_state.npz disabled for this run)", flush=True)
        elif os.path.exists(resume):
            argv.append(f"resume_state={resume}")
        run_env = dict(env if env is not None else os.environ)
        if attempt >= 2:
            run_env.setdefault("SMIRK_STEP_MODE", "split")
        print(f"[supervisor] launch attempt {attempt}"
              f"{' (split-step)' if run_env.get('SMIRK_STEP_MODE') == 'split' else ''}"
              f": {' '.join(argv[-3:])}", flush=True)
        rc = subprocess.call(argv, env=run_env)
        if rc == 0:
            print("[supervisor] training completed", flush=True)
            return 0
        attempt += 1
        if attempt > max_restarts:
            print(f"[supervisor] giving up after {max_restarts} restarts "
                  f"(last rc={rc})", flush=True)
            return rc
        has_ckpt = os.path.exists(resume)
        print(f"[supervisor] child failed rc={rc}; "
              f"{'resuming from ' + resume if has_ckpt else 'no checkpoint; cold restart'}"
              f" in {backoff:.0f}s", flush=True)
        time.sleep(backoff)
        if probe and not wait_device_healthy(env):
            print("[supervisor] device never became healthy; giving up",
                  flush=True)
            return rc


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    max_restarts = 10
    backoff = 120.0
    if "--max-restarts" in argv:
        i = argv.index("--max-restarts")
        max_restarts = int(argv[i + 1])
        del argv[i:i + 2]
    if "--backoff" in argv:
        i = argv.index("--backoff")
        backoff = float(argv[i + 1])
        del argv[i:i + 2]
    probe = True
    if "--no-probe" in argv:
        probe = False
        argv.remove("--no-probe")
    cmd = [sys.executable, os.path.join(REPO, "train.py")] + argv
    sys.exit(supervise(cmd, _extract_log_path(argv), max_restarts, backoff,
                       probe=probe))


if __name__ == "__main__":
    main()
