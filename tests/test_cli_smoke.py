"""End-to-end CLI smoke: collect -> train -> closed-loop infer as real
subprocesses (the package-boundary drive of the three core CLIs; protects
the script layer against library refactors — the unit suite imports the
library directly and would miss argument/IO drift)."""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO, timeout=900):
    env = dict(os.environ)
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{args}\nstdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    return r.stdout


def test_collect_train_infer_cli_chain(tmp_path):
    ds = str(tmp_path / "ds.npz")
    results = str(tmp_path / "run")

    _run(["scripts/collect_data.py", "--cpu", "--plant", "cartpole_virtual_swingup",
          "--pos-range", "-0.2", "0.2", "2", "--theta-range", "2.9", "3.3", "3",
          "--horizon", "16", "--steps", "6", "--noisy", "1",
          "--solver-iters", "10", "--out", ds])
    assert os.path.exists(ds)

    _run(["scripts/train_diffusion.py", "--cpu", "--dataset", ds,
          "--results-dir", results, "--steps", "300", "--batch-size", "64",
          "--n-diffusion-steps", "10", "--unet-dim", "16",
          "--dim-mults-option", "1"])
    ckpts = os.path.join(results, "checkpoints")
    assert any(f.endswith(".ckpt") for f in os.listdir(ckpts))

    final = os.path.join(ckpts, sorted(f for f in os.listdir(ckpts)
                                   if f.endswith(".ckpt"))[-1])
    out = _run(["scripts/infer_closed_loop.py", "--cpu", "--dataset", ds,
                "--checkpoint", final, "--steps", "8", "--horizon", "16",
                "--sampling-times", "1",
                "--results-dir", str(tmp_path / "infer")])
    # the CLI prints parity metrics; the run must produce finite tracks
    x = np.load(str(tmp_path / "infer" / "x_diffusion.npy"))
    assert np.all(np.isfinite(x))
