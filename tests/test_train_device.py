"""NaN auto-rewind in the device trainer.

A persistent non-finite loss (params in a region where the forward itself
is non-finite — observed at flagship step 10.3k) must NOT abort the run:
the trainer journals a halved LR and exits rc=4, and the relaunch resumes
from the last checkpoint at the lower LR (cli/train_device.py; the
watchdog relaunches on rc=4). Reference has no such guard — its NaN runs
die (the recovery mechanism is TPU-tunnel-specific infrastructure)."""

import json
import os

import jax.numpy as jnp
import pytest

import epic_tpu.training.step as step_mod
from epic_tpu.cli.train_device import main as device_main

TINY = [
    "--N", "16", "--M", "32", "--division_dimension", "16", "32",
    "--dim_chunk", "8", "--param_net_widths", "24", "16",
    "--patch_size", "64", "--batch_size", "2",
    "--log_every", "1", "--val_every", "4", "--ckpt_every", "4",
    "--steps", "first_train=8",
]


class TestNanRewind:
    def test_rewind_then_resume(self, tmp_path, monkeypatch, capsys):
        save = str(tmp_path / "run")
        args = ["--save_path", save] + TINY

        real_mts = step_mod.make_train_step
        calls = {"n": 0}

        def poisoned_mts(model, plan):
            real = real_mts(model, plan)

            def step(state, batch, rng, *rest):
                calls["n"] += 1
                state, metrics = real(state, batch, rng, *rest)
                if calls["n"] > 4:  # past the step-4 checkpoint
                    metrics = dict(metrics)
                    metrics["loss"] = jnp.float32(jnp.nan)
                return state, metrics

            return step

        monkeypatch.setattr(step_mod, "make_train_step", poisoned_mts)
        with pytest.raises(SystemExit) as ex:
            device_main(args)
        assert ex.value.code == 4
        out = capsys.readouterr().out
        assert "rewind 1" in out

        with open(os.path.join(save, "progress.json")) as f:
            progress = json.load(f)
        assert progress["nan_rewinds"] == 1
        assert progress["next_step"] == 4          # last checkpoint
        assert progress["lr"] == pytest.approx(5e-5)  # halved from 1e-4

        # relaunch without the poison: resumes from the checkpoint at the
        # journaled LR and completes the curriculum
        monkeypatch.setattr(step_mod, "make_train_step", real_mts)
        device_main(args)
        out = capsys.readouterr().out
        assert "resumed params" in out
        assert "steps 4..8 lr 5.00e-05" in out
        assert "curriculum complete" in out
