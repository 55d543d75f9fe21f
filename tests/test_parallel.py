"""Data-parallel correctness + multi-host smoke tests.

The actual correctness property of data parallelism (SURVEY.md §2.8
consequence): an 8-device sharded train step must produce the SAME params
and loss as the 1-device step on the identical global batch — sharding is
a layout annotation, not a semantic change. Also exercises
parallel.distributed with a real 2-process jax.distributed CPU cluster.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epic_tpu.models import get_model
from epic_tpu.parallel import (init_multihost, local_shard, make_mesh,
                               make_parallel_train_step, replicate,
                               shard_batch)
from epic_tpu.training import create_train_state, make_stage, make_train_step

TINY_PIC = dict(n=16, m=32, division=(16, 32), dim_chunk=8,
                param_net_widths=(24, 16))


def _tree_allclose(a, b, rtol, atol):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=rtol, atol=atol)


class TestDataParallelEquivalence:
    """8-device DP step == 1-device step on the same global batch."""

    @pytest.mark.parametrize("stage", ["first_train", "refine_gs"])
    def test_dp_step_matches_single_device(self, stage):
        model = get_model("pic", **TINY_PIC)
        batch = jax.random.uniform(jax.random.key(0), (8, 64, 64, 3))
        variables = model.init(
            {"params": jax.random.key(1), "noise": jax.random.key(2)},
            batch[:1], method="init_all")
        plan = make_stage(stage)

        # single device (plain jit, no sharding)
        state1 = create_train_state(variables["params"], stage)
        step1 = make_train_step(model, plan)
        # 8-device mesh
        mesh = make_mesh(8)
        state8 = create_train_state(variables["params"], stage)
        state8 = replicate(state8, mesh)
        step8 = make_parallel_train_step(model, plan, mesh)

        losses1, losses8 = [], []
        for i in range(2):
            rng = jax.random.key(100 + i)
            if plan.sampling:
                q, lm = jnp.float32(1.5), jnp.float32(0.04)
                state1, m1 = step1(state1, batch, rng, q, lm)
                state8, m8 = step8(state8, shard_batch(batch, mesh),
                                   replicate(rng, mesh), q, lm)
            else:
                state1, m1 = step1(state1, batch, rng)
                state8, m8 = step8(state8, shard_batch(batch, mesh),
                                   replicate(rng, mesh))
            losses1.append(float(m1["loss"]))
            losses8.append(float(m8["loss"]))

        # step-1 loss: identical params + identical global batch, so any
        # difference is pure cross-shard reduction order
        np.testing.assert_allclose(losses1[0], losses8[0], rtol=1e-5)
        # after optimizer steps, reduction-order noise is amplified by
        # Adam's normalized update (grad/sqrt(v) flips sign where grads
        # ~0), so each step can move a param by up to ~lr=1e-4 in either
        # run; bound the divergence by a few lr
        np.testing.assert_allclose(losses1, losses8, rtol=2e-3)
        _tree_allclose(state1.params, jax.device_get(state8.params),
                       rtol=2e-3, atol=5e-4)


class TestDataParallelREM:
    """rems stage under the mesh: checkpoint-latent extraction + REM-bank
    step must both equal their single-device counterparts (VERDICT r2
    item 7 — the rems family adds a second sharded program)."""

    def test_rems_dp_step_matches_single_device(self):
        from epic_tpu.parallel import make_parallel_ckpt_extractor
        from epic_tpu.training.step import (extract_quality_ref,
                                            make_ckpt_extractor)

        model = get_model("rem", check_levels=(0.75,), **TINY_PIC)
        batch = jax.random.uniform(jax.random.key(0), (8, 64, 64, 3))
        variables = model.init(
            {"params": jax.random.key(1), "noise": jax.random.key(2)},
            batch[:1], method="init_all")
        plan = make_stage("rems", check_levels=(0.75,))
        mesh = make_mesh(8)

        q = float(plan.list_quality[len(plan.list_quality) // 2])
        qref = jnp.float32(extract_quality_ref(q, plan.rems))
        state1 = create_train_state(variables["params"], "rems")
        state8 = replicate(create_train_state(variables["params"], "rems"),
                           mesh)
        batch_p = shard_batch(batch, mesh)

        ckpt_p = make_parallel_ckpt_extractor(model, mesh)(
            state8.params, batch_p, qref)
        ckpt_1 = make_ckpt_extractor(model)(state1.params, batch, qref)
        np.testing.assert_allclose(np.asarray(jax.device_get(ckpt_p)),
                                   np.asarray(ckpt_1), rtol=2e-4,
                                   atol=1e-5)

        rng = jax.random.key(100)
        step8 = make_parallel_train_step(model, plan, mesh)
        step1 = make_train_step(model, plan)
        state8, m8 = step8(state8, batch_p, replicate(rng, mesh),
                           jnp.float32(q), jnp.float32(0.04), ckpt_p)
        state1, m1 = step1(state1, batch, rng, jnp.float32(q),
                           jnp.float32(0.04), ckpt_1)
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                                   rtol=1e-4)
        _tree_allclose(state1.params, jax.device_get(state8.params),
                       rtol=2e-3, atol=5e-4)


class TestMultiHost:
    def test_local_shard_partitions(self):
        items = list(range(10))
        shards = [local_shard(items, process_index=i, process_count=3)
                  for i in range(3)]
        assert shards == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
        assert sum(shards, []) == items

    def test_two_process_jax_distributed(self, tmp_path):
        """Real 2-process jax.distributed cluster over localhost: psum
        across processes + init_multihost plumbing."""
        worker = textwrap.dedent("""
            import os, sys
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
            pid = int(sys.argv[1]); port = sys.argv[2]
            sys.path.insert(0, sys.argv[3])
            from epic_tpu.parallel import init_multihost, local_shard
            ok = init_multihost(coordinator_address=f"localhost:{port}",
                                num_processes=2, process_id=pid)
            assert ok
            import jax
            import jax.numpy as jnp
            import numpy as np
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            from jax.experimental import multihost_utils
            assert jax.process_count() == 2
            assert len(jax.devices()) == 2  # global view over DCN
            mesh = Mesh(np.asarray(jax.devices()), ("data",))
            local = jnp.asarray([float(jax.process_index() + 1)])
            garr = multihost_utils.host_local_array_to_global_array(
                local, mesh, P("data"))
            total = jax.jit(
                lambda a: jnp.sum(a),
                in_shardings=NamedSharding(mesh, P("data")),
                out_shardings=NamedSharding(mesh, P()))(garr)
            assert float(total) == 3.0, float(total)
            shard = local_shard(list(range(4)))
            assert shard == ([0, 1] if jax.process_index() == 0 else [2, 3])
            print("WORKER_OK", pid)
        """)
        script = tmp_path / "worker.py"
        script.write_text(worker)
        import socket
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PYTHONPATH"] = ""
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out}"
            assert f"WORKER_OK {i}" in out

    def test_init_multihost_noop_single_process(self):
        assert init_multihost() is False

    def test_two_process_rd_sweep_equals_single(self, tmp_path):
        """The REAL codec sweep end-to-end across 2 jax.distributed
        processes (tools/multihost_rd_sweep.py): images sharded via
        local_shard, per-process host rANS coder, per-image RD rows
        allgathered — the merged result must equal the single-process
        sweep exactly (VERDICT r4 item 7)."""
        import socket

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tool = os.path.join(repo, "tools", "multihost_rd_sweep.py")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS",)}
        env["PYTHONPATH"] = repo
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

        def extract(out):
            for line in out.splitlines():
                if line.startswith("RDSWEEP "):
                    import json
                    return json.loads(line[len("RDSWEEP "):])
            raise AssertionError(f"no RDSWEEP line in:\n{out}")

        single = subprocess.run(
            [sys.executable, tool, "--n_images", "4"],
            capture_output=True, text=True, env=env, timeout=600)
        assert single.returncode == 0, single.stdout + single.stderr
        ref = extract(single.stdout)
        assert ref["processes"] == 1 and ref["n_images"] == 4

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, tool, "--n_images", "4",
             "--num_processes", "2", "--process_id", str(i),
             "--coordinator", f"localhost:{port}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env) for i in range(2)]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"
        got = extract(outs[0])
        assert got["processes"] == 2
        assert got["rows"] == ref["rows"]
        assert got["mean_bpp_top"] == ref["mean_bpp_top"]
        assert got["mean_psnr_top"] == ref["mean_psnr_top"]
