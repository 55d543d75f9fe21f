"""Test configuration: force the CPU backend with 8 virtual devices.

The dev box exposes one real TPU through a fragile tunnel; tests run on a
virtual 8-device CPU mesh instead (the TPU analog of a fake backend — see
SURVEY.md §4). Must run before jax initializes its backends, hence the
environment mutation at import time plus stripping the axon sitecustomize
registration if it already happened.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers a TPU PJRT
# plugin in every process AND forces the platform at the jax.config level —
# the env var alone does not win. Override at the config level too (this
# runs before any backend initializes), so the suite always uses the
# 8-device virtual CPU mesh even when pytest is launched with the
# sitecustomize active.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# drop the sitecustomize path for subprocesses spawned by tests too
os.environ["PYTHONPATH"] = ""

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
