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
# plugin in every process; with JAX_PLATFORMS=cpu jax will simply not select
# it, but drop the path for subprocesses spawned by tests too.
os.environ["PYTHONPATH"] = ""

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
