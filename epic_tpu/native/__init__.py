"""Native (C++) host-side components of epic_tpu.

The TPU compute path is JAX/XLA/Pallas; the inherently sequential entropy
coder runs on the TPU-VM host CPU as a C++ shared library, built on first use
and bound via ctypes (no pybind11 in this environment).
"""

from .build import load_library

__all__ = ["load_library"]
