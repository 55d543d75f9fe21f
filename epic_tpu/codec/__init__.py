"""Real-codec paths: host-orchestrated rANS compress/decompress and the
progressive single-bitstream pipeline."""

from .pic_codec import PICCodec
from .progressive import (progressive_encode, progressive_decode,
                          progressive_decode_all,
                          progressive_encode_start,
                          progressive_encode_finish)
from .container import dump_bitstreams, load_bitstreams
from .pipeline import SweepPipeline, run_sweeps

__all__ = [
    "PICCodec",
    "SweepPipeline",
    "run_sweeps",
    "progressive_encode",
    "progressive_decode",
    "progressive_decode_all",
    "progressive_encode_start",
    "progressive_encode_finish",
    "dump_bitstreams",
    "load_bitstreams",
]
