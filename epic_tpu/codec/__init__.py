"""Real-codec paths: host-orchestrated rANS compress/decompress and the
progressive single-bitstream pipeline."""

from .pic_codec import PICCodec
from .progressive import (progressive_encode, progressive_decode,
                          progressive_decode_all,
                          progressive_encode_start,
                          progressive_encode_finish)
from .container import dump_bitstreams, load_bitstreams

__all__ = [
    "PICCodec",
    "progressive_encode",
    "progressive_decode",
    "progressive_decode_all",
    "progressive_encode_start",
    "progressive_encode_finish",
    "dump_bitstreams",
    "load_bitstreams",
]
