"""Per-protocol decoder chains (functional equivalents of the reference's
DecoderFactory module lists, module/decode/DecoderFactory.java:117-183).

Each decoder is a pure function block over a per-channel complex stream:
    outputs, new_state = decoder(iq_block, state)
vmapped across channels by the pipeline layer.
"""
from .nbfm import NBFMDecoder, NBFMConfig  # noqa: F401
from .am import AMDecoder, AMConfig  # noqa: F401
