from isee3_decoder_tpu.parallel.mesh import channel_sharding, make_mesh
from isee3_decoder_tpu.parallel.sharding import (
    demod_to_symbols_sharded,
    receive_block_sharded,
    shard_channels,
)
from isee3_decoder_tpu.parallel.viterbi_sharded import (
    decode_frame_sharded,
    update_blk_sharded,
)

__all__ = [
    "channel_sharding",
    "decode_frame_sharded",
    "demod_to_symbols_sharded",
    "make_mesh",
    "receive_block_sharded",
    "shard_channels",
    "update_blk_sharded",
]
