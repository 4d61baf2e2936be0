from isee3_decoder_tpu.utils.metrics import decoder_amplitudes, gen_met
from isee3_decoder_tpu.utils.sim import addnoise, channel_cdf, ebn0_to_noise, simulate
from isee3_decoder_tpu.utils.timeformat import format_hms, hms

__all__ = [
    "addnoise",
    "channel_cdf",
    "decoder_amplitudes",
    "ebn0_to_noise",
    "format_hms",
    "gen_met",
    "hms",
    "simulate",
]
