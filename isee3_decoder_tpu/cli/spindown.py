"""spindown CLI — offline fixed-frequency complex mixer (spindown.c).

Reads int16 I,Q pairs from a file, shifts by -c Hz, writes baseband as
float64 pairs on stdout (spindown.c:138-145 emits doubles).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from isee3_decoder_tpu.cli._io import open_input, read_iq_block


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="spindown")
    p.add_argument("-c", type=float, default=0.0, dest="shift")
    p.add_argument("-r", type=float, default=250000.0, dest="samprate")
    p.add_argument("-f", action="store_true", dest="flip")
    p.add_argument("-q", action="store_true", dest="quiet")
    p.add_argument("input", nargs="?", default=None)
    a = p.parse_args(argv)

    fftsize = 131072  # block size (spindown.c:31)
    f = open_input(a.input)
    cstep = 2 * np.pi * a.shift / a.samprate
    while True:
        blk = read_iq_block(f, fftsize, a.flip)
        if blk is None:
            break
        # carrier restarts at phase 0 each block (spindown.c:131-137)
        i = np.arange(len(blk))
        lo = np.exp(-1j * cstep * i)
        out = blk.astype(np.complex128) * lo
        inter = np.empty(2 * len(out))
        inter[0::2] = out.real
        inter[1::2] = out.imag
        sys.stdout.buffer.write(inter.astype("<f8").tobytes())
    sys.stdout.buffer.flush()
    return 0


if __name__ == "__main__":
    from isee3_decoder_tpu.cli._io import run_main

    run_main(main)
