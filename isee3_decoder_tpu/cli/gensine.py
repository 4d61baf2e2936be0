"""gensine CLI — synthetic complex sinusoid generator (gensine.c).

Writes int16 I,Q pairs on stdout: 2 kHz @ 32768 sps, amplitude 20000,
10 seconds — the reference's fixed parameters, made adjustable.
"""

from __future__ import annotations

import argparse
import sys

from isee3_decoder_tpu.cli._io import status, write_int16
from isee3_decoder_tpu.utils.testsignal import gensine


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gensine")
    p.add_argument("-c", type=float, default=2000.0, dest="carrier")
    p.add_argument("-r", type=float, default=32768.0, dest="samprate")
    p.add_argument("-a", type=float, default=20000.0, dest="amplitude")
    p.add_argument("-s", type=float, default=10.0, dest="seconds")
    p.add_argument("-p", type=float, default=0.0, dest="phase")
    a = p.parse_args(argv)
    n = int(a.seconds * a.samprate)
    status(
        f"gensine: carrier {a.carrier} Hz, sample rate {a.samprate} Hz, "
        f"amplitude {a.amplitude}, {n} samples"
    )
    write_int16(gensine(n, a.carrier, a.samprate, a.amplitude, a.phase))
    return 0


if __name__ == "__main__":
    from isee3_decoder_tpu.cli._io import run_main

    run_main(main)
