"""autocorrelate CLI — whole-file spectrum/autocorrelation dumps
(autocorrelate.c): writes spectrum.plot, autospect.plot, autocorr.plot.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from isee3_decoder_tpu.cli._io import status


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="autocorrelate")
    p.add_argument("-r", type=float, default=250000.0, dest="samprate")
    p.add_argument("-o", type=int, default=0, dest="offset")
    p.add_argument("input")
    a = p.parse_args(argv)

    samples = np.fromfile(a.input, "<i2")[a.offset :].astype(np.float64)
    n = len(samples)
    status(f"{a.input}: {n:,} samples, {n / a.samprate:,.3f} seconds @ {a.samprate:.1f} Hz")
    size = 1 << int(np.ceil(np.log2(max(n, 2))))
    status(f"Correlator size = {size:,}")
    spec = np.fft.rfft(samples, size)

    with open("spectrum.plot", "w") as f:
        f.write("double double\ntitle\nSpectrum\nxlabel\nHz\n")
        for i in range(size // 2):
            f.write(f"dot {i * a.samprate / size:f} {abs(spec[i]):f}\n")
    status("spectrum plot in spectrum.plot")

    power = spec * np.conj(spec)
    with open("autospect.plot", "w") as f:
        f.write("double double\ntitle\nAutocorr spectrum\nxlabel\nHz\n")
        for i in range(size // 2):
            f.write(f"dot {i * a.samprate / size:f} {abs(power[i]):f}\n")
    status("autocorrelation spectrum plot in autospect.plot")

    corr = np.fft.irfft(power, size)
    with open("autocorr.plot", "w") as f:
        f.write("double double\ntitle\nAutocorrelation\nxlabel\nsec\n")
        for i in range(1, size // 2):
            f.write(f"dot {i / a.samprate:f} {corr[i]:f}\n")
    status("autocorrelation plot in autocorr.plot")
    return 0


if __name__ == "__main__":
    from isee3_decoder_tpu.cli._io import run_main

    run_main(main)
