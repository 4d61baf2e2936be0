"""Build the reference C programs as golden oracles.

The reference sources in /root/reference are compiled *in place* (never
copied into this repo) into build/golden/.  Only the programs that do not
link FFTW3 can be built (Makefile:35-66 — pmdemod/icesync/spindown/
autocorrelate need -lfftw3, which is not installed); gensine #includes
fftw3.h without using it, so a stub header lets it compile.

Programs built (reference Makefile link lines):
  symdemod     symdemod.c timeformat.c -lm
  decode_sse   decode.c viterbi224_sse2.c timeformat.c metrics.c fano.c -lm
  decode_port  decode.c viterbi224_port.c timeformat.c metrics.c fano.c -lm
  qdecode      qdecode.c
  framer       framer.c timeformat.c
  vdecode_sse  vdecode.c viterbi224_sse2.c timeformat.c -lm
  gensine      gensine.c -lm           (with stub fftw3.h)
  dump_metrics dump_metrics.c metrics.c -lm   (our tiny driver, see below)
  dump_encode  dump_encode.c encode.c         (our tiny driver)
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

REF = Path("/root/reference")
BUILD = Path(__file__).resolve().parents[1] / "build" / "golden"

CFLAGS = ["-O2", "-msse2", "-g", "-fcommon"]

# Tiny C drivers of our own (kept inline here, written at build time) that
# link reference objects to expose library-level entry points for golden
# dumps.  These are new code, not reference code.
DUMP_METRICS_C = r"""
#include <stdio.h>
#include <stdlib.h>
int Verbose = 0;
void gen_met(int mettab[2][256], double signal, double noise, double bias,
             double scale);
int main(int argc, char **argv) {
  /* usage: dump_metrics signal noise bias scale */
  int mettab[2][256];
  int tx, s;
  if (argc != 5) return 1;
  gen_met(mettab, atof(argv[1]), atof(argv[2]), atof(argv[3]), atof(argv[4]));
  for (tx = 0; tx < 2; tx++)
    for (s = 0; s < 256; s++)
      printf("%d\n", mettab[tx][s]);
  return 0;
}
"""

DUMP_FANO_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
int Verbose = 0;
void gen_met(int mettab[2][256], double signal, double noise, double bias,
             double scale);
int fano(unsigned long *metric, unsigned long *cycles, unsigned char *data,
         const unsigned char *symbols, unsigned int nbits, int mettab[2][256],
         int delta, unsigned long maxcycles, unsigned long long encstate,
         unsigned long long tailbits);
int main(int argc, char **argv) {
  /* usage: dump_fano nbits delta maxcycles encstate_hex tailbits_hex
     < symbol_bytes; prints goodbits/metric/cycles then data hex.
     Metric table fixed at decode.c:120-135 defaults (amp 100, Es/N0 1,
     bias 0.5, scale 8). */
  int mettab[2][256];
  unsigned char symbols[1 << 20], data[1 << 16];
  unsigned long metric, cycles;
  int nbits, delta, res, i;
  unsigned long maxcycles;
  unsigned long long encstate, tailbits;
  if (argc != 6) return 1;
  nbits = atoi(argv[1]);
  delta = atoi(argv[2]);
  maxcycles = strtoul(argv[3], NULL, 10);
  encstate = strtoull(argv[4], NULL, 16);
  tailbits = strtoull(argv[5], NULL, 16);
  gen_met(mettab, 81.64965809277261, 57.73502691896258, 0.5, 8.0);
  if (fread(symbols, 1, 2 * nbits, stdin) != (size_t)(2 * nbits)) return 2;
  memset(data, 0, sizeof(data));
  res = fano(&metric, &cycles, data, symbols, nbits, mettab, delta, maxcycles,
             encstate, tailbits);
  fprintf(stderr, "goodbits %d metric %ld cycles %lu\n", res, (long)metric,
          cycles);
  for (i = 0; i < nbits / 8; i++) fprintf(stderr, "%02x", data[i]);
  fprintf(stderr, "\n");
  return 0;
}
"""

DUMP_ENCODE_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
unsigned long long encode(unsigned char *symbols, const unsigned char *data,
                          unsigned int nbytes, unsigned long long encstate);
int main(int argc, char **argv) {
  /* usage: dump_encode encstate_hex < data_bytes > symbol_bytes */
  unsigned char data[65536], *symbols;
  unsigned long long state;
  size_t n;
  if (argc != 2) return 1;
  state = strtoull(argv[1], NULL, 16);
  n = fread(data, 1, sizeof(data), stdin);
  symbols = malloc(16 * n + 64);
  state = encode(symbols, data, (unsigned int)n, state);
  fwrite(symbols, 1, 16 * n, stdout);
  fprintf(stderr, "%llx\n", state);
  return 0;
}
"""

PROGRAMS = {
    "symdemod": (["symdemod.c", "timeformat.c"], ["-lm"]),
    "decode_sse": (
        ["decode.c", "viterbi224_sse2.c", "timeformat.c", "metrics.c", "fano.c"],
        ["-lm"],
    ),
    "decode_port": (
        ["decode.c", "viterbi224_port.c", "timeformat.c", "metrics.c", "fano.c"],
        ["-lm"],
    ),
    "qdecode": (["qdecode.c"], []),
    "framer": (["framer.c", "timeformat.c"], []),
    "vdecode_sse": (["vdecode.c", "viterbi224_sse2.c", "timeformat.c"], ["-lm"]),
    "gensine": (["gensine.c"], ["-lm"]),
}


def _write_stub_headers(incdir: Path) -> None:
    incdir.mkdir(parents=True, exist_ok=True)
    # gensine.c includes fftw3.h but never calls FFTW (Makefile links it
    # with only -lm); an empty stub satisfies the include.
    (incdir / "fftw3.h").write_text("/* stub: gensine.c needs no FFTW */\n")


def golden_bin(name: str) -> Path:
    """Compile (once) and return the path of a golden oracle binary.

    Raises RuntimeError if gcc or the reference tree is unavailable —
    callers (pytest fixtures) turn that into a skip.
    """
    if shutil.which("gcc") is None:
        raise RuntimeError("gcc not available")
    if not REF.is_dir():
        raise RuntimeError("reference tree not available")
    BUILD.mkdir(parents=True, exist_ok=True)
    out = BUILD / name
    if out.exists():
        return out

    incdir = BUILD / "include"
    _write_stub_headers(incdir)

    extra_cflags: list[str] = []
    if name == "dump_metrics":
        src = BUILD / "dump_metrics.c"
        src.write_text(DUMP_METRICS_C)
        srcs, libs = [str(src), str(REF / "metrics.c")], ["-lm"]
    elif name in ("dump_fano", "dump_fano_dbg"):
        src = BUILD / "dump_fano.c"
        src.write_text(DUMP_FANO_C)
        srcs, libs = [str(src), str(REF / "fano.c"), str(REF / "metrics.c")], ["-lm"]
        if name == "dump_fano_dbg":
            extra_cflags = ["-Ddebug=1"]  # fano.c:113 per-cycle walk trace
    elif name == "dump_encode":
        src = BUILD / "dump_encode.c"
        src.write_text(DUMP_ENCODE_C)
        srcs, libs = [str(src), str(REF / "encode.c")], []
    else:
        files, libs = PROGRAMS[name]
        srcs = [str(REF / f) for f in files]

    cmd = (
        ["gcc", *CFLAGS, *extra_cflags, f"-I{REF}", f"-I{incdir}",
         "-o", str(out), *srcs, *libs]
    )
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"golden build of {name} failed:\n{proc.stderr}")
    return out


def run_golden(
    name: str, args: list[str], stdin: bytes, timeout: float = 600.0
) -> tuple[bytes, bytes]:
    """Run a golden binary; returns (stdout, stderr) bytes."""
    exe = golden_bin(name)
    proc = subprocess.run(
        [str(exe), *args],
        input=stdin,
        capture_output=True,
        timeout=timeout,
        env={"LANG": "C"},
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"golden {name} exited {proc.returncode}: {proc.stderr[-2000:]!r}"
        )
    return proc.stdout, proc.stderr
