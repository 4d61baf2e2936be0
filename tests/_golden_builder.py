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

# A minimal double-precision FFTW3 API shim (NEW code, not FFTW) so the
# FFTW-linked reference programs (pmdemod, icesync, autocorrelate) can be
# compiled as golden oracles without libfftw3 (VERDICT r3 missing #2).
# Covers exactly the surface the reference uses: alloc_complex/real,
# plan_dft_1d (c2c), plan_dft_r2c_1d / c2r_1d, execute, destroy_plan,
# free, import_system_wisdom.  FFTW conventions: FORWARD = exp(-i2pijk/n),
# all transforms unnormalized, r2c emits n/2+1 bins.  Power-of-two sizes
# use an iterative radix-2 Cooley-Tukey; anything else falls back to a
# naive O(n^2) DFT (correct, slow — reference FFT sizes are pow2).
FFTW_SHIM_H = r"""
#ifndef FFTW_SHIM_H
#define FFTW_SHIM_H
#include <stddef.h>
/* reference sources include <complex.h> first (pmdemod.c:16) */
typedef double _Complex fftw_complex;
typedef struct fftw_plan_s *fftw_plan;
#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE (0U)
fftw_complex *fftw_alloc_complex(size_t n);
double *fftw_alloc_real(size_t n);
void *fftw_malloc(size_t n);
void fftw_free(void *p);
void fftw_import_system_wisdom(void);
fftw_plan fftw_plan_dft_1d(int n, fftw_complex *in, fftw_complex *out,
                           int sign, unsigned flags);
fftw_plan fftw_plan_dft_r2c_1d(int n, double *in, fftw_complex *out,
                               unsigned flags);
fftw_plan fftw_plan_dft_c2r_1d(int n, fftw_complex *in, double *out,
                               unsigned flags);
void fftw_execute(fftw_plan p);
void fftw_destroy_plan(fftw_plan p);
#endif
"""

FFTW_SHIM_C = r"""
#include <complex.h>
#include <math.h>
#include <stdlib.h>
#include <string.h>
#include "fftw3.h"

struct fftw_plan_s {
  int n, sign, kind; /* kind: 0 = c2c, 1 = r2c, 2 = c2r */
  void *in, *out;
  double complex *work;
};

fftw_complex *fftw_alloc_complex(size_t n) {
  return malloc(n * sizeof(fftw_complex));
}
double *fftw_alloc_real(size_t n) { return malloc(n * sizeof(double)); }
void *fftw_malloc(size_t n) { return malloc(n); }
void fftw_free(void *p) { free(p); }
void fftw_import_system_wisdom(void) {}

static fftw_plan mkplan(int n, int sign, int kind, void *in, void *out) {
  fftw_plan p = malloc(sizeof(*p));
  p->n = n; p->sign = sign; p->kind = kind; p->in = in; p->out = out;
  p->work = malloc(n * sizeof(double complex));
  return p;
}
fftw_plan fftw_plan_dft_1d(int n, fftw_complex *in, fftw_complex *out,
                           int sign, unsigned flags) {
  (void)flags; return mkplan(n, sign, 0, in, out);
}
fftw_plan fftw_plan_dft_r2c_1d(int n, double *in, fftw_complex *out,
                               unsigned flags) {
  (void)flags; return mkplan(n, FFTW_FORWARD, 1, in, out);
}
fftw_plan fftw_plan_dft_c2r_1d(int n, fftw_complex *in, double *out,
                               unsigned flags) {
  (void)flags; return mkplan(n, FFTW_BACKWARD, 2, in, out);
}
void fftw_destroy_plan(fftw_plan p) {
  if (p) { free(p->work); free(p); }
}

/* unnormalized DFT of x (length n) in place; sign -1 forward */
static void dft(double complex *x, int n, int sign) {
  if ((n & (n - 1)) == 0) { /* iterative radix-2 */
    int i, j, len;
    for (i = 1, j = 0; i < n; i++) { /* bit-reverse permutation */
      int bit = n >> 1;
      for (; j & bit; bit >>= 1) j ^= bit;
      j ^= bit;
      if (i < j) { double complex t = x[i]; x[i] = x[j]; x[j] = t; }
    }
    for (len = 2; len <= n; len <<= 1) {
      double ang = sign * 2.0 * M_PI / len;
      double complex wl = cos(ang) + I * sin(ang);
      for (i = 0; i < n; i += len) {
        double complex w = 1.0;
        for (j = 0; j < len / 2; j++) {
          double complex u = x[i + j], v = x[i + j + len / 2] * w;
          x[i + j] = u + v;
          x[i + j + len / 2] = u - v;
          w *= wl;
        }
      }
    }
  } else { /* naive fallback for non-pow2 */
    double complex *tmp = malloc(n * sizeof(double complex));
    int k, t;
    for (k = 0; k < n; k++) {
      double complex acc = 0;
      for (t = 0; t < n; t++) {
        double ang = sign * 2.0 * M_PI * (double)k * (double)t / n;
        acc += x[t] * (cos(ang) + I * sin(ang));
      }
      tmp[k] = acc;
    }
    memcpy(x, tmp, n * sizeof(double complex));
    free(tmp);
  }
}

void fftw_execute(fftw_plan p) {
  int n = p->n, i;
  if (p->kind == 0) { /* c2c */
    memcpy(p->work, p->in, n * sizeof(double complex));
    dft(p->work, n, p->sign);
    memcpy(p->out, p->work, n * sizeof(double complex));
  } else if (p->kind == 1) { /* r2c: n reals -> n/2+1 bins */
    const double *in = p->in;
    double complex *out = p->out;
    for (i = 0; i < n; i++) p->work[i] = in[i];
    dft(p->work, n, -1);
    for (i = 0; i <= n / 2; i++) out[i] = p->work[i];
  } else { /* c2r: n/2+1 bins -> n reals, hermitian-extended */
    const double complex *in = p->in;
    double *out = p->out;
    p->work[0] = in[0];
    for (i = 1; i <= n / 2; i++) {
      p->work[i] = in[i];
      if (i < n - i) p->work[n - i] = conj(in[i]);
    }
    dft(p->work, n, +1);
    for (i = 0; i < n; i++) out[i] = creal(p->work[i]);
  }
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
    # FFTW-linked programs, built against the shim (VERDICT r3 missing #2)
    "pmdemod": (["pmdemod.c", "timeformat.c", "FFTW_SHIM"], ["-lm"]),
    "icesync": (  # Makefile:59 link line + the shim
        ["icesync.c", "viterbi224_sse2.c", "encode.c", "fano.c", "metrics.c",
         "FFTW_SHIM"],
        ["-lm"],
    ),
    "autocorrelate": (["autocorrelate.c", "FFTW_SHIM"], ["-lm"]),
    "spindown": (["spindown.c", "timeformat.c", "FFTW_SHIM"], ["-lm"]),
}


def _write_stub_headers(incdir: Path) -> None:
    incdir.mkdir(parents=True, exist_ok=True)
    # the shim header satisfies every reference fftw3.h user, from
    # gensine (includes, never calls) to pmdemod/icesync (full surface)
    (incdir / "fftw3.h").write_text(FFTW_SHIM_H)
    (incdir / "fftw_shim.c").write_text(FFTW_SHIM_C)


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
        srcs = [
            str(incdir / "fftw_shim.c") if f == "FFTW_SHIM" else str(REF / f)
            for f in files
        ]

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
