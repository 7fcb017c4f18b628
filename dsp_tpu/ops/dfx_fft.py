"""Double-float (two-float32) FFT for accuracy-critical spectral effects.

The resampler's error budget is -120 dBFS worst-sample vs the C build
(BASELINE.json); a plain float32 FFT's internal rounding alone lands around
-118 dBFS on full-band program material (eps * sqrt(N log N) growth), so the
f32 TPU path needs a higher-precision transform. float64 is not viable on
TPU; this module implements a radix-2 Stockham FFT whose butterflies and
twiddle multiplies run in double-float (hi, lo) float32 pairs — ~49-bit
effective mantissa, well past the budget — with twiddles split exactly from
host float64 (reference use: resample.c:110-148's spectral convolution).

Layout: arrays are [N, ...] with the transform over axis 0; re/im parts kept
as separate DF values (no complex dtype). The Stockham iteration auto-sorts,
so no bit-reversal pass is needed. Cost is ~12x a native f32 FFT's flops,
all elementwise VPU work.
"""

import numpy as np

from dsp_tpu.ops.dfx import DF, _df_add, _df_mul


def _split64(a):
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


class DfFft:
    """Plan for a length-N (power of two) double-float FFT over axis 0."""

    def __init__(self, N):
        assert N & (N - 1) == 0 and N > 0, f"DfFft needs a power of two, got {N}"
        self.N = N
        self.stages = []
        n = N
        while n > 1:
            half = n // 2
            k = np.arange(half)
            w = np.exp(-2j * np.pi * k / n)  # DIF twiddles for current length n
            self.stages.append((_split64(w.real), _split64(w.imag)))
            n = half

    def _stages_jnp(self, conj):
        import jax.numpy as jnp

        out = []
        for (wrh, wrl), (wih, wil) in self.stages:
            sign = -1.0 if conj else 1.0
            out.append(
                (
                    DF(jnp.asarray(wrh), jnp.asarray(wrl)),
                    DF(jnp.asarray(sign * wih), jnp.asarray(sign * wil)),
                )
            )
        return out

    def fft(self, xr, xi, conj=False):
        """Complex DF FFT over axis 0. xr/xi: DF of shape [N, ...].
        conj=True computes the conjugate-twiddle transform (the inverse
        without the 1/N scale)."""
        import jax.numpy as jnp

        N = self.N
        extra = xr.hi.shape[1:]
        # Stockham DIF: view [l, n, ...]; butterflies split n -> n/2 and the
        # results interleave into [2l, n/2, ...] keeping natural output order
        def rs(v, l, n):
            return DF(v.hi.reshape((l, n) + extra), v.lo.reshape((l, n) + extra))

        l, n = 1, N
        for wr, wi in self._stages_jnp(conj):
            half = n // 2
            xr = rs(xr, l, n)
            xi = rs(xi, l, n)
            ar, br = xr[:, :half], xr[:, half:]
            ai, bi = xi[:, :half], xi[:, half:]
            er = ar + br
            ei = ai + bi
            dr = ar - br
            di = ai - bi
            # odd = (a - b) * w  (complex df multiply); twiddle shape [half]
            wshape = (1, half) + (1,) * len(extra)
            wr_b = DF(wr.hi.reshape(wshape), wr.lo.reshape(wshape))
            wi_b = DF(wi.hi.reshape(wshape), wi.lo.reshape(wshape))
            or_ = dr * wr_b - di * wi_b
            oi_ = dr * wi_b + di * wr_b
            # interleave even/odd along a new axis -> [l, 2, half, ...]
            xr = DF(
                jnp.stack([er.hi, or_.hi], axis=1).reshape((l * 2 * half,) + extra),
                jnp.stack([er.lo, or_.lo], axis=1).reshape((l * 2 * half,) + extra),
            )
            xi = DF(
                jnp.stack([ei.hi, oi_.hi], axis=1).reshape((l * 2 * half,) + extra),
                jnp.stack([ei.lo, oi_.lo], axis=1).reshape((l * 2 * half,) + extra),
            )
            l *= 2
            n = half
        # Stockham with this stacking yields bit-reversed order; undo once.
        perm = _bitrev(N)
        import jax.numpy as jnp2

        idx = jnp2.asarray(perm)
        return DF(xr.hi[idx], xr.lo[idx]), DF(xi.hi[idx], xi.lo[idx])

    def ifft(self, Xr, Xi):
        """Inverse complex DF FFT (with 1/N scale)."""
        yr, yi = self.fft(Xr, Xi, conj=True)
        s = 1.0 / self.N  # power of two: exact in f32
        return yr * s, yi * s


def _bitrev(N):
    bits = N.bit_length() - 1
    idx = np.arange(N)
    rev = np.zeros(N, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class DfDft:
    """Arbitrary-length DF DFT: radix-2 Stockham when N is a power of two,
    Bluestein's chirp-z (3 power-of-two FFTs) otherwise.

    Bluestein: DFT(x)[k] = a*[k] * IFFT_M(FFT_M(a*x) * FFT_M(b))[k] with
    a[n] = exp(-i pi n^2/N), b[n] = exp(+i pi n^2/N) wrapped mod M >= 2N-1.
    Chirps and FFT_M(b) are computed host-side in float64 and split exactly."""

    def __init__(self, N):
        self.N = N
        if N & (N - 1) == 0:
            self.pow2 = DfFft(N)
            return
        self.pow2 = None
        M = 1
        while M < 2 * N - 1:
            M *= 2
        self.M = M
        self.fft_m = DfFft(M)
        n = np.arange(N, dtype=np.float64)
        # exp(-i*pi*n^2/N); reduce n^2 mod 2N exactly (int) so the angle stays
        # small — naive n^2*pi/N loses bits for large N
        nsq = (np.arange(N, dtype=np.int64) ** 2) % (2 * N)
        ang = np.pi * nsq.astype(np.float64) / N
        a = np.exp(-1j * ang)
        b = np.zeros(M, dtype=np.complex128)
        b[:N] = np.conj(a)
        b[M - N + 1 :] = np.conj(a[1:][::-1])
        B = np.fft.fft(b)
        self.a_r = _split64(a.real)
        self.a_i = _split64(a.imag)
        self.B_r = _split64(B.real)
        self.B_i = _split64(B.imag)

    def _consts(self, conj):
        import jax.numpy as jnp

        sgn = -1.0 if conj else 1.0
        ar = DF(jnp.asarray(self.a_r[0]), jnp.asarray(self.a_r[1]))
        ai = DF(jnp.asarray(sgn * self.a_i[0]), jnp.asarray(sgn * self.a_i[1]))
        Br = DF(jnp.asarray(self.B_r[0]), jnp.asarray(self.B_r[1]))
        Bi = DF(jnp.asarray(sgn * self.B_i[0]), jnp.asarray(sgn * self.B_i[1]))
        return ar, ai, Br, Bi

    def dft(self, xr, xi, conj=False):
        """Forward DFT over axis 0 (conj=True: conjugate transform, i.e. the
        unscaled inverse)."""
        import jax.numpy as jnp

        if self.pow2 is not None:
            return self.pow2.fft(xr, xi, conj=conj)
        N, M = self.N, self.M
        extra = xr.hi.shape[1:]
        ar, ai, Br, Bi = self._consts(conj)
        shp = (N,) + (1,) * len(extra)

        def bc(v):
            return DF(v.hi.reshape(shp), v.lo.reshape(shp))

        arb, aib = bc(ar), bc(ai)
        yr = xr * arb - xi * aib
        yi = xr * aib + xi * arb
        pad = [(0, M - N)] + [(0, 0)] * len(extra)
        yr = DF(jnp.pad(yr.hi, pad), jnp.pad(yr.lo, pad))
        yi = DF(jnp.pad(yi.hi, pad), jnp.pad(yi.lo, pad))
        Yr, Yi = self.fft_m.fft(yr, yi)
        shpM = (M,) + (1,) * len(extra)

        def bcM(v):
            return DF(v.hi.reshape(shpM), v.lo.reshape(shpM))

        Brb, Bib = bcM(Br), bcM(Bi)
        Zr = Yr * Brb - Yi * Bib
        Zi = Yr * Bib + Yi * Brb
        zr, zi = self.fft_m.ifft(Zr, Zi)
        zr = DF(zr.hi[:N], zr.lo[:N])
        zi = DF(zi.hi[:N], zi.lo[:N])
        outr = zr * arb - zi * aib
        outi = zr * aib + zi * arb
        return outr, outi

    def idft(self, Xr, Xi):
        yr, yi = self.dft(Xr, Xi, conj=True)
        s = 1.0 / self.N
        # 1/N is inexact for non-pow2 N: scale in df
        sr = DF(np.float32(s), np.float32(np.float64(s) - np.float64(np.float32(s))))
        return yr * sr, yi * sr

    def rfft(self, x):
        """Real DF input [N, ...] -> (Xr, Xi) DF [N//2+1, ...]."""
        import jax.numpy as jnp

        zi = DF(jnp.zeros_like(x.hi), jnp.zeros_like(x.lo))
        Xr, Xi = self.dft(x, zi)
        h = self.N // 2 + 1
        return Xr[:h], Xi[:h]

    def irfft(self, Xr, Xi):
        """Hermitian (Xr, Xi) DF [N//2+1, ...] -> real DF [N, ...]."""
        import jax.numpy as jnp

        N = self.N
        tail = slice((N - 1) // 2, 0, -1)
        fr = DF(
            jnp.concatenate([Xr.hi, Xr.hi[tail]], axis=0),
            jnp.concatenate([Xr.lo, Xr.lo[tail]], axis=0),
        )
        fi = DF(
            jnp.concatenate([Xi.hi, -Xi.hi[tail]], axis=0),
            jnp.concatenate([Xi.lo, -Xi.lo[tail]], axis=0),
        )
        yr, _ = self.idft(fr, fi)
        return yr


def df_lift_array(x):
    """Plain f32/f64 array -> DF (exact for f64 inputs up to 48 bits)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        hi = x.astype(jnp.float32)
        return DF(hi, (x - hi.astype(jnp.float64)).astype(jnp.float32))
    return DF(x, jnp.zeros_like(x))


def rfft_df(plan, x):
    """Real-input DF FFT: x DF [N, ...] -> (Xr, Xi) DF [N//2+1, ...]."""
    import jax.numpy as jnp

    zr = DF(jnp.zeros_like(x.hi), jnp.zeros_like(x.lo))
    Xr, Xi = plan.fft(x, zr)
    h = plan.N // 2 + 1
    return Xr[:h], Xi[:h]


def irfft_df(plan, Xr, Xi):
    """Hermitian-input inverse: (Xr, Xi) DF [N//2+1, ...] -> real DF [N, ...]."""
    import jax.numpy as jnp

    N = plan.N
    # rebuild the full spectrum X[N-k] = conj(X[k])
    tail = slice((N - 1) // 2, 0, -1)
    fr = DF(
        jnp.concatenate([Xr.hi, Xr.hi[tail]], axis=0),
        jnp.concatenate([Xr.lo, Xr.lo[tail]], axis=0),
    )
    fi = DF(
        jnp.concatenate([Xi.hi, -Xi.hi[tail]], axis=0),
        jnp.concatenate([Xi.lo, -Xi.lo[tail]], axis=0),
    )
    yr, _ = plan.ifft(fr, fi)
    return yr
