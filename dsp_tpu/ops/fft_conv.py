"""FFT convolution engines (reference: /root/reference/fir.c, fir_p.c,
zita_convolver.cpp).

Two TPU-native designs replace the reference's three CPU engines:

* ``ols``: zero-latency single-FFT overlap-save over the chain block. The
  reference's fir.c buffers fft_len input frames (latency = fft_len); on TPU
  one batched rFFT over [history | block] gives the exact convolution with
  ZERO latency — strictly better than the reference's documented behavior.
  Used for filters whose length is of the order of the block size.

* ``upols``: uniform partitioned overlap-save with a frequency-domain delay
  line (FDL). The filter is split into partitions of one block; each step is
  one rFFT, a batched complex multiply-accumulate over the FDL (a tensor
  contraction that XLA maps to the MXU), and one irFFT. This replaces both
  fir_p.c's non-uniform partitions + worker threads and zita_convolver's
  internal threading: the latency-hiding the reference gets from threads is
  unnecessary because the whole MAC is a single fused device op.

* ``nupols``: two-group non-uniform partitioning for LONG filters at SMALL
  blocks (the regime the reference's fir_p.c:290-335 geometric groups exist
  for). A uniform FDL at block B touches all K = F/B partition spectra every
  step; at B=256 and F=1M that is 4096 partitions (~34 MB of HBM traffic per
  5.8 ms of audio). The two-group engine keeps a head group at partition B
  covering taps [0, P) and a tail group at partition P = m*B covering
  [P, F): the tail fires once every m blocks inside ``lax.cond``, and its
  UPOLS output for super-block s is exactly the taps>=P contribution to the
  NEXT super-block's outputs, so scheduling adds no latency. Choosing
  m ~ sqrt(F/B) balances the groups: per-step partition traffic drops from
  F/B to ~2*sqrt(F/B) (64x less at B=256/F=1M). Unlike the reference, no
  worker threads or cross-thread handoff: both groups are compiled into the
  same jitted step. Caveat: under vmap (stream batching) the cond becomes a
  select and the tail executes every step — callers batch at large blocks
  where the uniform engine is selected anyway.

Both operate per chain block with static shapes; state is carried in the
effect's pytree.
"""

import numpy as np


def next_fast_len(n):
    """Smallest 2^a*3^b*5^c*7^d >= n (util.c:434-458)."""
    if n <= 1:
        return 1
    best = n * 7
    p2 = 1
    while p2 <= 2 * n:
        p3 = p2
        while p3 <= 2 * n:
            p5 = p3
            while p5 <= 2 * n:
                p7 = p5
                while p7 <= 2 * n:
                    if n <= p7 < best:
                        best = p7
                    p7 *= 7
                p5 *= 5
            p3 *= 3
        p2 *= 2
    return best


class OlsConv:
    """Zero-latency overlap-save convolution of a fixed block size.

    filters: [C, F] float64 per-channel impulse responses (identity rows give
    passthrough). Call make(block) once; step(state, x) per block.
    """

    def __init__(self, filters, block_frames):
        filters = np.asarray(filters, dtype=np.float64)
        self.C, self.F = filters.shape
        self.B = block_frames
        self.N = next_fast_len(self.B + self.F - 1)
        self.H = np.fft.rfft(
            np.concatenate([filters, np.zeros((self.C, self.N - self.F))], axis=1), axis=1
        )  # [C, N//2+1]
        self.hist = self.F - 1  # carried input history

    def state0(self):
        return np.zeros((self.hist, self.C), dtype=np.float64)

    def step(self, state, x):
        import jax.numpy as jnp

        B = x.shape[0]
        assert B == self.B
        buf = jnp.concatenate([state.astype(x.dtype), x], axis=0)  # [hist+B, C]
        pad = self.N - (self.hist + B)
        xt = jnp.concatenate([buf, jnp.zeros((pad, self.C), dtype=x.dtype)], axis=0)
        X = jnp.fft.rfft(xt, axis=0)
        # filter spectrum cast to the signal's complex dtype ON THE HOST: a
        # c128 constant in-graph either promotes the product or crashes the
        # TPU constant folder (C128->F32 conversion is unimplemented there)
        cdtype = np.complex64 if x.dtype == jnp.float32 else np.complex128
        H = jnp.asarray(np.ascontiguousarray(self.H.T, dtype=cdtype))  # [N//2+1, C]
        Y = X * H
        y = jnp.fft.irfft(Y, n=self.N, axis=0).astype(x.dtype)
        out = y[self.hist : self.hist + B]
        new_state = buf[-self.hist :] if self.hist > 0 else state
        return new_state, out


class UpolsConv:
    """Uniform partitioned overlap-save with a frequency-domain delay line.

    filters: [C, F]. Partition length = block_frames; FFT size 2*block.
    Per step: push rfft([prev_block, block]) into the FDL, multiply-accumulate
    against the partitioned filter spectra, irfft, keep the valid half.
    """

    def __init__(self, filters, block_frames):
        filters = np.asarray(filters, dtype=np.float64)
        self.C, self.F = filters.shape
        self.B = B = block_frames
        self.K = K = max(1, -(-self.F // B))
        self.N = 2 * B
        parts = np.zeros((K, self.C, B), dtype=np.float64)
        for k in range(K):
            seg = filters[:, k * B : (k + 1) * B]
            parts[k, :, : seg.shape[1]] = seg
        self.Hf = np.fft.rfft(
            np.concatenate([parts, np.zeros((K, self.C, B))], axis=2), axis=2
        )  # [K, C, B+1]

    def state0(self):
        # fdl spectra stored as (re, im) float pairs: complex arrays must not
        # cross the jit boundary (complex D2H/H2D is unimplemented over the
        # tunneled TPU runtime); XLA represents complex as re/im pairs anyway
        return {
            "prev": np.zeros((self.B, self.C), dtype=np.float64),
            "fdl": np.zeros((self.K, self.B + 1, self.C, 2), dtype=np.float64),
        }

    def step(self, state, x):
        import jax.numpy as jnp

        B = self.B
        assert x.shape[0] == B
        seg = jnp.concatenate([state["prev"].astype(x.dtype), x], axis=0)  # [2B, C]
        X = jnp.fft.rfft(seg, axis=0)  # [B+1, C]
        cdtype = jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128
        fdl_c = state["fdl"][..., 0].astype(x.dtype) + 1j * state["fdl"][..., 1].astype(x.dtype)
        fdl = jnp.concatenate([X[None].astype(cdtype), fdl_c[:-1]], axis=0)  # [K, B+1, C]
        # host-side cast (see OlsConv.step: c128 constants crash TPU folding)
        H = jnp.asarray(
            np.ascontiguousarray(np.transpose(self.Hf, (0, 2, 1)), dtype=np.dtype(cdtype))
        )  # [K, B+1, C]
        Y = (fdl * H).sum(axis=0)  # [B+1, C]
        y = jnp.fft.irfft(Y, n=self.N, axis=0).astype(x.dtype)
        out = y[B:]
        fdl_pairs = jnp.stack([fdl.real, fdl.imag], axis=-1).astype(x.dtype)
        return {"prev": x, "fdl": fdl_pairs}, out


class NupolsConv:
    """Two-group non-uniform partitioned overlap-save (zero latency).

    Head: UpolsConv over taps [0, P) at partition B. Tail: partition size
    P = m*B over taps [P, F), fired by ``lax.cond`` on the last block of each
    super-block of m chain blocks. The tail's UPOLS output computed from
    super-block s (input frames [sP, (s+1)P), using the tail FDL of past
    super-block spectra) equals the taps>=P contribution to output frames
    [(s+1)P, (s+2)P), i.e. the next super-block — available exactly when the
    fire happens, so the schedule is causal with zero added latency.

    Reference analog: fir_p.c:290-335 (geometric partition groups on worker
    threads with FDL-lag output delay). Here both groups live in one jitted
    step; there is nothing to hand off between threads.
    """

    def __init__(self, filters, block_frames, super_mult):
        filters = np.asarray(filters, dtype=np.float64)
        self.C, self.F = filters.shape
        self.B = B = block_frames
        self.m = m = int(super_mult)
        self.P = P = m * B
        if self.F <= P:
            raise ValueError("NupolsConv: filter shorter than head span; use UpolsConv")
        self.head = UpolsConv(filters[:, :P], B)
        tail = filters[:, P:]
        self.K1 = K1 = max(1, -(-tail.shape[1] // P))
        parts = np.zeros((K1, self.C, P), dtype=np.float64)
        for k in range(K1):
            seg = tail[:, k * P : (k + 1) * P]
            parts[k, :, : seg.shape[1]] = seg
        self.H1 = np.fft.rfft(
            np.concatenate([parts, np.zeros((K1, self.C, P))], axis=2), axis=2
        )  # [K1, C, P+1]

    def state0(self):
        P, C = self.P, self.C
        return {
            "head": self.head.state0(),
            "stage": np.zeros((P, C), dtype=np.float64),       # current super-block input
            "prev_super": np.zeros((P, C), dtype=np.float64),  # previous super-block input
            "tail_fdl": np.zeros((self.K1, P + 1, C, 2), dtype=np.float64),
            "tail_out": np.zeros((P, C), dtype=np.float64),    # taps>=P contribution, current super
            "cnt": np.zeros((), dtype=np.int32),               # block index within super-block
        }

    def step(self, state, x):
        import jax
        import jax.numpy as jnp

        B, P, m, C, K1 = self.B, self.P, self.m, self.C, self.K1
        assert x.shape[0] == B
        hstate, y_head = self.head.step(state["head"], x)
        i = state["cnt"]
        off = (i * B).astype(jnp.int32)
        tail_seg = jax.lax.dynamic_slice(
            state["tail_out"].astype(x.dtype), (off, jnp.int32(0)), (B, C)
        )
        out = y_head + tail_seg
        stage = jax.lax.dynamic_update_slice(
            state["stage"].astype(x.dtype), x, (off, jnp.int32(0))
        )
        cdtype = jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128

        def fire(stage, prev_super, tail_fdl, _tail_out):
            seg = jnp.concatenate([prev_super, stage], axis=0)  # [2P, C]
            X = jnp.fft.rfft(seg, axis=0)  # [P+1, C]
            fdl_c = tail_fdl[..., 0].astype(x.dtype) + 1j * tail_fdl[..., 1].astype(x.dtype)
            if K1 > 1:
                fdl = jnp.concatenate([X[None].astype(cdtype), fdl_c[:-1]], axis=0)
            else:
                fdl = X[None].astype(cdtype)
            H = jnp.asarray(  # host-side cast (see OlsConv.step)
                np.ascontiguousarray(np.transpose(self.H1, (0, 2, 1)), dtype=np.dtype(cdtype))
            )  # [K1, P+1, C]
            Y = (fdl * H).sum(axis=0)
            y = jnp.fft.irfft(Y, n=2 * P, axis=0).astype(x.dtype)[P:]  # [P, C]
            fdl_pairs = jnp.stack([fdl.real, fdl.imag], axis=-1).astype(x.dtype)
            return stage, fdl_pairs, y  # prev_super', tail_fdl', tail_out'

        def hold(stage, prev_super, tail_fdl, tail_out):
            return prev_super, tail_fdl.astype(x.dtype), tail_out.astype(x.dtype)

        last = i == (m - 1)
        prev_super, tail_fdl, tail_out = jax.lax.cond(
            last, fire, hold, stage,
            state["prev_super"].astype(x.dtype),
            state["tail_fdl"], state["tail_out"],
        )
        cnt = jnp.where(last, jnp.int32(0), (i + 1).astype(jnp.int32))
        new_state = {
            "head": hstate,
            "stage": stage,
            "prev_super": prev_super,
            "tail_fdl": tail_fdl,
            "tail_out": tail_out,
            "cnt": cnt,
        }
        return new_state, out
