"""Microbenchmark: binning sort strategies at 1M-gaussian scale.

Answers the round-2 question (VERDICT r1 next-step #2): is the 84.8 ms
1M-gaussian frame's dominant cost — the P-wide 12-operand radix sort —
reducible by (a) pre-sorting the N gaussians by depth so the P-sort needs
only a small-range tile key, (b) sorting (key, gid) and row-gathering
afterwards, or (c) narrower keys (does XLA:TPU prune radix passes by key
bit-width at all)?

Run on the real chip:  python benchmarks/bench_sort.py
(Two-point chained-scan timing — the only honest method through the axon
tunnel, where block_until_ready returns early; see utils/profiling.py.)
"""

import time

import numpy as np


def main():
    import os
    import sys

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    # Scale via argv (default 2^20 pairs: compiles in reasonable time
    # through the tunnel; costs here scale linearly in P). GSPLAT_CASES
    # is a comma-separated name filter for per-case subprocess isolation.
    P = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    N = P >> 2
    cases = {s.strip() for s in os.environ.get("GSPLAT_CASES", "").split(",")
             if s.strip()}
    rng = np.random.default_rng(0)
    gid = jnp.asarray(rng.integers(0, N, P, dtype=np.int32))
    cols = [jnp.asarray(rng.normal(size=P).astype(np.float32))
            for _ in range(10)]
    colmat = jnp.stack(cols, axis=-1)
    nbody = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))

    def timed(name, fn, x0):
        """fn: carry -> carry (same shape/dtype); two-point over a scan."""
        if cases and name.split(":")[0] not in cases:
            return None

        def chain(k):
            @jax.jit
            def run(c0):
                def body(c, _):
                    return fn(c), None
                c, _ = jax.lax.scan(body, c0, None, length=k)
                return c.astype(jnp.float32).sum()
            return run

        k1, k2 = 1, 4
        j1, j2 = chain(k1), chain(k2)
        float(j1(x0))
        float(j2(x0))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(j1(x0))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(j2(x0))
            t2 = time.perf_counter() - t0
            best = min(best, (t2 - t1) / (k2 - k1))
        print(f"{name:46s} {1e3 * best:8.2f} ms", flush=True)
        return best

    def perturb(k, width):
        # cheap key refresh so chained iterations aren't degenerate
        return ((k * 1103515245 + 12345) & (width - 1)).astype(jnp.int32)

    def fold(out, skip=1):
        # Data-dependency on EVERY sort output: an unused carried column
        # is DCE'd and the sort silently degrades to a key-only sort.
        s = sum(jnp.sum(o.astype(jnp.float32)) for o in out[skip:])
        return out[0] + (s * 1e-30).astype(jnp.int32)

    key31 = jnp.asarray(rng.integers(0, 1 << 31, P, dtype=np.int32))
    key12 = jnp.asarray(rng.integers(0, 2048, P, dtype=np.int32))
    nkey = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))

    # (a) current fused path: 31-bit key, 12 operands over P
    timed("fused: 31-bit key, 12 operands",
          lambda k: perturb(fold(jax.lax.sort(tuple([k, gid] + cols),
                                              num_keys=1)), 1 << 31), key31)
    # (b) small-range tile-only key, same operands
    timed("tileonly: small-range key, 12 operands",
          lambda k: perturb(fold(jax.lax.sort(tuple([k, gid] + cols),
                                              num_keys=1)), 2048), key12)
    # (c) key+gid sort then a (P,10) row gather
    def sort_gather(k):
        ks, gs = jax.lax.sort((k, gid), num_keys=1)
        mix = (jnp.sum(colmat[gs]) * 1e-30).astype(jnp.int32)
        return perturb(ks + mix, 1 << 31)

    timed("sortgather: key+gid sort + (P,10) row gather", sort_gather, key31)
    # (d) the presort's N-scale cost: 2-op sort over N + (N,12) gather
    def npresort(k):
        ks, perm = jax.lax.sort(
            (k, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        mix = (jnp.sum(nbody[perm]) * 1e-30).astype(jnp.int32)
        return perturb(ks + mix, 1 << 31)

    timed("npresort: N-scale 2-op sort + (N,12) gather", npresort, nkey)
    # (e) key width scaling with minimal operands
    timed("key31gid: 31-bit key + gid only",
          lambda k: perturb(fold(jax.lax.sort((k, gid), num_keys=1)),
                            1 << 31), key31)
    timed("key11gid: 11-bit key + gid only",
          lambda k: perturb(fold(jax.lax.sort((k, gid), num_keys=1)), 2048),
          key12)
    # (f) pure expansion-side costs for context
    timed("cummax: over P", lambda k: jax.lax.cummax(k), key31)
    # (g) standalone (P,) element gather and (P, 12) row gather. The index
    # must depend on the carry or the whole gather is hoisted out of the
    # chained scan as loop-invariant.
    idxp = jnp.asarray(rng.integers(0, N, P, dtype=np.int32))

    def g_elem(k):
        idx = (idxp ^ (k[0] & 1)) & (N - 1)
        return perturb(k + nkey[idx], 1 << 31)

    timed("egather: (P,) element gather from (N,)", g_elem, key31)

    def g_rows(k):
        idx = (idxp ^ (k[0] & 1)) & (N - 1)
        s = (jnp.sum(nbody[idx], axis=-1) * 1e-30).astype(jnp.int32)
        return perturb(k + s, 1 << 31)

    timed("rgather: (P,12) row gather from (N,12)", g_rows, key31)
    # (h) ascending (run-length) row gather: the binning expansion's
    # actual access pattern (gid_pre is sorted).
    idxa = jnp.sort(idxp)

    def g_rows_asc(k):
        idx = (idxa ^ (k[0] & 1)) & (N - 1)
        s = (jnp.sum(nbody[idx], axis=-1) * 1e-30).astype(jnp.int32)
        return perturb(k + s, 1 << 31)

    timed("rgatherasc: (P,12) ascending row gather", g_rows_asc, key31)

    # (i) delta-scatter + cumsum expansion: the gather-free run-length
    # expansion candidate. Reconstructs the (P, F) expanded table from
    # N-row i32 delta scatters at segment starts + one cumsum along P —
    # exact in mod-2^32 arithmetic. Costs: one (N, F) row scatter-add
    # into (P, F) + F-column cumsum.
    F = 13
    nrows_i = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, (N + 1, F),
                                       dtype=np.int32))
    slots = jnp.sort(jnp.asarray(rng.integers(0, P, N + 1,
                                              dtype=np.int32)))

    def dscatter(k):
        d = nrows_i + k[0]
        acc = jnp.zeros((P, F), jnp.int32).at[slots].add(d, mode="drop")
        out = jnp.cumsum(acc, axis=0)
        return perturb(k + (jnp.sum(out) & 0x7FFF), 1 << 31)

    timed("dscatter: (N,13) row scatter + (P,13) cumsum", dscatter, key31)

    def dscatter_t(k):
        d = nrows_i + k[0]
        acc = jnp.zeros((P, 16), jnp.int32).at[
            slots, :F].add(d, mode="drop")
        out = jnp.cumsum(acc.T, axis=1)      # feature-major cumsum
        return perturb(k + (jnp.sum(out) & 0x7FFF), 1 << 31)

    timed("dscatterT: row scatter + transposed cumsum", dscatter_t, key31)

    def colcumsum(k):
        x = key31 + k[0]
        s = jnp.int32(0)
        for _ in range(F):
            x = jnp.cumsum(x)
            s = s + x[-1]
        return perturb(k + (s & 0x7FFF), 1 << 31)

    timed("cumsum13: 13 separate (P,) cumsums", colcumsum, key31)

    def rscatter_only(k):
        d = nrows_i + k[0]
        acc = jnp.zeros((P, F), jnp.int32).at[slots].add(d, mode="drop")
        return perturb(k + (jnp.sum(acc[::1297]) & 0x7FFF), 1 << 31)

    timed("rscatter: (N,13) row scatter into (P,13)", rscatter_only, key31)

    def dscatter_cols(k):
        # The production candidate: one row scatter, then per-COLUMN
        # slices + packed (P,) cumsums (the (P,13) 2D cumsum pads 13
        # lanes to 128 and runs ~6x slower; the sort consumes separate
        # columns anyway).
        d = nrows_i + k[0]
        acc = jnp.zeros((P, F), jnp.int32).at[slots].add(d, mode="drop")
        s = jnp.int32(0)
        for c in range(F):
            col = jnp.cumsum(acc[:, c])
            s = s + col[-1] + col[P // 3]
        return perturb(k + (s & 0x7FFF), 1 << 31)

    timed("dscatcol: row scatter + 13 column cumsums", dscatter_cols,
          key31)


if __name__ == "__main__":
    main()
